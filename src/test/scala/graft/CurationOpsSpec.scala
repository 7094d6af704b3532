package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{CurationExpressions, CurationNative}

/** Pins the curation-pack kernels (CurationNative) and the q115 paragraph
  * dedup contract. The URL spec cases mirror the canonicalization steps
  * stated in the kernel's Scaladoc 1:1; the mojibake test proves the
  * one-pass kernel equals the sequential replace chain the DuckDB oracle
  * executes (CurationOps builds that chain from MojibakeMap).
  */
class CurationOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(u: String): String =
    CurationNative.urlCanon(
      org.apache.spark.unsafe.types.UTF8String.fromString(u)).toString

  test("url_canon: case, www, default port, trailing slash, fragment") {
    assert(canon("HTTPS://WWW.Site7.Example.COM:443/Articles/12/#frag") ==
      "https://site7.example.com/Articles/12")
    assert(canon("http://www.a.com:80/") == "http://a.com")
    // path case is preserved; only scheme+host fold
    assert(canon("https://A.com/Path/UP") == "https://a.com/Path/UP")
  }

  test("url_canon: non-default ports and cross-scheme ports survive") {
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
  }

  test("url_canon: tracking params drop, survivors sort bytewise") {
    assert(canon("https://a.com/p?utm_source=x&b=2&a=1&fbclid=z&gclid=q&ref=h") ==
      "https://a.com/p?a=1&b=2")
    // all params tracking → no '?' at all
    assert(canon("https://a.com/p?utm_campaign=c&utm_source=s") ==
      "https://a.com/p")
    // empty segments from '&&' vanish; '=' order is byte order ('B' < 'a')
    assert(canon("https://a.com/p?a=1&&B=2") == "https://a.com/p?B=2&a=1")
  }

  test("url_canon: degenerate inputs are total") {
    assert(canon("not a url") == "not a url") // no "://" → unchanged
    assert(canon("https://www./#x") == "https://")
    assert(canon("https://a.com") == "https://a.com")
    assert(canon("https://a.com?b=1#f") == "https://a.com?b=1")
  }

  test("mojibake kernel == sequential replace chain (the oracle's form)") {
    val cases = Seq(
      "dÃ¡ta mÃ©rge Ã¶ Ã± Ã¼ â€œquotedâ€™ 20Â° â€“ dash",
      "clean ascii text stays untouched",
      "Ã©Ã©Ã© back to back", "tail Ã", "Â", "")
    for (s <- cases) {
      val chain = CurationNative.MojibakeMap.foldLeft(s) {
        case (acc, (bad, good)) => acc.replace(bad, good)
      }
      val kernel = CurationNative.mojibakeFix(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
      assert(kernel == chain, s"input: $s")
    }
    // repair is idempotent: a fixed string contains no patterns
    val fixedOnce = "dáta mérge ’ “ – °"
    assert(CurationNative.mojibakeFix(
      org.apache.spark.unsafe.types.UTF8String.fromString(fixedOnce))
      .toString == fixedOnce)
  }

  test("url_canon and mojibake_fix are SQL-registered") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT url_canon('HTTP://WWW.A.com:80/x/?b=1&utm_s=1') AS u, " +
        "mojibake_fix('dÃ¡ta') AS m").collect()(0)
    assert(r.getString(0) == "http://a.com/x?b=1")
    assert(r.getString(1) == "dáta")
  }

  test("paragraph dedup removes frequent FULL chunks only, preserves order") {
    import spark.implicits._
    // boiler = exactly 16 tokens; tail = 3-token fragment shared by all
    // docs (so its hash count is high) — fragments must never be removed
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val docs = (0 until 30).map { i =>
      val body = (1 to 16).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"$boiler $body same tail frag")
    }.toDF("doc_id", "text")
    docs.createOrReplaceTempView("pd_docs")

    // same chunking + freq + in-row apply as q115, threshold 20 (< 30 docs)
    val paras = docs
      .select(col("doc_id"), graft.queries.TextOps.tokensCol.as("t"))
      .withColumn("np", ceil(size(col("t")) / lit(16.0)).cast("int"))
      .select(col("doc_id"),
        transform(sequence(lit(0), col("np") - 1),
          i => array_join(slice(col("t"), i * 16 + 1, lit(16)), " "))
          .as("paras"))
    val hs = paras.select(explode(col("paras")).as("para"))
      .filter(size(split(col("para"), " ")) === 16)
      .groupBy(md5(col("para")).as("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 20)
      .select("h").collect().map(_.getString(0)).sorted.toSeq
    val out = paras
      .select(col("doc_id"),
        filter(col("paras"),
          p => !array_contains(typedLit(hs), md5(p))).as("kept"))
      .select(col("doc_id"), array_join(col("kept"), " ").as("cleaned"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    for (i <- 0 until 30) {
      val body = (1 to 16).map(j => s"w${i}_$j").mkString(" ")
      // boilerplate chunk gone; unique body chunk and the 3-token
      // fragment chunk (frequent but NOT 16 tokens) both survive, in order
      assert(out(i.toLong) == s"$body same tail frag")
    }
  }
}
