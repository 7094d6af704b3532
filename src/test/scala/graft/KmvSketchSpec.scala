package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.KmvMinima

/** Pins for the KMV distinct-sketch aggregate beyond the q106 gate. */
class KmvSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("min-k across many partitions == single-pass brute force") {
    import spark.implicits._
    // deterministic pseudo-values; 7 partitions force partial-buffer
    // serialize + merge through the exchange
    val values = (0 until 5000).map(i => s"v$i")
    val hashed = values.map(v =>
      java.security.MessageDigest.getInstance("MD5").digest(v.getBytes)
        .map("%02x".format(_)).mkString)
    val expected = hashed.distinct.sorted.take(64)
    val got = values.toDF("v").repartition(7)
      .agg(KmvMinima(md5(col("v")), 64).as("mins"))
      .collect().head.getSeq[String](0)
    assert(got == expected)
  }

  test("duplicates cannot distort the sketch (set semantics)") {
    import spark.implicits._
    val base = (0 until 100).map(i => s"v$i")
    val dup = base ++ Seq.fill(10000)("v0") // one viral value
    val a = base.toDF("v").repartition(5)
      .agg(KmvMinima(md5(col("v")), 16)).collect().head.getSeq[String](0)
    val b = dup.toDF("v").repartition(5)
      .agg(KmvMinima(md5(col("v")), 16)).collect().head.getSeq[String](0)
    assert(a == b)
  }

  test("fewer distinct values than k: returns all of them, sorted") {
    import spark.implicits._
    val got = Seq("b", "a", "c", "a").toDF("v")
      .agg(KmvMinima(md5(col("v")), 64)).collect().head.getSeq[String](0)
    assert(got.length == 3 && got == got.sorted)
  }

  test("q133 postings contract: padded min-k per group == numeric smallest-k") {
    import spark.implicits._
    // the inverted-index cap relies on min16(A∪B) = min16(min16(A)∪min16(B))
    // over zero-padded ids (lexicographic ≡ numeric order after lpad 19).
    // Deterministic skewed fixture: token t0 appears in every doc (the
    // stopword case), others in a pseudo-random subset; 9 partitions force
    // partial buffers through the exchange.
    val rows = for {
      d <- 0 until 3000
      t <- 0 until 8
      if t == 0 || (d * 31 + t * 17) % 7 == 0
    } yield (s"t$t", d.toLong * 1001)
    val got = rows.toDF("tok", "doc_id").repartition(9)
      .groupBy("tok")
      .agg(KmvMinima(lpad(col("doc_id").cast("string"), 19, "0"), 16)
        .as("mins"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).map(_.toLong)).toMap
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).distinct.sorted.take(16).toSeq
    }
    assert(got == expected)
    assert(got("t0").size == 16) // the stopword run really was capped
  }

  test("SQL surface: kmv_minima registered and grouped") {
    import spark.implicits._
    (0 until 300).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      """SELECT g, size(kmv_minima(md5(v), 8)) AS n
        |FROM kmv_in GROUP BY g""".stripMargin).collect()
    assert(rows.length == 3 && rows.forall(_.getInt(1) == 8))
  }

  test("estimate lands within KMV error bounds on 20k distinct values") {
    import spark.implicits._
    val n = 20000
    val est = (0 until n).map(i => s"value-$i").toDF("v").repartition(8)
      .agg(KmvMinima(md5(col("v")), 256).as("mins"))
      .select(round(lit(255.0) * lit(1.152921504606846976e18) /
        conv(substring(element_at(col("mins"), 256), 1, 15), 16, 10)
          .cast("double")).cast("long"))
      .collect().head.getLong(0)
    // stddev ≈ n/sqrt(k-2) ≈ 6.3%; 4σ bound
    assert(math.abs(est - n) < n * 0.25, s"estimate $est vs true $n")
  }

  test("q217 hash-sample quantiles: each estimate's TRUE rank lands " +
    "within the k=256 sampling tolerance of its target percentile") {
    // the q217 estimator is the exact nearest-rank quantile of a
    // deterministic 256-row bottom-k-by-md5 sample; its value's true
    // rank in the full corpus should sit near p (binomial stddev
    // ≈ sqrt(p(1-p)/k) ≤ 3.1 pts; 4σ ≈ 13 pts)
    val dir = "/root/testdata/sf0.01"
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val all = docs.select(col("n_chars").cast("long")).collect()
      .map(_.getLong(0)).sorted
    val est = graft.queries.PipelineOps.defs("q217_quantile_sample")(
      spark, dir).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(est.keySet == Set(25, 50, 75, 90, 99))
    est.foreach { case (p, v) =>
      // true rank of v = fraction of corpus ≤ v
      val trueRank = 100.0 * all.count(_ <= v) / all.length
      assert(math.abs(trueRank - p) < 13.0,
        s"p$p estimate $v has true rank $trueRank")
    }
  }
}
