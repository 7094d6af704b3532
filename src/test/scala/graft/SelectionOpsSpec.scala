package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.SelectionOps

/** Semantic pins for the data-selection pack (q118–q120) beyond the
  * DuckDB hash gate: chunk coverage/overlap arithmetic, the LM's
  * probability-mass sanity, and DSIR's directionality (target-slice docs
  * must score above the corpus at large).
  */
class SelectionOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q118: chunks cover every token exactly; stride overlap is 8") {
    val rows = SelectionOps.defs("q118_chunk_overlap")(spark, sf)
      .selectExpr("doc_id", "chunk_id", "n_toks",
        "size(filter(split(chunk, ' '), x -> x != '')) AS actual")
      .collect()
    assert(rows.nonEmpty)
    // n_toks column matches the real token count of the chunk text
    rows.foreach(r => assert(r.getInt(2) == r.getInt(3).toInt,
      s"doc ${r.getLong(0)} chunk ${r.getInt(1)}"))
    // per doc: first chunk starts at 0, consecutive chunks advance by the
    // stride (24), so token coverage = 24·(k−1) + last-chunk size
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id",
        "size(filter(split(text, ' '), x -> x != '')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val k = rs.map(_.getInt(1)).max + 1
      val last = rs.find(_.getInt(1) == k - 1).get.getInt(2)
      assert(24 * (k - 1) + last == docs(doc), s"doc $doc coverage")
    }
  }

  test("q119: natural text scores lower avg_nll than a shuffled-vocab doc") {
    // the LM is trained on the corpus itself, so real bigrams are frequent
    // and every doc's avg negative log-likelihood must beat ln of the
    // uniform-smoothing floor for at least the corpus median
    val nll = SelectionOps.defs("q119_lm_perplexity")(spark, sf)
      .select("avg_nll").collect().map(_.getDouble(0))
    assert(nll.nonEmpty)
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(filter(split(text, ' '), x -> x != '')) AS t")
      .agg(countDistinct("t")).collect().head.getLong(0)
    // uniform model would give ln(vocab); trained-LM median must be lower
    val sorted = nll.sorted
    assert(sorted(sorted.length / 2) < math.log(vocab.toDouble))
  }

  test("prunedTopK: skewed fixture keeps the Zipf head, prunes the hapax tail") {
    import spark.implicits._
    // the LM-artifact rule q119 relies on, exercised on the shape a REAL
    // corpus has (the synthetic gate corpus is dense/uniform, so the cap
    // cannot activate there): 20 head keys with descending counts, 500
    // hapax-tail keys. k=20 must return exactly the head, count-ordered,
    // ties broken by key asc.
    val head = (0 until 20).flatMap(i => Seq.fill(100 - i)(f"head$i%02d"))
    val tail = (0 until 500).map(i => f"tail$i%03d")
    def counts(xs: Seq[String]) =
      xs.toDF("bg").groupBy("bg").agg(count(lit(1)).as("c"))
    val got = SelectionOps.prunedTopK(counts(head ++ tail), 20)
    assert(got.length == 20)
    assert(got.map(_._1).toSeq == (0 until 20).map(i => f"head$i%02d"))
    assert(got.map(_._2).toSeq == (0 until 20).map(i => 100L - i))
    // tie-break determinism: equal counts order by key ascending
    val tied = SelectionOps.prunedTopK(
      counts(Seq("b", "a", "c", "a", "b", "c")), 2)
    assert(tied.map(_._1).toSeq == Seq("a", "b"))
  }

  test("q125: ranks are 1..100, keys nonincreasing, docs distinct") {
    val rows = SelectionOps.defs("q125_importance_resample")(spark, sf)
      .orderBy("rank").collect()
    assert(rows.length == 100)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 100))
    assert(rows.map(_.getLong(1)).distinct.length == 100)
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getDouble(3) >= lo.getDouble(3) - 1e-9)
    }
  }

  test("q182: matches a brute-force Kneser–Ney reference bit-for-bit") {
    // independent reimplementation of the interpolated-KN model (driver-
    // side Scala over the same corpus) — pins the MODEL, not just the
    // DuckDB mirror: bigram counts, prune rule, C(a·)/N1+ stats and the
    // exact float shape all have to agree for the 6-dp values to match
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') AS t")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val bigsOf = (t: Vector[String]) =>
      t.zip(t.tail).map { case (a, b) => s"$a $b" }
    val allBigs = docs.values.filter(_.length >= 2).toVector.flatMap(bigsOf)
    val counts = allBigs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val pruned = counts.toVector
      .sortBy { case (k, c) => (-c, k) }.take(SelectionOps.LmTopK)
    val bg = pruned.toMap
    val ca = pruned.groupBy(_._1.takeWhile(_ != ' '))
      .map { case (a, xs) => a -> xs.map(_._2).sum }
    val n1a = pruned.groupBy(_._1.takeWhile(_ != ' '))
      .map { case (a, xs) => a -> xs.length.toLong }
    val n1b = pruned.groupBy(_._1.dropWhile(_ != ' ').drop(1))
      .map { case (b, xs) => b -> xs.length.toLong }
    val bb = pruned.length.toLong
    val vocab = docs.values.flatten.toSet.size.toLong
    val d = SelectionOps.KnD
    def lp(big: String): Double = {
      val a = big.takeWhile(_ != ' ')
      val b = big.dropWhile(_ != ' ').drop(1)
      val pc = (n1b.getOrElse(b, 0L) + 1).toDouble / (bb + vocab).toDouble
      val caV = ca.getOrElse(a, 0L)
      if (caV > 0)
        math.log((math.max(bg.getOrElse(big, 0L).toDouble - d, 0.0)
          + d * n1a.getOrElse(a, 0L).toDouble * pc) / caV.toDouble)
      else math.log(pc)
    }
    val expect = docs.collect { case (id, t) if t.length >= 2 =>
      val bs = bigsOf(t)
      val nll = -bs.foldLeft(0.0)((acc, x) => acc + lp(x)) / bs.length
      id -> (bs.length, math.rint(nll * 1e6) / 1e6)
    }
    val got = SelectionOps.defs("q182_kn_perplexity")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, (n, nll)) =>
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - nll) < 1e-6, s"doc $id avg_nll")
    }
  }

  test("q182: KN probabilities sum to 1 over the vocabulary per context") {
    // the property that makes KN a proper LM (and that add-one q119 also
    // has): for any seen context a, Σ_b P(b|a) over the V-token vocab = 1
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') AS t")
      .collect().map(_.getSeq[String](1).toVector)
    val allBigs = docs.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail).map { case (a, b) => s"$a $b" })
    val counts = allBigs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val vocabSet = docs.flatten.toSet
    val bb = counts.size.toLong
    val n1b = counts.keys.toVector.groupBy(_.dropWhile(_ != ' ').drop(1))
      .map { case (b, xs) => b -> xs.length.toLong }
    val d = SelectionOps.KnD
    // three contexts with different continuation breadths
    val contexts = counts.keys.map(_.takeWhile(_ != ' ')).toVector.distinct.take(3)
    contexts.foreach { a =>
      val conts = counts.collect { case (k, c) if k.takeWhile(_ != ' ') == a =>
        k.dropWhile(_ != ' ').drop(1) -> c }
      val ca = conts.values.sum
      val n1aV = conts.size.toLong
      val mass = vocabSet.toVector.map { b =>
        val pc = (n1b.getOrElse(b, 0L) + 1).toDouble / (bb + vocabSet.size).toDouble
        (math.max(conts.getOrElse(b, 0L).toDouble - d, 0.0) + d * n1aV * pc) / ca
      }.sum
      // remaining mass sits on out-of-vocab continuations of Pc's add-one
      // smoothing: Σ_vocab Pc = (Σ n1b + V)/(B + V) = 1 exactly since
      // Σ_b N1+(·b) = B, so in-vocab mass must be 1
      assert(math.abs(mass - 1.0) < 1e-9, s"context '$a' mass $mass")
    }
  }

  test("q120: target-slice docs average a higher importance score") {
    val rows = SelectionOps.defs("q120_dsir_weight")(spark, sf)
      .select(col("source"), col("dsir_lr"), col("n_tokens")).collect()
    val (tgt, rest) = rows.partition(_.getString(0) == "src0")
    assert(tgt.nonEmpty && rest.nonEmpty)
    def perTokMean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getDouble(1) / r.getInt(2)).sum / rs.length
    // the estimator is exactly "target-likeness": src0 must sit above the
    // non-target mean (per-token normalized so length doesn't dominate)
    assert(perTokMean(tgt) > perTokMean(rest))
  }
}
