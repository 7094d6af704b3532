package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SuffixArray

/** Prefix-doubling suffix ranks vs a brute-force suffix sort, the
  * distributed dense rank vs a single-threaded reference (with ties and
  * across partition counts), and the per-round exchange shape the
  * PlanBudget rows for q203/q204 lean on. */
class SuffixArraySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // lexicographic over token sequences, shorter-prefix-first — the order
  // the rank-0 sentinel encodes
  private val seqOrd: Ordering[List[String]] = new Ordering[List[String]] {
    def compare(a: List[String], b: List[String]): Int = (a, b) match {
      case (Nil, Nil) => 0
      case (Nil, _)   => -1
      case (_, Nil)   => 1
      case (x :: xs, y :: ys) =>
        val c = x.compareTo(y); if (c != 0) c else compare(xs, ys)
    }
  }

  private def bruteRanks(
      docs: Seq[(Long, Seq[String])]): Map[(Long, Long), Long] = {
    val sufs = for ((id, toks) <- docs; p <- 1 to toks.length)
      yield ((id, p.toLong), toks.drop(p - 1).toList)
    val rank = sufs.map(_._2).distinct.sorted(seqOrd)
      .zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    sufs.map { case (k, s) => k -> rank(s) }.toMap
  }

  private def sparkRanks(
      docs: Seq[(Long, Seq[String])]): Map[(Long, Long), Long] = {
    implicit val s: SparkSession = spark
    import s.implicits._
    val df = docs.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    SuffixArray.tokenSuffixRanks(df,
      graft.queries.TextOps.tokensOf(col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  test("suffix ranks match brute force: shared phrases, identical docs, " +
    "single-token docs, tie classes") {
    val docs = Seq(
      1L -> Seq("the", "quick", "brown", "fox", "jumps"),
      2L -> Seq("a", "quick", "brown", "fox", "runs"),
      3L -> Seq("the", "quick", "brown", "fox", "jumps"), // identical to 1
      4L -> Seq("fox"),
      5L -> Seq("zz", "zz", "zz", "zz"), // self-repeating run
      6L -> Seq("brown", "fox"))         // suffix of 1/2's interior
    assert(sparkRanks(docs) == bruteRanks(docs))
  }

  test("suffix ranks match brute force on a fuzzed corpus (long repeats " +
    "force many doubling rounds; convergence terminates)") {
    val rnd = new scala.util.Random(7)
    val phrases = Vector("alpha beta gamma delta", "one two", "x",
      "repeat repeat repeat repeat repeat repeat repeat repeat",
      "lorem ipsum dolor sit amet")
    val docs = (1L to 30L).map { id =>
      val n = 1 + rnd.nextInt(5)
      id -> (1 to n).flatMap(_ =>
        phrases(rnd.nextInt(phrases.size)).split(" ").toSeq)
    }
    assert(sparkRanks(docs) == bruteRanks(docs))
  }

  test("empty corpus: returns an empty rank frame, no NPE") {
    assert(sparkRanks(Seq.empty).isEmpty)
  }

  test("all-distinct corpus: singleton-class early exit preserves ranks") {
    // every suffix unique after the 8-token seed — the classes == rows
    // exit fires before any doubling round, and must not change results
    val docs = Seq(
      1L -> (1 to 20).map(i => s"t$i"),
      2L -> (30 to 45).map(i => s"u$i"))
    assert(sparkRanks(docs) == bruteRanks(docs))
  }

  test("denseRankInPlace = reference dense rank, ties intact, " +
    "invariant across partition counts") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(_ => (rnd.nextInt(20).toLong,
      rnd.nextInt(5).toLong))
    val want = {
      val distinct = rows.distinct.sorted
      val rk = distinct.zipWithIndex.map { case (t, i) => t -> (i + 1L) }.toMap
      rows.map(t => t -> rk(t))
    }.toSet
    for (parts <- Seq("2", "7")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val (ranked, classes, nRows) = SuffixArray.denseRankInPlace(
          rows.toDF("a", "b"), Seq("a", "b"), "rk")
        val got = ranked.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toSet
        assert(classes == rows.distinct.size.toLong, s"parts=$parts")
        assert(nRows == rows.size.toLong, s"parts=$parts")
        assert(got == want, s"parts=$parts")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("per-round exchange shape: the rank assignment is 1 exchange " +
    "(the range repartition; the flag/run pass is partition-local), " +
    "never a single-partition global window") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val df = (1L to 100L).map(i => (i % 10, i % 3)).toDF("a", "b")
    val plan = SuffixArray.flagPlan(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"flag plan exchanges: $exchanges\n$plan")
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.toLowerCase.contains("singlepartition"), plan)
  }
}
