package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.AdjacentPairs

/** AdjacentPairs (bucketed-window successor pairing) must equal the
  * self-join formulation exactly — including pairs straddling a bucket
  * boundary — while keeping a join-free plan. */
class AdjacentPairsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("equals the self-join on a sparse id set with boundary pairs") {
    import spark.implicits._
    // width 8 → boundaries at 8, 16, 24…; include consecutive runs that
    // cross them (7,8), (15,16), sparse gaps, and a lone id
    val ids = Seq(0L, 1L, 2L, 7L, 8L, 9L, 15L, 16L, 23L, 24L, 25L, 40L)
    val df = ids.toDF("id").withColumn("payload", col("id") * 10)
    val got = AdjacentPairs.pairs(df, "id", width = 8)
      .select("id_a", "id_b", "payload_a", "payload_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val a = df.select(col("id").as("id_a"), col("payload").as("payload_a"))
    val b = df.select(col("id").as("id_b"), col("payload").as("payload_b"))
    val want = a.join(b, col("id_b") === col("id_a") + 1)
      .select("id_a", "id_b", "payload_a", "payload_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.contains((7L, 8L, 70L, 80L))) // boundary pair is present
    assert(got.contains((15L, 16L, 150L, 160L)))
  }

  test("fuzz: random dense/sparse id sets equal the self-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val ids = (0 until 500).map(_ => rnd.nextInt(200).toLong).distinct
      val df = ids.toDF("id").withColumn("p", md5(col("id").cast("string")))
      val got = AdjacentPairs.pairs(df, "id", width = 16)
        .select("id_a", "id_b", "p_a", "p_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      val a = df.select(col("id").as("id_a"), col("p").as("p_a"))
      val b = df.select(col("id").as("id_b"), col("p").as("p_b"))
      val want = a.join(b, col("id_b") === col("id_a") + 1)
        .select("id_a", "id_b", "p_a", "p_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("plan is join-free") {
    import spark.implicits._
    val df = (0L to 100L).toDF("id").withColumn("p", col("id") + 1)
    val plan = AdjacentPairs.pairs(df, "id").queryExecution
      .executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"), plan)
  }
}
