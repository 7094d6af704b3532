package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pins SCALE.md's "AQE skew split is the second line of defense" claim:
  * a join where one key owns most of the rows gets its oversized
  * partitions split at runtime (skew=true in the final adaptive plan),
  * with results identical to the unskewed execution. */
class SkewJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds small enough that the test-sized hot key counts as skew
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // 95% of the fact side lands on key 0
      val fact = spark.range(0, 60000)
        .select(when(col("id") % 20 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val dim = spark.range(0, 3000).select(col("id").as("k"),
        (col("id") * 7).as("w"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe's plan (count() would plan a separate
      // aggregate query and leave joined's adaptive plan un-finalized)
      var n = 0L
      joined.toLocalIterator().forEachRemaining(_ => n += 1)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected a runtime skew split:\n${plan.take(800)}")
      // correctness unchanged: every fact row with k<3000 matches exactly once
      val expected = fact.filter(col("k") < 3000).count()
      assert(n == expected)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
