package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The local-parallelism spread must be a structural no-op under cluster
  * conf: same rows either way, and the repartition exchange exists only
  * when graft.spreadLocal is on (the default). */
class TablesSpreadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("spread repartitions by default and disappears under cluster conf") {
    import spark.implicits._
    val df = (0L until 100L).toDF("id")
    val prev = spark.conf.getOption("graft.spreadLocal")
    try {
      spark.conf.set("graft.spreadLocal", "true")
      val on = Tables.spread(df, col("id"))
      assert(on.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(on.count() == 100L)

      spark.conf.set("graft.spreadLocal", "false")
      val off = Tables.spread(df, col("id"))
      assert(!off.queryExecution.executedPlan.toString.contains("Exchange"),
        "spread must be a no-op with graft.spreadLocal=false")
      assert(off.count() == 100L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.spreadLocal", v)
        case None => spark.conf.unset("graft.spreadLocal")
      }
    }
  }
}
