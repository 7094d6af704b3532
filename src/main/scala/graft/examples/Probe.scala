package graft.examples

import org.apache.spark.sql.SparkSession

/** Dev scratch: per-phase timing of one query (build/analyze/optimize/
  * physical/first-exec/steady-exec) to attribute cold-start cost.
  * Usage: runMain graft.examples.Probe <sfDir> <queryName>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val df = ms("build")(graft.SparkEntry.queries(args(1))(spark, args(0)))
    ms("analyze")(df.queryExecution.analyzed)
    ms("optimize")(df.queryExecution.optimizedPlan)
    ms("physical")(df.queryExecution.executedPlan)
    ms("count1")(df.count())
    ms("count2")(df.count())
    spark.stop()
  }
}
