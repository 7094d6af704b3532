package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility behind PlanBudgetSpec: prints the cluster-shaped static
  * shuffle-Exchange count for every SparkEntry query so budget rows are
  * measured, not guessed. Run:
  *   sbt "Test/runMain graft.tools.PrintShuffles"
  */
object PrintShuffles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.spreadLocal", "false")
    val sf = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n =
        try {
          val plan = fn(spark, sf).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          "[+:]- Exchange \\(".r.findAllIn(plan).length.toString
        } catch { case e: Throwable => s"ERR ${e.getClass.getSimpleName}" }
      println(s"SHUF $name $n")
    }
    spark.stop()
  }
}
