package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for selected queries so plan
  * regressions (lost pushdown, missed broadcast, shuffle creep) are visible.
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Tables.tune(spark)
    // plan-audit knob injection, e.g. GRAFT_CONF=graft.spreadLocal=false
    // to audit the cluster-shaped plan (no local spread exchanges)
    sys.env.get("GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ =>
      }
    })
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
