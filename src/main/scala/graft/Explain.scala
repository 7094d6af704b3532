package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of each query whose
  * name matches the regex — the ".explain and iterate" loop the scale
  * discipline demands, runnable as `runMain graft.Explain <sfDir> <regex>`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val pattern = args.lift(1).getOrElse(".*").r
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Tables.tune(spark)
    // plan-audit knob injection, e.g. GRAFT_CONF=graft.spreadLocal=false
    // to audit the cluster-shaped plan (no local spread exchanges)
    sys.env.get("GRAFT_CONF").foreach(_.split(',').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _           =>
      }
    })
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => pattern.findFirstIn(kv._1).isDefined)
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable =>
          println(s"[explain] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
