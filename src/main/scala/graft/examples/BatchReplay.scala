package graft.examples

import org.apache.spark.sql.SparkSession
import graft.cdc._
import graft.streaming.Pipeline

/** Example: batch replay of a change-event feed (entry point B of the
  * reference, SURVEY.md §3.2) through the public pipeline API.
  *
  * Usage: runMain graft.examples.BatchReplay <eventsJsonDir> [outDir]
  * Prints the envelope JSON messages; writes them to outDir if given.
  */
object BatchReplay {
  def main(args: Array[String]): Unit = {
    val input = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dict = Dictionary(Seq(
      DbTable(100L, 100L, "OWNER1", "TABLENAME1",
        Seq(DbColumn("ID", 2, numPk = 1), DbColumn("VAL", 1)),
        tagType = "pk")),
      Seq(TableSelector("OWNER1", ".*")))

    val out = Pipeline.batch(spark, Pipeline.Config(
      Pipeline.SourceConfig(input), dict))

    out.orderBy("c_scn", "c_idx").collect()
      .foreach(r => println(r.getAs[String]("value")))
    if (args.length > 1) graft.sinks.Sinks.writeFile(out, args(1))
    spark.stop()
  }
}
