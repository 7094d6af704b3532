package graft.examples

import org.apache.spark.sql.SparkSession
import graft.cdc.OlrCheckpoint
import graft.streaming.Pipeline

/** Example: migrate a RUNNING OpenLogReplicator deployment to this
  * engine without re-bootstrapping against the source database.
  *
  *   1. Stop (or snapshot) the OLR instance and take its newest schema
  *      checkpoint file, `<database>-chkpt-<scn>.json` — the JSON the
  *      reference writes per checkpoint (SerializerJson layout).
  *   2. `OlrCheckpoint.importJson` turns it into this engine's
  *      [[graft.cdc.Dictionary]] (tables, columns, keys, guard columns,
  *      partition map, LOB segments, XDB token tables) plus the
  *      positioning metadata (scn / seq / offset) the deployment
  *      stopped at.
  *   3. Resume the feed from `meta.scn` — the same position contract the
  *      reference's own restart uses — through the normal pipeline.
  *
  * Usage: runMain graft.examples.MigrateFromOlr <chkptFile> <eventsJsonDir>
  */
object MigrateFromOlr {
  def main(args: Array[String]): Unit = {
    val (chkptFile, input) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(chkptFile))
    val (meta, dict) = OlrCheckpoint.importJson(json)
    println(s"imported ${meta.database} checkpoint: scn=${meta.scn} " +
      s"seq=${meta.seq} offset=${meta.offset} " +
      s"tables=${dict.tables.size} partitions=${dict.partitionOf.size} " +
      s"lobSegments=${dict.lobSegments.size}")

    // resume: replay events at/above the checkpoint scn (a stream via
    // Pipeline.stream works identically — batch keeps the example
    // self-terminating)
    val out = Pipeline.batch(spark, Pipeline.Config(
      Pipeline.SourceConfig(input), dict))
      .filter(org.apache.spark.sql.functions.col("c_scn") >= meta.scn)
    out.orderBy("c_scn", "c_idx").collect()
      .foreach(r => println(r.getAs[String]("value")))
    spark.stop()
  }
}
