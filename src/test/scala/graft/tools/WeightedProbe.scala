package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage profiler for q185 (weighted near-dup pairs): times the
  * front-end checkpoint and the full query separately at a given SF so a
  * ratio regression is attributable to a stage, not the whole query.
  * (r12: the verify stage was the finding — interpreted map/aggregate
  * HOFs at 3.4s of 4.6s, replaced by the native TfIntersect kernel.)
  * Run: sbt "Test/runMain graft.tools.WeightedProbe [sfDir]"
  */
object WeightedProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sf, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    docs.count() // warm the scan
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val banded0 = time("checkpoint") {
        graft.queries.TextOps.withWeightedBands(docs).localCheckpoint()
      }
      banded0.unpersist()
      val full = time("full_query")(
        graft.queries.TextOps.weightedVerifiedPairs(docs).count())
      println(s"PROBE full_rows $full")
      // q191 split: index BUILD (one-time ingest cost) vs the steady-state
      // incremental MATCH the index exists to serve
      val d2 = docs.select(col("doc_id"), col("text"))
      val isNew = col("doc_id") % 10 === 7
      time("q191_build")(graft.operators.LshIndex.writeWeighted(
        spark, d2.filter(!isNew), "probe_widx"))
      val m = time("q191_match")(graft.operators.LshIndex
        .matchIncrementWeighted(spark, d2.filter(isNew), "probe_widx")
        .count())
      println(s"PROBE match_rows $m")
    }
    spark.stop()
  }
}
