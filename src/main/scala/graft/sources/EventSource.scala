package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.ChangeEvent

/** Change-event sources (SURVEY.md §2.1) — the capture side arrives as
  * decoded events (JSON-lines or parquet), batch (S4) or streaming (S1/S5).
  *
  * Scale notes: the parquet path is a plain file source → partition count
  * follows `maxPartitionBytes`, predicate/column pushdown applies before
  * assembly; ordering within a transaction is restored downstream by the
  * (scn, subScn, offset) sort in TxnAssembly, so the source does NOT need
  * a global sort (the reference's in-LWN heap sort has the same scope).
  */
object EventSource {

  /** Corrupt JSON lines parse to all-null rows (PERMISSIVE mode) and would
    * crash the non-nullable encoder — drop them (≙ the reference skipping
    * records that fail the block checksum, Reader.cpp:109-155). */
  private def wellFormed(df: DataFrame): DataFrame =
    df.filter(col("scn").isNotNull && col("xid").isNotNull && col("op").isNotNull)
      .na.fill(0L,
        Seq("scn", "subScn", "seq", "offset", "thread", "obj", "bdba", "slot",
          "tm")) // tm absent in pre-clock fixture feeds → 0 (no wall clock)

  /** S4 batch replay from JSON-lines (the fixture/golden format). */
  def batchJson(spark: SparkSession, path: String): Dataset[ChangeEvent] = {
    import spark.implicits._
    wellFormed(spark.read.schema(ChangeEvent.schema).json(path)).as[ChangeEvent]
  }

  def batchParquet(spark: SparkSession, path: String): Dataset[ChangeEvent] = {
    import spark.implicits._
    wellFormed(spark.read.schema(ChangeEvent.schema).parquet(path)).as[ChangeEvent]
  }

  /** S1/S5 streaming source. `maxFilesPerTrigger` is the backpressure
    * knob (≙ the reference's read-buffer cap). */
  def streamJson(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 100): Dataset[ChangeEvent] = {
    import spark.implicits._
    wellFormed(spark.readStream.schema(ChangeEvent.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)).as[ChangeEvent]
  }

  /** S3 archived-log discovery: order files by the sequence token parsed
    * from the file name (≙ log-archive-format %s), exposed as a column so
    * callers can filter a resume range (seq >= checkpoint).
    */
  def withFileSeq(ds: DataFrame, seqPattern: String = raw".*_(\d+)\..*"): DataFrame =
    ds.withColumn("file_seq",
      regexp_extract(input_file_name(), seqPattern, 1).cast("long"))

  /** S6 path mapping: rewrite DB-reported file paths to local mounts
    * (config `path` pairs, OpenLogReplicator.cpp:1232-1246) — applied to a
    * path column before file resolution. Pairs apply first-match-wins. */
  def mapPath(pathCol: org.apache.spark.sql.Column,
      pairs: Seq[(String, String)]): org.apache.spark.sql.Column =
    pairs.foldLeft(pathCol) { case (c, (from, to)) =>
      regexp_replace(c, "^" + java.util.regex.Pattern.quote(from), to)
    }
}
