package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.EventSource

/** S3 log discovery ordering and S6 path mapping. */
class EventSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]").appName("source-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("withFileSeq extracts the archived-log sequence for resume filtering") {
    val dir = Files.createTempDirectory("seq").toFile
    Seq(("redo_7.jsonl", 1L), ("redo_10.jsonl", 5L)).foreach { case (n, scn) =>
      val w = new java.io.PrintWriter(new java.io.File(dir, n))
      w.println(s"""{"scn":$scn,"xid":"1.0.1","op":"INS"}""")
      w.close()
    }
    val df = EventSource.withFileSeq(
      EventSource.batchJson(spark, dir.getAbsolutePath).toDF(),
      raw".*_(\d+)\..*")
    val seqs = df.select("scn", "file_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seqs == Map(1L -> 7L, 5L -> 10L))
    // resume from seq >= 10 drops the older log's events
    assert(df.filter(col("file_seq") >= 10L).count() == 1)
  }

  test("mapPath rewrites DB-reported prefixes to local mounts, first match wins") {
    import spark.implicits._
    val df = Seq("/ora/redo/log_1.arc", "/other/log_2.arc", "/ora/redo/sub/x")
      .toDF("p")
    val out = df.select(EventSource.mapPath(col("p"), Seq(
        "/ora/redo" -> "/mnt/a",
        "/other" -> "/mnt/b")).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("/mnt/a/log_1.arc", "/mnt/b/log_2.arc", "/mnt/a/sub/x"))
  }
}
