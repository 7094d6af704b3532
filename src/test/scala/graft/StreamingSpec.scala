package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import graft.cdc._

/** Streaming semantics: cross-batch keyed state (T1/T7) and exactly-once
  * restart (f18) through real Structured Streaming queries. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ev(scn: Long, op: String, xid: String = "1.0.1"): ChangeEvent =
    ChangeEvent(scn, xid, op)

  test("uncommitted state persists across micro-batches; commit flushes") {
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val input = MemoryStream[ChangeEvent]
    val out = TxnAssembly.assembleStream(input.toDS())
    val query = out.writeStream.format("memory").queryName("txn_out")
      .outputMode("append").start()

    // batch 1: open transaction, no commit → nothing emitted
    input.addData(ev(1, Op.Begin), ev(2, Op.Ins).copy(after = Map("k" -> "a")))
    query.processAllAvailable()
    assert(spark.table("txn_out").count() == 0)

    // batch 2: commit arrives → the buffered op flushes with commit scn
    input.addData(ev(3, Op.Commit))
    query.processAllAvailable()
    val rows = spark.table("txn_out").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("cScn") == 3L)
    query.stop()
  }

  test("interleaved transactions assemble independently per xid") {
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val input = MemoryStream[ChangeEvent]
    val out = TxnAssembly.assembleStream(input.toDS())
    val query = out.writeStream.format("memory").queryName("txn_interleave")
      .outputMode("append").start()
    input.addData(
      ev(1, Op.Ins, "1.0.1").copy(after = Map("k" -> "t1")),
      ev(2, Op.Ins, "2.0.1").copy(after = Map("k" -> "t2")),
      ev(3, Op.Commit, "2.0.1"), // t2 commits first
      ev(4, Op.Ins, "1.0.1").copy(after = Map("k" -> "t1b")),
      ev(5, Op.Commit, "1.0.1"))
    query.processAllAvailable()
    val rows = spark.table("txn_interleave")
      .selectExpr("xid", "cScn", "after['k']").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._2)
    assert(rows.toSeq == Seq(
      ("2.0.1", 3L, "t2"), ("1.0.1", 5L, "t1"), ("1.0.1", 5L, "t1b")))
    query.stop()
  }

  test("f18: restart from checkpoint emits no duplicates") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$dir/events"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))

    def writeBatch(n: Int, events: Seq[ChangeEvent]): Unit =
      Seq(events).toDS().flatMap(identity).coalesce(1)
        .write.json(s"$srcDir/batch$n")

    def runOnce(): Unit = {
      val events = spark.readStream.schema(ChangeEvent.schema)
        .json(s"$srcDir/*").as[ChangeEvent]
      val out = TxnAssembly.assembleStream(events)
      val q = out.selectExpr("CAST(cScn AS STRING) AS c_scn",
          "CAST(cIdx AS STRING) AS c_idx", "xid")
        .writeStream.format("json").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      q.stop()
    }

    writeBatch(1, Seq(
      ev(1, Op.Ins).copy(after = Map("k" -> "a")), ev(2, Op.Commit)))
    runOnce()
    // second run sees old + new input; only the new txn may be emitted
    writeBatch(2, Seq(
      ev(3, Op.Ins).copy(after = Map("k" -> "b")), ev(4, Op.Commit)))
    runOnce()

    val result = spark.read.json(outDir).select("c_scn", "c_idx").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(result.length == 2, s"expected 2 messages, got ${result.toSeq}")
    assert(result.distinct.length == 2)
  }
}
