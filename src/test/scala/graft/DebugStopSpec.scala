package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.cdc._
import graft.streaming.{ConfigLoader, DebugStop}

/** The config's debug element enforced on the engine's own units:
  * stop-transactions counts drained (committed) keyed-state rows,
  * stop-checkpoints counts micro-batches, and the owner/table trigger
  * fires on materialized DML against the debug table. */
class DebugStopSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def txn(id: Int): Seq[ChangeEvent] = Seq(
    ChangeEvent(id * 10L, s"$id.0.1", Op.Begin),
    ChangeEvent(id * 10L + 1, s"$id.0.1", Op.Ins).copy(after = Map("k" -> "v")),
    ChangeEvent(id * 10L + 2, s"$id.0.1", Op.Commit))

  test("stop-transactions halts the stream once N commits drain") {
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val conf = ConfigLoader.DebugConf(0L, 0L, stopTransactions = 2L, "", "")
    val input = MemoryStream[ChangeEvent]
    val query = TxnAssembly.assembleStream(input.toDS())
      .writeStream.format("noop").outputMode("append").start()
    val stopper = DebugStop.attach(spark, query, conf)
    try {
      input.addData(txn(1) ++ txn(2): _*)
      try query.processAllAvailable() catch { case _: Throwable => }
      val deadline = System.nanoTime() + 10000000000L
      while (query.isActive && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!query.isActive, "query should have been debug-stopped")
      assert(stopper.stopReason.exists(_.startsWith("stop-transactions")))
    } finally {
      DebugStop.detach(spark, stopper)
      if (query.isActive) query.stop()
    }
  }

  test("stop-checkpoints halts after N micro-batches") {
    implicit val s: SparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    import s.implicits._
    val conf = ConfigLoader.DebugConf(0L, stopCheckpoints = 1L, 0L, "", "")
    val input = MemoryStream[ChangeEvent]
    val query = TxnAssembly.assembleStream(input.toDS())
      .writeStream.format("noop").outputMode("append").start()
    val stopper = DebugStop.attach(spark, query, conf)
    try {
      input.addData(txn(1): _*)
      try query.processAllAvailable() catch { case _: Throwable => }
      val deadline = System.nanoTime() + 10000000000L
      while (query.isActive && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!query.isActive)
      assert(stopper.stopReason.exists(_.startsWith("stop-checkpoints")))
    } finally {
      DebugStop.detach(spark, stopper)
      if (query.isActive) query.stop()
    }
  }

  test("debug-table trigger fires on DML against owner.table only") {
    val s = spark
    import s.implicits._
    val conf = ConfigLoader.DebugConf(0L, 0L, 0L, "APP", "DEBUGTAB")
    val batch = Seq(("APP", "ORDERS", "c"), ("APP", "DEBUGTAB", "u"))
      .toDF("owner", "table_name", "op")
    assert(DebugStop.checkBatch(batch, conf))
    val clean = Seq(("APP", "ORDERS", "c")).toDF("owner", "table_name", "op")
    assert(!DebugStop.checkBatch(clean, conf))
    // unset trigger never fires
    assert(!DebugStop.checkBatch(batch, conf.copy(table = "")))
  }

  test("ConfigLoader parses the debug element") {
    val dict = Dictionary(Seq(
      DbTable(1L, 1L, "A", "T", Seq(DbColumn("C", 1)))))
    val json =
      """{"source": [{"alias": "S", "name": "D",
        |  "reader": {"type": "batch", "redo-log": ["/f"]},
        |  "format": {"type": "json"}, "filter": {"table": []},
        |  "debug": {"stop-log-switches": 3, "stop-checkpoints": 5,
        |    "stop-transactions": 7, "owner": "USR1", "table": "ADAM1"}}]}"""
        .stripMargin
    val l = ConfigLoader.load(json, dict)
    assert(l.debug.contains(ConfigLoader.DebugConf(3L, 5L, 7L, "USR1", "ADAM1")))
    // a config without a debug section yields no DebugConf
    val plain =
      """{"source": [{"alias": "S", "name": "D",
        |  "reader": {"type": "batch", "redo-log": ["/f"]},
        |  "format": {"type": "json"}, "filter": {"table": []}}]}""".stripMargin
    assert(ConfigLoader.load(plain, dict).debug.isEmpty)
  }
}
