package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DataSource V2 change-event source: pushdown, pruning, ordering,
  * corrupt-line tolerance. */
class CdcSourceV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]").appName("dsv2-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDir(): String = {
    val dir = Files.createTempDirectory("cdcv2").toFile
    val f1 = new java.io.File(dir, "log_001.jsonl")
    val w1 = new java.io.PrintWriter(f1)
    w1.println("""{"scn":1,"xid":"1.0.1","op":"BEGIN","obj":0}""")
    w1.println("""{"scn":2,"xid":"1.0.1","op":"INS","obj":100,"after":{"c1":"v1"}}""")
    w1.println("""{"scn":3,"xid":"1.0.1","op":"INS","obj":200,"after":{"c1":"v2"}}""")
    w1.println("this is not json")
    w1.println("""{"scn":4,"xid":"1.0.1","op":"COMMIT","obj":0}""")
    w1.close()
    val f2 = new java.io.File(dir, "log_002.jsonl")
    val w2 = new java.io.PrintWriter(f2)
    w2.println("""{"scn":5,"xid":"2.0.1","op":"INS","obj":100,"after":{"c1":"v3"}}""")
    w2.close()
    dir.getAbsolutePath
  }

  private def read(dir: String) =
    spark.read.format("graft.sources.CdcSourceV2").option("path", dir).load()

  test("reads all well-formed events; corrupt lines skipped") {
    val df = read(fixtureDir())
    assert(df.count() == 5)
    assert(df.schema == graft.cdc.ChangeEvent.schema)
  }

  test("obj equality filter is pushed and applied") {
    val df = read(fixtureDir()).filter(col("obj") === 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(obj,100)]") ||
      df.queryExecution.optimizedPlan.toString.contains("EqualTo"))
    assert(df.count() == 2)
    assert(df.select("scn").collect().map(_.getLong(0)).toSet == Set(2L, 5L))
  }

  test("scn range + op IN pushdown") {
    val df = read(fixtureDir())
      .filter(col("scn") >= 2 && col("scn") < 5 && col("op").isin("INS", "UPD"))
    assert(df.count() == 2)
  }

  test("column pruning: selecting scalars skips map materialization") {
    val df = read(fixtureDir()).select("scn", "op")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.count() == 5)
    assert(scan.contains("scn") && !scan.contains("suppBefore"))
  }

  test("micro-batch stream picks up newly-appeared files exactly once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcv2s").toFile
    def writeLog(name: String, scns: Seq[Long]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      scns.foreach(n =>
        w.println(s"""{"scn":$n,"xid":"1.0.1","op":"INS","obj":1}"""))
      w.close()
    }
    writeLog("log_001.jsonl", Seq(1, 2))
    val df = spark.readStream.format("graft.sources.CdcSourceV2")
      .option("path", dir.getAbsolutePath).load()
    val query = df.select("scn").writeStream
      .format("memory").queryName("cdcv2_stream").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("cdcv2_stream").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L))
      writeLog("log_002.jsonl", Seq(3, 4, 5)) // log switch: new archived file
      query.processAllAvailable()
      assert(spark.table("cdcv2_stream").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L)) // no duplicates, nothing missed
    } finally query.stop()
  }

  test("micro-batch offsets survive non-zero-padded sequences (log_10 after log_9)") {
    import spark.implicits._
    // 'log_10' < 'log_9' lexicographically: a count-into-sorted-listing
    // offset would re-emit log_9 and permanently skip log_10. The offset is
    // the last consumed file name with numeric-sequence ordering instead.
    val dir = Files.createTempDirectory("cdcv2n").toFile
    def writeLog(name: String, scns: Seq[Long]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      scns.foreach(n =>
        w.println(s"""{"scn":$n,"xid":"1.0.1","op":"INS","obj":1}"""))
      w.close()
    }
    writeLog("log_9.jsonl", Seq(1, 2))
    val df = spark.readStream.format("graft.sources.CdcSourceV2")
      .option("path", dir.getAbsolutePath).load()
    val query = df.select("scn").writeStream
      .format("memory").queryName("cdcv2_npad").outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table("cdcv2_npad").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L))
      writeLog("log_10.jsonl", Seq(3, 4))
      query.processAllAvailable()
      assert(spark.table("cdcv2_npad").as[Long].collect().sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L)) // exactly once: no re-emit, nothing skipped
    } finally query.stop()
  }

  test("batch listing orders by numeric log sequence") {
    val fs = graft.sources.CdcScan.listFiles({
      val dir = Files.createTempDirectory("cdcv2o").toFile
      Seq("log_9.jsonl", "log_10.jsonl", "log_2.jsonl").foreach { n =>
        val w = new java.io.PrintWriter(new java.io.File(dir, n)); w.close()
      }
      dir.getAbsolutePath
    }).map(p => new java.io.File(p).getName).toSeq
    assert(fs == Seq("log_2.jsonl", "log_9.jsonl", "log_10.jsonl"))
  }

  test("sortKey survives digit runs longer than Long (hash-ish suffixes)") {
    import graft.sources.CdcScan.sortKey
    // 25-digit run would overflow Long.parseLong — must degrade to the
    // non-sequenced key, not crash listFiles/latestOffset
    val k = sortKey("dump_9999999999999999999999999.jsonl")
    assert(k == (Long.MaxValue, "dump_9999999999999999999999999.jsonl"))
    // and still sorts after genuinely-sequenced names
    assert(Ordering[(Long, String)].lt(sortKey("log_10.jsonl"), k))
  }

  test("feeds the real pipeline: as[ChangeEvent] + assembly") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val events = read(fixtureDir()).as[graft.cdc.ChangeEvent]
    val out = graft.cdc.TxnAssembly.assembleBatch(events,
      graft.cdc.TxnAssembly.Config(commitAtEnd = true)).collect()
    // txn 1.0.1 commits 2 inserts; 2.0.1 flushes at end-of-feed
    assert(out.length == 3)
    assert(out.filter(_.xid == "1.0.1").forall(_.cScn == 4L))
  }
}
