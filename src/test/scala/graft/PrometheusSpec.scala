package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Metrics, Prometheus}
import graft.streaming.Prometheus.TagNames

/** Pins the Prometheus metric surface to the reference's exporter
  * contract (documentation/metrics/metrics.adoc;
  * MetricsPrometheus.cpp:41-278): the exact family names, types, and
  * fixed startup series a migrating user's dashboards scrape, plus the
  * tag-names dispatch and counter/gauge update semantics.
  */
class PrometheusSpec extends AnyFunSuite {

  test("fresh registry exposes the reference's exact startup series set") {
    val reg = new Prometheus()
    val got = reg.surface
    // the series count the reference registers at startup: 10 unlabeled
    // + checkpoints 2 + ddl 6 + dml 6 + switches 2 + switch-lag 2 +
    // memory_used_mb 6 + service_state 6 + swap_ops 3 + transactions 6
    assert(got.size == 49, s"got ${got.size}")
    // documented names only — notably `transactions`, NOT the
    // reference's misregistered duplicate "dml_ops" family name
    // (MetricsPrometheus.cpp:251 vs metrics.adoc)
    val names = got.map(_._1)
    assert(names == Set("bytes_confirmed", "bytes_parsed", "bytes_read",
      "bytes_sent", "checkpoints", "checkpoint_lag", "ddl_ops", "dml_ops",
      "log_switches", "log_switches_lag", "memory_allocated_mb",
      "memory_used_total_mb", "memory_used_mb", "messages_confirmed",
      "messages_sent", "service_state", "swap_operations_mb",
      "swap_usage_mb", "transactions"))
    assert(got.contains(("dml_ops", "counter",
      Seq("filter" -> "skip", "type" -> "update"))))
    assert(got.contains(("transactions", "counter",
      Seq("filter" -> "partial", "type" -> "rollback"))))
    assert(got.contains(("memory_used_mb", "gauge", Seq("type" -> "writer"))))
    assert(got.contains(("service_state", "gauge",
      Seq("state" -> "aborting"))))
    // every startup series renders at zero
    val rendered = reg.render()
    rendered.linesIterator.filterNot(_.startsWith("#")).foreach { l =>
      assert(l.endsWith(" 0"), l)
    }
  }

  test("counters accumulate deltas; gauges overwrite") {
    val reg = new Prometheus()
    reg.emitBytesRead(100); reg.emitBytesRead(50)
    reg.emitCheckpointLag(3.5); reg.emitCheckpointLag(1.25)
    val r = reg.render()
    assert(r.contains("bytes_read 150"))
    assert(r.contains("checkpoint_lag 1.25"))
  }

  test("tag-names dispatch matches Builder.cpp:778-791") {
    def dml(tn: TagNames, system: Boolean) = {
      val reg = new Prometheus(tn)
      reg.emitDmlOps("insert", "out", 1, "SCOTT", "EMP", systemTable = system)
      reg.surface.filter(s => s._1 == "dml_ops" &&
        s._3.exists(_._1 == "owner"))
    }
    assert(dml(TagNames.None, system = false).isEmpty)
    assert(dml(TagNames.Filter, system = false).nonEmpty)
    assert(dml(TagNames.Filter, system = true).isEmpty)
    assert(dml(TagNames.Sys, system = true).nonEmpty)
    assert(dml(TagNames.Sys, system = false).isEmpty)
    assert(dml(TagNames.All, system = false).nonEmpty)
    // the tagged series carries all four labels, sorted by key
    val s = dml(TagNames.All, system = true).head
    assert(s._3 == Seq("filter" -> "out", "owner" -> "SCOTT",
      "table" -> "EMP", "type" -> "insert"))
    assert(TagNames.parse("all") == TagNames.All)
    intercept[IllegalArgumentException](TagNames.parse("bogus"))
  }

  test("service_state is one-hot; transitions clear the previous state") {
    val reg = new Prometheus()
    reg.setServiceState("starting")
    reg.setServiceState("replicating")
    val r = reg.render()
    assert(r.contains("service_state{state=\"replicating\"} 1"))
    assert(r.contains("service_state{state=\"starting\"} 0"))
    assert(r.contains("service_state{state=\"aborting\"} 0"))
  }

  test("observeBatch maps keyed txn state to memory_used_mb{transactions}") {
    val reg = new Prometheus()
    reg.observeBatch(Metrics.BatchMetrics(
      batchId = 1, inputRows = 10, inputRowsPerSec = 1.0,
      processedRowsPerSec = 1.0, stateRows = 5,
      stateBytes = 2L * 1048576, batchDurationMs = 1500))
    val r = reg.render()
    assert(r.contains("memory_used_mb{type=\"transactions\"} 2"))
    assert(r.contains("checkpoint_lag 1.5"))
  }

  test("task-metrics bridge feeds bytes_read from real scans") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    val reg = new Prometheus()
    val bridge = Metrics.attachTaskMetrics(spark, reg)
    try {
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
      // listener bus is async; poll until the counter lands
      def read(): Long = reg.render().linesIterator
        .find(_.startsWith("bytes_read ")).get
        .stripPrefix("bytes_read ").toLong
      var tries = 0
      while (read() == 0 && tries < 100) { Thread.sleep(50); tries += 1 }
      assert(read() > 0)
      // swap families stay registered at zero without spill
      assert(reg.render().contains("swap_operations_mb{type=\"read\"} 0"))
    } finally Metrics.detachTaskMetrics(spark, bridge)
  }

  test("exposition format: every line is a comment or name{labels} value") {
    val reg = new Prometheus(TagNames.All)
    reg.emitDmlOps("update", "out", 3, "A", "B")
    reg.emitTransactions("commit", "out", 7)
    val line = "^[a-z_]+(\\{[a-z]+=\"[^\"]*\"(,[a-z]+=\"[^\"]*\")*\\})? -?[0-9.]+(E-?[0-9]+)?$".r
    reg.render().linesIterator.foreach { l =>
      assert(l.startsWith("# HELP") || l.startsWith("# TYPE") ||
        line.matches(l), l)
    }
  }
}
