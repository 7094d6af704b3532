package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._
import graft.streaming.{ConfigLoader, Pipeline}

/** The reference-config loader must read OpenLogReplicator.json documents
  * exactly as the reference's own examples shape them (scripts/
  * OpenLogReplicator-example-*.json) and map every format knob per
  * Format.h bit semantics. */
class ConfigLoaderSpec extends AnyFunSuite {

  private val dict = Dictionary(Seq(
    DbTable(100L, 100L, "OWNER1", "TABLENAME1",
      Seq(DbColumn("COL1", 1), DbColumn("COL2", 1), DbColumn("COL3", 1),
        DbColumn("OTHER", 1))),
    DbTable(200L, 200L, "OWNER1", "TABLENAME2", Seq(DbColumn("ID", 2))),
    DbTable(300L, 300L, "OWNER2", "TABX", Seq(DbColumn("ID", 2)))))

  test("file-writer example config: tables, keys, writer, defaults") {
    val json =
      """{
        |  "version": "1.9.0",
        |  "source": [{
        |    "alias": "SOURCE", "name": "DBNAME",
        |    "reader": {"type": "batch", "redo-log": ["/data/feed"]},
        |    "format": {"type": "json"},
        |    "filter": {"table": [
        |      {"owner": "OWNER1", "table": "TABLENAME1",
        |       "key": "COL1,COL2,COL3"},
        |      {"owner": "OWNER1", "table": "TABLENAME2"},
        |      {"owner": "OWNER2", "table": "TAB.*"}]}
        |  }],
        |  "target": [{
        |    "alias": "FILE", "source": "SOURCE",
        |    "writer": {"type": "file", "output": "output-%t.json",
        |      "new-line": 1, "max-file-size": 1073741824, "append": 0}
        |  }]
        |}""".stripMargin
    val l = ConfigLoader.load(json, dict)
    assert(l.alias == "SOURCE" && l.dbName == "DBNAME")
    assert(l.config.source.path == "/data/feed")
    // selectors select all three tables; key override applies to the first
    val d = l.config.dict
    assert(d.selected.map(_.name).toSet ==
      Set("TABLENAME1", "TABLENAME2", "TABX"))
    assert(d.lookup(100L, 1L).get.keyColumns.map(_.name) ==
      Seq("COL1", "COL2", "COL3"))
    assert(l.writer.contains(ConfigLoader.FileWriterSpec(
      "output-%t.json", 1073741824L, 1, append = false)))
    // reference format defaults: everything off
    val f = l.config.envelope
    assert(!f.scnFormatHex && !f.scnTypeBegin && !f.scnTypeCommit &&
      !f.timestampCommit && !f.addSequences && !f.schemaFormatFull &&
      !f.redoThread)
    assert(f.ridSkip) // RID_FORMAT::SKIP = 0 is the reference default
    assert(!f.attributesBegin && !f.attributesDml && !f.attributesCommit)
    assert(!f.dbAddDml && !f.dbAddDdl)
    assert(l.config.materialize.columnFormat == Materialize.Changed)
    assert(!l.config.messageFull)
  }

  test("full-knobs config: Format.h bit mapping") {
    val json =
      """{
        |  "source": [{
        |    "alias": "S", "name": "ORCL",
        |    "reader": {"type": "online", "db-timezone": "+05:30",
        |      "path-mapping": ["/db/fra", "/opt/fra"]},
        |    "format": {"type": "json",
        |      "column": 2, "char": 2, "scn": 1, "scn-type": 10,
        |      "message": 23, "attributes": 7, "schema": 5, "db": 3,
        |      "user-type": 15, "timestamp-type": 1, "rid": 1,
        |      "redo-thread": 1, "unknown-type": 1,
        |      "xid": 2, "timestamp": 7, "interval-dts": 9,
        |      "interval-ytm": 4},
        |    "filter": {
        |      "table": [{"owner": "OWNER1", "table": ".*",
        |        "condition": "[op] == 'i'", "tag": "[pk]"}],
        |      "skip-xid": ["0x0001.002.00000003"],
        |      "dump-xid": ["0x0009.001.00000001"]}
        |  }],
        |  "target": [{"alias": "K", "source": "S",
        |    "writer": {"type": "kafka", "brokers": "b:9092",
        |      "topic": "redo", "properties": {"acks": "all"}}}]
        |}""".stripMargin
    val l = ConfigLoader.load(json, dict)
    val f = l.config.envelope
    assert(f.scnFormatHex) // scn: 1 = TEXT_HEX
    assert(f.scnTypeBegin && f.scnTypeCommit) // scn-type 10 = BEGIN|COMMIT
    assert(f.timestampCommit) // timestamp-type 1 = COMMIT_VALUE
    // message 23 = FULL | ADD_SEQUENCES | SKIP_BEGIN | ADD_OFFSET
    assert(l.config.messageFull && f.addSequences && f.skipBegin &&
      !f.skipCommit && f.addOffset)
    assert(f.attributesBegin && f.attributesDml && f.attributesCommit) // 7
    assert(f.schemaFormatFull && f.schemaObj) // schema 5 = FULL | OBJ
    assert(f.dbAddDml && f.dbAddDdl) // db 3 = ALL
    assert(f.userBegin && f.userDml && f.userCommit && f.userDdl) // 15
    assert(!f.ridSkip) // rid 1 = TEXT
    assert(f.redoThread)
    assert(l.config.materialize.columnFormat == Materialize.FullUpd)
    assert(l.config.materialize.charFormatHex) // char 2 = HEX
    assert(l.config.materialize.unknownTypeShow)
    // filter extras
    assert(l.config.assembly.skipXids == Set("0x0001.002.00000003"))
    assert(l.config.assembly.dumpXids == Set("0x0009.001.00000001"))
    val t = l.config.dict.lookup(100L, 1L).get
    assert(t.conditionExpr == "[op] == 'i'" && t.tagType == "pk")
    // reader extras
    assert(l.dbTimezoneSec == 5 * 3600 + 30 * 60)
    assert(l.pathMapping == Seq("/db/fra" -> "/opt/fra"))
    // codec-side selectors surfaced raw
    assert(l.xidFormat == 2 && l.timestampFormat == 7 &&
      l.intervalDts == 9 && l.intervalYtm == 4)
    assert(l.writer.contains(ConfigLoader.KafkaWriterSpec(
      "b:9092", "redo", Map("acks" -> "all"))))
  }

  test("debezium preset and protobuf wire format") {
    val json =
      """{"source": [{"alias": "S", "name": "ORCL",
        |  "reader": {"type": "batch"},
        |  "format": {"type": "debezium"},
        |  "filter": {"table": [{"owner": ".*", "table": ".*"}]}}],
        | "target": [{"alias": "D", "source": "S",
        |   "writer": {"type": "discard"}}]}""".stripMargin
    val l = ConfigLoader.load(json, dict)
    assert(l.config.envelope == Envelope.debezium("ORCL"))
    assert(l.writer.contains(ConfigLoader.DiscardWriterSpec))

    val pb = ConfigLoader.load(json.replace("debezium", "protobuf"), dict)
    assert(pb.config.wireFormat == "proto")
  }

  test("unparseable db-timezone is a config error, like the reference") {
    val json =
      """{"source": [{"alias": "S", "name": "D",
        |  "reader": {"type": "batch", "db-timezone": "bogus"},
        |  "format": {"type": "json"}, "filter": {"table": []}}]}"""
        .stripMargin
    intercept[IllegalArgumentException] { ConfigLoader.load(json, dict) }
  }

  test("loaded config drives Pipeline.batch end-to-end") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2").getOrCreate()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg").toString
    Seq(
      ChangeEvent(1L, "9.0.1", Op.Ins).copy(obj = 100L,
        after = Map("COL1" -> "1", "OTHER" -> "x")),
      ChangeEvent(2L, "9.0.1", Op.Commit))
      .toDS().coalesce(1).write.json(s"$dir/feed")
    val json =
      s"""{"source": [{"alias": "S", "name": "D",
         |  "reader": {"type": "batch", "redo-log": ["$dir/feed"]},
         |  "format": {"type": "json"},
         |  "filter": {"table": [
         |    {"owner": "OWNER1", "table": "TABLENAME1", "key": "COL1"}]}}]}"""
        .stripMargin
    val l = ConfigLoader.load(json, dict)
    val out = Pipeline.batch(spark, l.config).collect()
    assert(out.length == 1)
    val value = out.head.getAs[String]("value")
    assert(value.contains(""""op":"c"""") && value.contains("TABLENAME1"))
    // no top-level metrics section → no registry
    assert(l.metrics.isEmpty)
  }

  test("flags bitmask maps REDO_FLAGS bits onto the materialize knobs") {
    def loadFlags(v: Long) = ConfigLoader.load(
      s"""{"source": [{"alias": "S", "name": "D",
         |  "reader": {"type": "batch", "redo-log": ["/f"]},
         |  "flags": $v,
         |  "format": {"type": "json"}, "filter": {"table": []}}]}"""
        .stripMargin, dict)
    // 0x0002 SCHEMALESS | 0x0040 SHOW_HIDDEN | 0x0800 SHOW_SYSTEM
    val l1 = loadFlags(0x2L | 0x40L | 0x800L)
    assert(l1.config.materialize.schemaless)
    assert(l1.config.materialize.showHiddenColumns)
    assert(l1.config.materialize.showSystemTransactions)
    assert(!l1.config.materialize.showNestedColumns && !l1.adaptiveSchema)
    // 0x0004 ADAPTIVE implies schemaless and surfaces adaptiveSchema;
    // 0x10000/0x20000 experimental decode flags
    val l2 = loadFlags(0x4L | 0x10000L | 0x20000L)
    assert(l2.config.materialize.schemaless && l2.adaptiveSchema)
    assert(l2.config.materialize.experimentalXmlType)
    assert(l2.config.materialize.experimentalJson)
    // reader-layer bits ride through on rawFlags (ARCH_ONLY here)
    val l3 = loadFlags(0x1L)
    assert(l3.rawFlags == 1L && !l3.config.materialize.schemaless)
    // no flags → defaults
    assert(loadFlags(0L).config.materialize ==
      graft.cdc.Materialize.Options())
  }

  test("metrics section: the documented prometheus example maps to a " +
    "name-parity registry") {
    // metrics.adoc's own configuration example, verbatim shape
    val json =
      """{"source": [{"alias": "S", "name": "D",
        |  "reader": {"type": "batch", "redo-log": ["/data/feed"]},
        |  "format": {"type": "json"}, "filter": {"table": []}}],
        |  "metrics": {"type": "prometheus", "bind": "0.0.0.0:8080",
        |    "tag-names": "all"}}""".stripMargin
    val l = ConfigLoader.load(json, dict)
    val mc = l.metrics.get
    assert(mc.metricsType == "prometheus" && mc.bind == "0.0.0.0:8080")
    assert(mc.tagNames == graft.streaming.Prometheus.TagNames.All)
    val reg = mc.newRegistry()
    // the registry honors the knob: user-table dml gets (owner, table)
    reg.emitDmlOps("insert", "out", 2, "OWNER1", "TABLENAME1")
    assert(reg.render().contains(
      "dml_ops{filter=\"out\",owner=\"OWNER1\"," +
        "table=\"TABLENAME1\",type=\"insert\"} 2"))
    // invalid tag-names is a config error (ConfigurationException 30001)
    intercept[IllegalArgumentException] {
      ConfigLoader.load(json.replace("\"all\"", "\"bogus\""), dict)
    }
  }

  // base document for the reader/state/memory knob tests
  private def docWith(reader: String, extra: String = ""): String =
    s"""{"source": [{"alias": "S", "name": "D",
       |  "reader": {$reader},
       |  "format": {"type": "json"}, "filter": {"table": []}$extra}]}"""
      .stripMargin

  test("reader start position: start-scn/start-seq land on the source " +
      "config as pushdown bounds; start-time resolves in the db zone") {
    val l = ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"], "start-scn": 5000,
        | "start-seq": 7""".stripMargin), dict)
    assert(l.config.source.startScn.contains(5000L))
    assert(l.config.source.startSeq.contains(7L))
    assert(l.config.source.startTm.isEmpty)
    // absolute start-time: wall time in db-timezone → epoch nanos
    val lt = ConfigLoader.load(docWith(
      """"type": "online", "db-timezone": "+02:00",
        | "start-time": "2024-01-01 02:00:00"""".stripMargin), dict)
    assert(lt.config.source.startTm.contains(
      java.time.Instant.parse("2024-01-01T00:00:00Z")
        .getEpochSecond * 1000000000L))
    // relative: now minus rel seconds (injectable clock)
    val lr = ConfigLoader.load(docWith(
      """"type": "online", "start-time-rel": 100"""),
      dict, now = () => 1000000000L * 1000L) // epoch ms
    assert(lr.config.source.startTm.contains(
      (1000000000L - 100L) * 1000000000L))
    // the reference's mutual exclusions (ReplicatorOnline startup checks)
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "online", "start-scn": 1, "start-time-rel": 5"""), dict))
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "online", "start-scn": 1,
        | "start-time": "2024-01-01 00:00:00"""".stripMargin), dict))
  }

  test("reader validations: type whitelist, redo-log batch-only, " +
      "host/log timezone parse, disable-checks surfaced") {
    intercept[IllegalArgumentException](
      ConfigLoader.load(docWith(""""type": "bogus""""), dict))
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "online", "redo-log": ["/f"]"""), dict))
    val l = ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/a", "/b"],
        | "host-timezone": "+05:30", "log-timezone": "-03:00",
        | "disable-checks": 12""".stripMargin), dict)
    assert(l.readerMode == "batch" && l.redoLogs == Seq("/a", "/b") &&
      l.config.source.path == "/a")
    assert(l.hostTimezoneSec.contains(5 * 3600 + 30 * 60))
    assert(l.logTimezoneSec.contains(-3 * 3600))
    assert(l.disableChecks == 12)
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"], "host-timezone": "junk""""),
      dict))
  }

  test("transaction-max-mb wires the byte drop rule and validates " +
      "against memory.max-mb (OpenLogReplicator.cpp:600-605)") {
    val l = ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"], "transaction-max-mb": 64"""),
      dict)
    assert(l.config.assembly.maxBytesPerTxn == 64L * 1024 * 1024)
    // over the memory arena cap → 30001
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"], "transaction-max-mb": 4096"""),
      dict))
    // explicit memory element raises the cap
    val l2 = ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"], "transaction-max-mb": 4096""",
      extra = """, "memory": {"max-mb": 8192}"""), dict)
    assert(l2.config.assembly.maxBytesPerTxn == 4096L * 1024 * 1024)
    assert(l2.memory.maxMb == 8192L)
    // derived memory defaults follow max-mb (9.memory.adoc formulas)
    assert(l2.memory.swapMb == 8192L * 3 / 4 &&
      l2.memory.readBufferMaxMb == 128L && l2.memory.writeBufferMaxMb == 2048L)
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"]""",
      extra = """, "memory": {"max-mb": 64, "min-mb": 128}"""), dict))
  }

  test("state element: reference defaults, disk-only validation, " +
      "keep-checkpoints drives the snapshot retention") {
    val l = ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"]"""), dict)
    assert(l.state == ConfigLoader.StateConf()) // 11.state.adoc defaults
    assert(l.config.snapshotKeep == 100)
    val l2 = ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"]""",
      extra = """, "state": {"type": "disk", "path": "/ckpt",
                |   "interval-mb": 100, "interval-s": 60,
                |   "keep-checkpoints": 7, "schema-force-interval": 3}"""
        .stripMargin), dict)
    assert(l2.state == ConfigLoader.StateConf("disk", "/ckpt", 100L, 60L, 7, 3))
    assert(l2.config.snapshotKeep == 7)
    intercept[IllegalArgumentException](ConfigLoader.load(docWith(
      """"type": "batch", "redo-log": ["/f"]""",
      extra = """, "state": {"type": "s3"}"""), dict))
  }

  test("writer knobs: file timestamp-format/flush-size/new-line range, " +
      "kafka max-message-mb/queue-size ranges") {
    def doc(writer: String): String =
      s"""{"source": [{"alias": "S", "name": "D",
         |  "reader": {"type": "batch", "redo-log": ["/f"]},
         |  "format": {"type": "json"}, "filter": {"table": []}}],
         |  "target": [{"alias": "T", "source": "S", "writer": {$writer}}]}"""
        .stripMargin
    val f = ConfigLoader.load(doc(
      """"type": "file", "output": "o-%t.json", "max-file-size": 100,
        | "append": 0, "timestamp-format": "%Y%m%d",
        | "write-buffer-flush-size": 4096""".stripMargin), dict)
    assert(f.writer.contains(ConfigLoader.FileWriterSpec("o-%t.json", 100L,
      0, append = false, timestampFormat = "%Y%m%d",
      writeBufferFlushSize = 4096L)))
    assert(f.writer.get.asInstanceOf[ConfigLoader.FileWriterSpec]
      .newLineStr == "") // reference default new-line: none
    intercept[IllegalArgumentException](ConfigLoader.load(doc(
      """"type": "file", "output": "o.json", "new-line": 3"""), dict))
    val k = ConfigLoader.load(doc(
      """"type": "kafka", "brokers": "b:9092", "topic": "t",
        | "max-message-mb": 10, "queue-size": 1000,
        | "poll-interval-us": 50000""".stripMargin), dict)
    assert(k.writer.contains(ConfigLoader.KafkaWriterSpec("b:9092", "t",
      Map.empty, maxMessageMb = 10, queueSize = 1000,
      pollIntervalUs = 50000L)))
    intercept[IllegalArgumentException](ConfigLoader.load(doc(
      """"type": "kafka", "brokers": "b", "topic": "t",
        | "max-message-mb": 954""".stripMargin), dict))
    intercept[IllegalArgumentException](ConfigLoader.load(doc(
      """"type": "network", "uri": "h:9", "queue-size": 0"""), dict))
    intercept[IllegalArgumentException](ConfigLoader.load(doc(
      """"type": "network", "uri": "h:9", "poll-interval-us": 10"""), dict))
  }
}
