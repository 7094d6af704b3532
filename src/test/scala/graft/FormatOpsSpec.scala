package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.queries.FormatOps

/** Pins the Format.h rendering pack (q62–q66) beyond what the DuckDB gate
  * can see: full-nano ISO fractions (the oracle engine truncates parquet
  * NANOS to micros), negative-interval signs, and the DDL/chkpt message
  * shapes on sf0.001.
  */
class FormatOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("ts rendering: full-nano fraction, round-half-up unix, negative sign") {
    import spark.implicits._
    // 2024-01-01T00:00:07.179575175Z; a round-half-up boundary (x.5 µs up);
    // a negative (pre-1970) value exercising sign-carried-separately
    val rows = Seq(1704067207179575175L, 1500L, -1500L)
      .toDF("n").selectExpr(FormatOps.tsRenderExprs: _*)
      .collect()
    val full = rows(0)
    assert(full.getAs[String]("iso_nano_tz") ==
      "2024-01-01T00:00:07.179575175Z")
    assert(full.getAs[String]("iso_sec") == "2024-01-01 00:00:07")
    assert(full.getAs[Long]("unix_micro") == 1704067207179575L)
    assert(full.getAs[Long]("unix_milli") == 1704067207180L)
    assert(full.getAs[Long]("unix_sec") == 1704067207L)
    // 1500 ns → 2 µs (half rounds up on magnitude)
    assert(rows(1).getAs[Long]("unix_micro") == 2L)
    // reference carries '-' separately: -1500 ns → -2 µs, not -1
    assert(rows(2).getAs[Long]("unix_micro") == -2L)
  }

  test("session-timezone independence of the ISO family") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      import spark.implicits._
      val expr = FormatOps.tsRenderExprs
      def render() = Seq(1704067207179575175L).toDF("n")
        .selectExpr(expr: _*).collect().head.getAs[String]("iso_nano_tz")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utc = render()
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(render() == utc)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("q62 ddl messages ride the real assembler flush") {
    val out = FormatOps.defs("q62_ddl_messages")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("op") == "ddl"))
    assert(out.forall(_.getAs[String]("ddl_text").startsWith("ALTER TABLE T")))
  }

  test("q63 checkpoint message rides the data batch") {
    val row = FormatOps.defs("q63_checkpoint_msg")(spark, sf).collect().head
    val nEvents = spark.read
      .parquet(s"$sf/events.parquet").count()
    assert(row.getAs[Long]("n_total") == nEvents + 1)
    assert(row.getAs[String]("chkpt_value").contains("\"op\":\"chkpt\""))
  }

  test("tz timestamp codec: offsets, named zones, fallback, invalid") {
    import graft.core.OracleCodecs._
    val sec = 1704067200L // 2024-01-01T00:00:00Z
    // named zone (Europe/Warsaw key 0x8638)
    assert(tzTimestampIso(tzTimestampEncode(sec, 123456789L, 0x86, 0x38)) ==
      "2024-01-01T00:00:00.123456789Z Europe/Warsaw")
    // numeric offsets: both sign paths of Builder.cpp:303-330
    assert(tzTimestampIso(tzTimestampEncode(sec, 0L, 22, 60))
      .endsWith("Z +02:00"))
    assert(tzTimestampIso(tzTimestampEncode(sec, 0L, 15, 30))
      .endsWith("Z -05:30"))
    // unmapped region key → "TZ?"
    assert(tzTimestampIso(tzTimestampEncode(sec, 0L, 0x7f, 0x01))
      .endsWith("Z TZ?"))
    // unix nano string: big-number path digits == epoch*1e9 + fraction
    assert(tzTimestampUnix(tzTimestampEncode(sec, 42L, 0xd0, 0x04)) ==
      "1704067200000000042,UTC")
    // small-|epoch| path
    assert(tzTimestampUnix(tzTimestampEncode(86400L, 7L, 0xd0, 0x04)) ==
      "86400000000007,UTC")
    // out-of-range field → null (caller falls back to unknown dump)
    val bad = tzTimestampEncode(sec, 0L, 0xd0, 0x04)
    bad(4) = 30 // hour byte → 29 > 23
    assert(tzTimestampIso(bad) == null)
    assert(tzTimestampIso(Array[Byte](1, 2, 3)) == null)
  }

  test("q68 renders through encode∘decode inside the plan") {
    val rows = FormatOps.defs("q68_ts_tz_render")(spark, sf).limit(24).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[String]("iso_tz").contains("Z ")))
  }

  test("hex formats: uppercase value hex, '?' + dump line for unknowns") {
    import graft.core.OracleCodecs
    assert(OracleCodecs.unknownDump("c", Array[Byte](0x61, 0x62)) ==
      "unknown value (column: c): 2 -  61 62") // double space: " - " + " 61"
    val row = FormatOps.defs("q69_hex_formats")(spark, sf).limit(1).collect().head
    assert(row.getAs[String]("etype_hex").matches("[0-9A-F]+"))
    assert(row.getAs[String]("unk_value") == "?")
    assert(row.getAs[String]("unk_dump").startsWith("unknown value (column: etype): "))
  }

  test("assembler propagates begin scn and commit wall clock to messages") {
    import graft.cdc._
    val st = TxnAssembly.TxnState.empty
    val cfg = TxnAssembly.Config(emitBeginCommit = true)
    val begin = ChangeEvent(10L, "7.0.7", Op.Begin)
    val ins = ChangeEvent(11L, "7.0.7", Op.Ins).copy(
      after = Map("v" -> "1"), tm = 111L)
    val commit = ChangeEvent(12L, "7.0.7", Op.Commit).copy(tm = 999L)
    val out = Seq(begin, ins, commit)
      .flatMap(e => TxnAssembly.onEvent("7.0.7", e, st, cfg))
    assert(out.map(_.op) == Seq("begin", "c", "commit"))
    // b_scn = the BEGIN record's scn; tm = the COMMIT record's clock —
    // on every message of the transaction (BuilderJson.h:256-289)
    assert(out.forall(_.bScn == 10L))
    assert(out.forall(_.tm == 999L))
  }

  test("skip-begin/skip-commit drop brackets; FULL groups a txn") {
    import graft.cdc.Envelope
    val enriched = spark.sql(
      """SELECT * FROM VALUES
        |  (20L, 0L, 10L, 1L, '7', 'begin', 0L, CAST(NULL AS STRING),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS STRING), 10L, 0L,
        |   CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING)),
        |  (20L, 1L, 11L, 1L, '7', 'c', 5L, 'RID1',
        |   CAST(NULL AS MAP<STRING,STRING>), map('v', '1'),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS STRING), 10L, 0L,
        |   'APP', 'T', CAST(NULL AS STRING)),
        |  (20L, 2L, 12L, 1L, '7', 'u', 5L, 'RID2',
        |   map('v', '1'), map('v', '2'),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS STRING), 10L, 0L,
        |   'APP', 'T', CAST(NULL AS STRING)),
        |  (20L, 3L, 20L, 1L, '7', 'commit', 0L, CAST(NULL AS STRING),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS STRING), 10L, 0L,
        |   CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING))
        |AS t(cScn, cIdx, scn, seq, xid, op, obj, rid, before, after,
        |     attrs, ddlText, bScn, tm, owner, table_name, tag)""".stripMargin)
    val skipped = Envelope.toMessages(enriched,
      Envelope.Format(skipBegin = true, skipCommit = true))
      .select("op").collect().map(_.getString(0)).toSeq
    assert(skipped == Seq("c", "u"))
    val full = Envelope.toTxnMessages(enriched).collect()
    assert(full.length == 1)
    val v = full.head.getAs[String]("value")
    // header scn = the begin scn; payload = DMLs only, in cIdx order
    assert(v.startsWith("""{"c_scn":20,"c_idx":0,"scn":10,"seq":1,"xid":"7","payload":["""))
    assert(v.indexOf("\"op\":\"c\"") < v.indexOf("\"op\":\"u\""))
    assert(!v.contains("begin") && !v.contains("commit"))
  }

  test("envelope knobs: usr/db per kind, scn hex, num, rid skip, offset") {
    import graft.cdc.Envelope
    // one txn: begin, insert (rid, offset, num 0), ddl, commit
    val enriched = spark.sql(
      """SELECT * FROM VALUES
        |  (20L, 0L, 10L, 1L, '7', 'begin', 0L, CAST(NULL AS STRING),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
        |   map('login username', 'SCOTT'), CAST(NULL AS STRING), 10L, 0L,
        |   2, -1L, 0L,
        |   CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING)),
        |  (20L, 1L, 11L, 1L, '7', 'c', 5L, 'RID1',
        |   CAST(NULL AS MAP<STRING,STRING>), map('v', '1'),
        |   map('login username', 'SCOTT'), CAST(NULL AS STRING), 10L, 0L,
        |   2, 4096L, 0L,
        |   'APP', 'T', CAST(NULL AS STRING)),
        |  (20L, 2L, 12L, 1L, '7', 'ddl', 5L, CAST(NULL AS STRING),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
        |   map('login username', 'SCOTT'), 'TRUNCATE TABLE T', 10L, 0L,
        |   2, 8192L, 1L,
        |   'APP', 'T', CAST(NULL AS STRING)),
        |  (20L, 3L, 20L, 1L, '7', 'commit', 0L, CAST(NULL AS STRING),
        |   CAST(NULL AS MAP<STRING,STRING>), CAST(NULL AS MAP<STRING,STRING>),
        |   map('login username', 'SCOTT'), CAST(NULL AS STRING), 10L, 0L,
        |   2, -1L, 0L,
        |   CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(NULL AS STRING))
        |AS t(cScn, cIdx, scn, seq, xid, op, obj, rid, before, after,
        |     attrs, ddlText, bScn, tm, thread, offset, num,
        |     owner, table_name, tag)""".stripMargin)
    def render(fmt: Envelope.Format): Seq[String] =
      Envelope.toMessages(enriched, fmt)
        .orderBy("cIdx").select("value").collect().map(_.getString(0)).toSeq

    // USER_TYPE::DML + DB ADD_DML (no ADD_DDL): usr/db on the DML header
    // only / on everything but DDL; num renders on the DML payload only;
    // rid skipped; offset on payloads that have one
    val vs = render(Envelope.Format(dbName = "D", dbAddDdl = false,
      userDml = true, addSequences = true, ridSkip = true, addOffset = true,
      attributesBegin = false, attributesDml = false,
      attributesCommit = false))
    assert(vs(0).contains("\"db\":\"D\"") && !vs(0).contains("usr"))
    assert(vs(1).contains("\"usr\":\"SCOTT\"") && vs(1).contains("\"num\":0"))
    assert(vs(1).contains("\"offset\":4096") && !vs(1).contains("RID1"))
    assert(!vs(2).contains("\"db\"") && !vs(2).contains("\"usr\""))
    assert(!vs(2).contains("\"num\"")) // DDL never reaches appendRowid
    assert(vs(3).contains("\"db\":\"D\"") && !vs(3).contains("\"usr\""))

    // USER_TYPE begin|commit|ddl, DB ADD_DDL only, rth
    val v2 = render(Envelope.Format(dbName = "D", dbAddDml = false,
      userBegin = true, userCommit = true, userDdl = true, redoThread = true))
    assert(v2(0).contains("\"usr\":\"SCOTT\"") && !v2(0).contains("\"db\""))
    assert(!v2(1).contains("\"usr\"") && !v2(1).contains("\"db\""))
    assert(v2(2).contains("\"usr\"") && v2(2).contains("\"db\":\"D\""))
    assert(v2.forall(_.contains("\"rth\":2")))

    // SCN_FORMAT::TEXT_HEX covers scn AND b_scn/e_scn (BuilderJson.h:
    // 239-276): keys gain the "s" suffix, values are 0x + 16-digit hex
    val v3 = render(Envelope.Format(scnFormatHex = true,
      scnTypeBegin = true, scnTypeCommit = true))
    assert(v3(1).contains("\"scns\":\"0x000000000000000b\""))
    assert(v3(1).contains("\"b_scns\":\"0x000000000000000a\""))
    assert(v3(1).contains("\"e_scns\":\"0x0000000000000014\""))
    assert(!v3(1).contains("\"scn\":") && !v3(1).contains("\"b_scn\":"))
  }

  test("q65/q66 codec round-trip on known values") {
    val xid = (6L << 48) | (0x1aL << 32) | 0x218L
    val q65 = FormatOps.defs("q65_xid_formats")(spark, sf)
    assert(q65.columns.toSeq ==
      Seq("event_id", "xid_hex", "xid_dec", "xidn", "xid_rev"))
    assert(graft.core.OracleCodecs.xidFormat(xid) == "0x0006.01a.00000218")
    assert(graft.core.OracleCodecs.xidFormatDec(xid) == "6.26.536")
    // -90061000000001 ns = -(1d 01:01:01.000000001)
    assert(graft.core.OracleCodecs.intervalDsString(-90061000000001L, ' ') ==
      "-1 01:01:01.000000001")
    assert(graft.core.OracleCodecs.intervalYmString(-13L, '-') == "-1-1")
    // full separator/unit matrix (Format.h:54-74): the oracle gate runs one
    // parameterization per family; the rest differ only by these args
    import graft.core.OracleCodecs._
    assert(intervalDsString(90061000000001L, ',') == "1,01:01:01.000000001")
    assert(intervalDsString(90061000000001L, '-') == "1-01:01:01.000000001")
    assert(intervalYmString(25L, ' ') == "2 1")
    assert(intervalYmString(25L, ',') == "2,1")
    // UNIX_NANO is the identity; micro/milli/sec round half-up on the
    // magnitude with the sign carried separately (Builder.cpp:538-546)
    assert(intervalDsUnix(1500L, 1L) == 1500L)
    assert(intervalDsUnix(1500L, 1000L) == 2L)
    assert(intervalDsUnix(-1500L, 1000L) == -2L)
    assert(intervalDsUnix(1499999L, 1000000L) == 1L)
    assert(intervalDsUnix(-500000000L, 1000000000L) == -1L)
  }
}
