package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc._

/** End-to-end CDC semantics over Spark: materialization, conditions,
  * envelope golden output, schema evolution (FIXTURES.md §C f01/f02/f11/
  * f12/f15/f19/f21 analogs). */
class CdcPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dict1 = Dictionary(Seq(
    DbTable(100L, 100L, "OWNER1", "T1",
      Seq(DbColumn("ID", 2, numPk = 1), DbColumn("VAL", 1)),
      tagType = "pk"),
    DbTable(200L, 200L, "OWNER1", "T2", Seq(DbColumn("ID", 2, numPk = 1))),
    DbTable(300L, 300L, "SYS", "OBJ$", Seq(DbColumn("OBJ#", 2)))),
    Seq(TableSelector("OWNER1", ".*")))

  private def ev(scn: Long, op: String, obj: Long = 100L,
      before: Map[String, String] = null, after: Map[String, String] = null,
      attrs: Map[String, String] = null): ChangeEvent =
    ChangeEvent(scn, "9.0.1", op).copy(obj = obj,
      before = Option(before).getOrElse(Map.empty),
      after = Option(after).getOrElse(Map.empty),
      attrs = Option(attrs).getOrElse(Map.empty))

  private def pipe(events: Seq[ChangeEvent],
      dict: Dictionary = dict1,
      assembly: TxnAssembly.Config = TxnAssembly.Config(),
      opts: Materialize.Options = Materialize.Options()) = {
    implicit val s: SparkSession = spark
    import s.implicits._
    val messages = TxnAssembly.assembleBatch(events.toDS(), assembly)
    Materialize(messages, dict, opts)
  }

  test("f01/f19: insert materializes with schema info and pk tag") {
    val rows = pipe(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins, after = Map("ID" -> "7", "VAL" -> "x")),
      ev(3, Op.Commit)))
      .select("owner", "table_name", "op", "tag").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "OWNER1")
    assert(rows.head.getString(1) == "T1")
    assert(rows.head.getString(2) == "c")
    assert(rows.head.getString(3) == "7") // tag = pk value
  }

  test("f11: events for unselected tables are dropped by the dict join") {
    val rows = pipe(Seq(
      ev(1, Op.Ins, obj = 100L, after = Map("ID" -> "1")),
      ev(2, Op.Ins, obj = 999L, after = Map("ID" -> "2")), // not in dict
      ev(3, Op.Commit)))
    assert(rows.count() == 1)
  }

  test("F5: SYS-owner transactions suppressed unless enabled") {
    val events = Seq(
      ev(1, Op.Ins, obj = 300L, after = Map("OBJ#" -> "1")),
      ev(2, Op.Commit))
    val noSys = Dictionary(dict1.tables, Nil) // select all incl SYS
    assert(pipe(events, noSys).count() == 0)
    assert(pipe(events, noSys,
      opts = Materialize.Options(showSystemTransactions = true)).count() == 1)
  }

  test("f02: CHANGED column format drops unchanged non-key columns on update") {
    val rows = pipe(Seq(
      ev(1, Op.Upd,
        before = Map("ID" -> "7", "VAL" -> "same", "X" -> "old"),
        after = Map("ID" -> "7", "VAL" -> "same", "X" -> "new")),
      ev(2, Op.Commit)))
      .select("before", "after").collect()
    val before = rows.head.getMap[String, String](0)
    val after = rows.head.getMap[String, String](1)
    assert(after == Map("ID" -> "7", "X" -> "new")) // VAL unchanged → dropped
    assert(before == Map("ID" -> "7", "X" -> "old"))
  }

  test("f03: FULL_UPD keeps all columns") {
    val rows = pipe(Seq(
      ev(1, Op.Upd,
        before = Map("ID" -> "7", "VAL" -> "same"),
        after = Map("ID" -> "7", "VAL" -> "same")),
      ev(2, Op.Commit)),
      opts = Materialize.Options(columnFormat = Materialize.FullUpd))
      .select("after").collect()
    assert(rows.head.getMap[String, String](0) == Map("ID" -> "7", "VAL" -> "same"))
  }

  test("f12: per-table condition filters by op and session attrs") {
    val dictCond = Dictionary(Seq(
      dict1.tables.head.copy(conditionExpr = "[op] != 'd' && [client info] == 'x'")),
      Seq(TableSelector("OWNER1", "T1")))
    val events = Seq(
      ev(1, Op.SessionAttr, attrs = Map("client info" -> "x")),
      ev(2, Op.Ins, after = Map("ID" -> "1")),
      ev(3, Op.Del, before = Map("ID" -> "1")),
      ev(4, Op.Commit))
    val out = pipe(events, dictCond).select("op").collect().map(_.getString(0))
    assert(out.toSeq == Seq("c")) // delete filtered out, insert kept
  }

  test("f12b: [op] == 'i' matches inserts (reference op chars, not wire codes)") {
    // Builder.cpp:773/1632 evaluates conditions with 'i' for inserts even
    // though the emitted message op is 'c'
    val dictCond = Dictionary(Seq(
      dict1.tables.head.copy(conditionExpr = "[op] == 'i'")),
      Seq(TableSelector("OWNER1", "T1")))
    val events = Seq(
      ev(1, Op.Ins, after = Map("ID" -> "1")),
      ev(2, Op.Upd, before = Map("ID" -> "1"), after = Map("ID" -> "2")),
      ev(3, Op.Del, before = Map("ID" -> "2")),
      ev(4, Op.Commit))
    val out = pipe(events, dictCond).select("op").collect().map(_.getString(0))
    assert(out.toSeq == Seq("c")) // only the insert passes, as 'i'
  }

  test("F4: hidden/nested columns suppressed unless shown; hidden pk stays") {
    val dictH = Dictionary(Seq(
      DbTable(100L, 100L, "OWNER1", "T1", Seq(
        DbColumn("ID", 2, numPk = 1, hidden = true), // hidden PK: kept
        DbColumn("VAL", 1),
        DbColumn("DIAG", 1, hidden = true),
        DbColumn("NEST", 1, nested = true)), tagType = "pk")),
      Seq(TableSelector("OWNER1", "T1")))
    val events = Seq(
      ev(1, Op.Ins, after =
        Map("ID" -> "7", "VAL" -> "x", "DIAG" -> "d", "NEST" -> "n")),
      ev(2, Op.Commit))
    val out = pipe(events, dictH).select("after").collect()
    assert(out.head.getMap[String, String](0) == Map("ID" -> "7", "VAL" -> "x"))
    val shown = pipe(events, dictH, opts = Materialize.Options(
      showHiddenColumns = true, showNestedColumns = true))
      .select("after").collect()
    assert(shown.head.getMap[String, String](0) ==
      Map("ID" -> "7", "VAL" -> "x", "DIAG" -> "d", "NEST" -> "n"))
  }

  test("guard bitmap resurrects absent columns as explicit NULL entries") {
    // Builder.cpp:1323-1372: c1@seg0, c2@seg1, c3@seg10 (byte 1, so a
    // 1-byte bitmap leaves it untouched — the column2/8 < size bound)
    val gDict = Dictionary(Seq(DbTable(100L, 100L, "OWNER1", "TG",
      Seq(DbColumn("ID", 2, numPk = 1),
        DbColumn("c1", 1, guardSeg = 0),
        DbColumn("c2", 1, guardSeg = 1),
        DbColumn("c3", 1, guardSeg = 10),
        DbColumn("SYS_NC00005$", 23, hidden = true, guard = true)))))
    def after(r: org.apache.spark.sql.Row): Map[String, String] =
      r.getMap[String, String](r.fieldIndex("after")).toMap
    // "03": bits 0+1 → absent c1 and c2 resurrect as null; seg10 out of
    // the 1-byte bound → c3 stays absent; guard col itself stripped
    val r1 = pipe(Seq(
      ev(1, Op.Ins, after = Map("ID" -> "1", "SYS_NC00005$" -> "03")),
      ev(2, Op.Commit)), gDict).collect().head
    assert(after(r1) == Map("ID" -> "1", "c1" -> null, "c2" -> null))
    // present guarded column keeps its value even with its bit set
    val r2 = pipe(Seq(
      ev(1, Op.Ins, after = Map("ID" -> "2", "c1" -> "A",
        "SYS_NC00005$" -> "03")),
      ev(2, Op.Commit)), gDict).collect().head
    assert(after(r2) == Map("ID" -> "2", "c1" -> "A", "c2" -> null))
    // two-byte bitmap "0004": only byte1 bit2 (seg 10) set → c3 only
    val r3 = pipe(Seq(
      ev(1, Op.Ins, after = Map("ID" -> "3", "SYS_NC00005$" -> "0004")),
      ev(2, Op.Commit)), gDict).collect().head
    assert(after(r3) == Map("ID" -> "3", "c3" -> null))
    // no guard value in the image → nothing resurrected
    val r4 = pipe(Seq(
      ev(1, Op.Ins, after = Map("ID" -> "4")),
      ev(2, Op.Commit)), gDict).collect().head
    assert(after(r4) == Map("ID" -> "4"))
    // before image path: delete carrying the guard bitmap
    val r5 = pipe(Seq(
      ev(1, Op.Del, before = Map("ID" -> "5", "SYS_NC00005$" -> "02")),
      ev(2, Op.Commit)), gDict).collect().head
    val b5 = r5.getMap[String, String](r5.fieldIndex("before")).toMap
    assert(b5 == Map("ID" -> "5", "c2" -> null))
  }

  test("UNKNOWN_TYPE: unsupported-type columns hidden, or shown as '?'") {
    // Builder.cpp:605-612: typeCode outside the value dispatch (121 = ADT)
    // → HIDE drops it before the CHANGED diff; SHOW renders '?'
    val dictU = Dictionary(Seq(
      DbTable(100L, 100L, "OWNER1", "T1", Seq(
        DbColumn("ID", 2, numPk = 1),
        DbColumn("VAL", 1),
        DbColumn("ADT", 121)), tagType = "pk")),
      Seq(TableSelector("OWNER1", "T1")))
    val events = Seq(
      ev(1, Op.Ins, after =
        Map("ID" -> "7", "VAL" -> "x", "ADT" -> "blob")),
      // update where ONLY the unknown column changed: with HIDE the diff
      // must not see it → after keeps just the key
      ev(2, Op.Upd, before = Map("ID" -> "7", "VAL" -> "x", "ADT" -> "blob"),
        after = Map("ID" -> "7", "VAL" -> "x", "ADT" -> "blob2")),
      ev(3, Op.Commit))
    val out = pipe(events, dictU).orderBy("scn").select("after").collect()
    assert(out(0).getMap[String, String](0) == Map("ID" -> "7", "VAL" -> "x"))
    assert(out(1).getMap[String, String](0) == Map("ID" -> "7"))
    val shown = pipe(events, dictU,
      opts = Materialize.Options(unknownTypeShow = true))
      .orderBy("scn").select("after").collect()
    assert(shown(0).getMap[String, String](0) ==
      Map("ID" -> "7", "VAL" -> "x", "ADT" -> "?"))
    // the raw values differ → the column survives the CHANGED diff and
    // only then renders as '?' (reference diffs before rendering)
    assert(shown(1).getMap[String, String](0) ==
      Map("ID" -> "7", "ADT" -> "?"))
  }

  test("Materialize options compose: visibility, diff, unknown, tag, hex") {
    // every option at once on one update: the hidden column suppressed,
    // the CHANGED diff keeps key + changed, the unknown-typed column
    // dropped (HIDE), the tag computed from LOGICAL values, and hex
    // rendering applied last (so the tag is not hexed)
    val dictC = Dictionary(Seq(
      DbTable(100L, 100L, "OWNER1", "T1", Seq(
        DbColumn("ID", 2, numPk = 1),
        DbColumn("VAL", 1),
        DbColumn("H", 1, hidden = true),
        DbColumn("ADT", 121)), tagType = "pk")),
      Seq(TableSelector("OWNER1", ".*")))
    val events = Seq(
      ev(1, Op.Upd,
        before = Map("ID" -> "7", "VAL" -> "x", "H" -> "h0", "ADT" -> "b1"),
        after = Map("ID" -> "7", "VAL" -> "y", "H" -> "h1", "ADT" -> "b2")),
      ev(2, Op.Commit))
    val out = pipe(events, dictC, opts = Materialize.Options(
      schemaless = true, charFormatHex = true))
      .select("after", "tag").collect()
    // UTF-8 uppercase hex: "7" → 37, "y" → 79
    assert(out.head.getMap[String, String](0) ==
      Map("ID" -> "37", "VAL" -> "79"))
    assert(out.head.getString(1) == "7") // tag from pre-hex logical value
  }

  test("guard + experimental + visibility + hex compose in builder order") {
    // a guarded column resurrected to NULL, a JSON column dropped (flag
    // off), an XMLTYPE hexed (flag off), the guard column stripped as
    // hidden, then char-hex rendering over what remains — NULL stays NULL
    // (the resurrected entry has no bytes to hex, like the reference's
    // size-0 sentinel)
    val gDict = Dictionary(Seq(DbTable(100L, 100L, "OWNER1", "TG", Seq(
      DbColumn("ID", 2, numPk = 1),
      DbColumn("g1", 1, guardSeg = 0),
      DbColumn("J", 119),
      DbColumn("X", 113, xmlType = true),
      DbColumn("SYS_NC0$", 23, hidden = true, guard = true)))))
    val out = pipe(Seq(
      ev(1, Op.Ins, after = Map("ID" -> "7", "J" -> "{}", "X" -> "<a/>",
        "SYS_NC0$" -> "01")),
      ev(2, Op.Commit)), gDict,
      opts = Materialize.Options(charFormatHex = true))
      .select("after").collect().head.getMap[String, String](0).toMap
    // ID "7"→hex 37; g1 resurrected null; J dropped; X "<a/>" hexed by the
    // experimental step, then char-hex hexes the hex string again (the
    // reference writes the raw-hex bytes through the same hex renderer)
    assert(out == Map("ID" -> "37", "g1" -> null,
      "X" -> "3C612F3E".flatMap(c => f"${c.toInt}%02X")))
  }

  test("f15: schema evolution — scn-versioned dictionary join") {
    val evolved = dict1.evolve(
      DbTable(100L, 100L, "OWNER1", "T1_RENAMED",
        Seq(DbColumn("ID", 2, numPk = 1), DbColumn("VAL", 1), DbColumn("NEW", 1))),
      scn = 10L)
    val rows = pipe(Seq(
      ev(2, Op.Ins, after = Map("ID" -> "1")),
      ev(3, Op.Commit),
      ev(12, Op.Ins, after = Map("ID" -> "2")),
      ev(13, Op.Commit)), evolved)
      .select("scn", "table_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((2L, "T1"), (12L, "T1_RENAMED")))
  }

  test("f21: schemaless mode passes unknown obj through") {
    val events = Seq(
      ev(1, Op.Ins, obj = 100L, after = Map("ID" -> "1")),
      ev(2, Op.Ins, obj = 999L, after = Map("COL_0" -> "raw")), // unknown
      ev(3, Op.Commit))
    assert(pipe(events).count() == 1) // strict mode drops the unknown obj
    val rows = pipe(events, opts = Materialize.Options(schemaless = true))
    assert(rows.count() == 2)
    assert(rows.filter(col("owner").isNull).count() == 1)
  }

  test("envelope: golden JSON with fixed field order, nulls omitted") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val messages = TxnAssembly.assembleBatch(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins, after = Map("ID" -> "7")),
      ev(3, Op.Commit)).toDS())
    val enriched = Materialize(messages, dict1)
    val json = Envelope.toMessages(enriched)
      .select("value").collect().head.getString(0)
    val expected =
      """{"c_scn":3,"c_idx":0,"scn":2,"seq":1,"xid":"9.0.1",""" +
        """"op":"c","schema":{"owner":"OWNER1","table":"T1","obj":100},""" +
        """"rid":"AAAABkAAAAAAAAAAAA","after":{"ID":"7"}}"""
    assert(json == expected)
  }

  test("chkpt message appended at max batch position; empty batch emits none") {
    implicit val s: SparkSession = spark
    import s.implicits._
    def sink(events: Seq[ChangeEvent]) =
      Envelope.withCheckpointMessage(
        Envelope.forSink(Envelope.toMessages(
          Materialize(TxnAssembly.assembleBatch(events.toDS()), dict1))))
    val rows = sink(Seq(
      ev(1, Op.Begin),
      ev(2, Op.Ins, after = Map("ID" -> "1")),
      ev(3, Op.Commit))).orderBy("c_scn", "c_idx").collect()
    assert(rows.length == 2)
    val chk = rows.last
    assert(chk.getAs[String]("value") == """{"scn":3,"op":"chkpt"}""")
    assert(chk.getAs[Long]("c_scn") == 3L)
    // DML-free batch: no position to report, no chkpt
    assert(sink(Seq(ev(1, Op.Begin), ev(2, Op.Rollback))).count() == 0)
  }

  test("idempotent restart position: (c_scn, c_idx) unique per message") {
    val out = pipe(Seq(
      ev(1, Op.Ins, after = Map("ID" -> "1")),
      ev(2, Op.Ins, after = Map("ID" -> "2")),
      ev(3, Op.Ins, obj = 200L, after = Map("ID" -> "3")),
      ev(4, Op.Commit)))
    val positions = out.select("cScn", "cIdx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(positions.distinct.length == positions.length)
  }
}
