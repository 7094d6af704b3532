package graft.cdc

import org.apache.spark.sql.types._

/** Decoded redo operation — the post-parser, pre-assembly IR (FIXTURES.md §A;
  * semantic mirror of the reference's paired RedoLogRecord, not its bytes).
  *
  * `scn/subScn/seq/offset` carry the total order the reference establishes
  * with its in-LWN heap sort (`src/parser/Parser.h:46-60`); `xid` keys the
  * stateful assembly; `op` is the semantic opcode (§2.2 opcode table).
  */
case class ChangeEvent(
    scn: Long,
    subScn: Int,
    seq: Long,
    offset: Long,
    thread: Int,
    xid: String,
    op: String,
    obj: Long,
    bdba: Long,
    slot: Int,
    fb: String,
    before: Map[String, String],
    after: Map[String, String],
    suppBefore: Map[String, String],
    suppAfter: Map[String, String],
    attrs: Map[String, String],
    ddlText: String,
    // wall-clock nanos of the redo record (the reference's per-record
    // Time, RedoLogRecord timestamp); 0 = feed carries no clock
    tm: Long = 0L) {

  /** Approximate buffered size of this op in bytes — the accounting unit
    * for the `transaction-max-mb` drop rule (the reference sums
    * `redoLogRecord->size + ROW_HEADER_TOTAL` per buffered record,
    * Parser.cpp:611-620; this engine buffers the decoded form, so the
    * analogue is decoded payload chars + a fixed per-op header). */
  def approxSize: Int = {
    def m(x: Map[String, String]): Int =
      if (x == null) 0
      else x.iterator.map { case (k, v) =>
        k.length + (if (v == null) 0 else v.length) + 8
      }.sum
    64 + xid.length + op.length +
      (if (fb == null) 0 else fb.length) +
      (if (ddlText == null) 0 else ddlText.length) +
      m(before) + m(after) + m(suppBefore) + m(suppAfter) + m(attrs)
  }
}

object ChangeEvent {
  /** Construct a minimal DML/control event (fixture helper). */
  def apply(scn: Long, xid: String, op: String): ChangeEvent =
    ChangeEvent(scn, 0, 1L, scn, 1, xid, op, 0L, 0L, 0, "",
      Map.empty, Map.empty, Map.empty, Map.empty, Map.empty, null, 0L)

  val schema: StructType = StructType(Seq(
    StructField("scn", LongType, nullable = false),
    StructField("subScn", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("thread", IntegerType, nullable = false),
    StructField("xid", StringType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("obj", LongType, nullable = false),
    StructField("bdba", LongType, nullable = false),
    StructField("slot", IntegerType, nullable = false),
    StructField("fb", StringType, nullable = true),
    StructField("before", MapType(StringType, StringType), nullable = true),
    StructField("after", MapType(StringType, StringType), nullable = true),
    StructField("suppBefore", MapType(StringType, StringType), nullable = true),
    StructField("suppAfter", MapType(StringType, StringType), nullable = true),
    StructField("attrs", MapType(StringType, StringType), nullable = true),
    StructField("ddlText", StringType, nullable = true),
    StructField("tm", LongType, nullable = false)))
}

/** Semantic opcodes (≙ reference redo opcodes, §2.2 of SURVEY.md). */
object Op {
  val Begin = "BEGIN" //  5.2
  val Commit = "COMMIT" //  5.4
  val Rollback = "ROLLBACK" //  5.4 with rollback flag
  val PartialRollback = "PARTIAL_ROLLBACK" //  5.6 / 5.11
  val SessionAttr = "SESSION_ATTR" //  5.19 / 5.20
  val Ins = "INS" // 11.2
  val Del = "DEL" // 11.3
  val Upd = "UPD" // 11.5 / 11.6
  val InsMulti = "INS_MULTI" // 11.11
  val DelMulti = "DEL_MULTI" // 11.12
  val Ddl = "DDL" // 24.1
  val LobData = "LOB_DATA" // 19.1 / 26.2 / 26.6 LOB page write
  val dml: Set[String] = Set(Ins, Del, Upd, InsMulti, DelMulti)
}

/** Committed change message — the engine's output row (§1.4 envelope).
  * `op` uses the reference's wire codes: begin|commit|c|u|d|ddl|chkpt.
  * (cScn, cIdx) is the idempotent-restart position.
  */
case class ChangeMessage(
    cScn: Long,
    cIdx: Long,
    scn: Long,
    seq: Long,
    xid: String,
    op: String,
    obj: Long,
    rid: String,
    before: Map[String, String],
    after: Map[String, String],
    attrs: Map[String, String],
    ddlText: String,
    // begin scn of the owning transaction (SCN_TYPE::BEGIN "b_scn";
    // -1 = unknown) and commit wall-clock nanos (TIMESTAMP_TYPE commit
    // "tm"; 0 = feed carries no clock) — BuilderJson.h:256-289
    bScn: Long = -1L,
    tm: Long = 0L,
    // redo thread# ("rth", REDO_THREAD_FORMAT::TEXT, BuilderJson.h:346-350)
    // and the op's redo file offset ("offset", MESSAGE_FORMAT::ADD_OFFSET,
    // BuilderJson.cpp:526-531; -1 = none, e.g. bracket messages)
    thread: Int = 1,
    offset: Long = -1L,
    // per-txn payload ordinal ("num", MESSAGE_FORMAT::ADD_SEQUENCES,
    // BuilderJson.h:89-92): reset at begin, incremented per DML/DDL,
    // rendered on DML payloads only (brackets never call appendRowid)
    num: Long = 0L)

object MsgOp {
  val Begin = "begin"
  val Commit = "commit"
  val Insert = "c"
  val Update = "u"
  val Delete = "d"
  val Ddl = "ddl"
  val Checkpoint = "chkpt"
}
