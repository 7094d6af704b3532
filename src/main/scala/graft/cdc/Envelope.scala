package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output envelope (SURVEY.md §1.4): one JSON message per change, field
  * order fixed like the reference's builder (BuilderJson.h:232-360 appends
  * header fields in a deterministic sequence, which is what makes golden-
  * file comparison possible). `to_json` keeps struct field order and drops
  * null fields — matching the reference's omit-absent-sections behavior.
  */
object Envelope {

  /** Envelope format knobs (a pragmatic subset of Format.h). The scn/tm
    * variant fields follow BuilderJson.h:232-289: b_scn/e_scn are the
    * transaction's begin/commit scn (SCN_TYPE::BEGIN/COMMIT — together
    * with tm the Debezium-style header), "scns" is the 0x-prefixed
    * 16-digit lowercase hex form (SCN_FORMAT::TEXT_HEX), and "tm" is the
    * commit wall clock in unix nanos (TIMESTAMP_TYPE commit value; the
    * feed supplies it via ChangeMessage.tm — 0 = no clock, omitted). */
  case class Format(
      dbName: String = "", // "db" header field
      emitCheckpoint: Boolean = false, // trailing "chkpt" message per batch
      scnTypeBegin: Boolean = false, // "b_scn" per message
      scnTypeCommit: Boolean = false, // "e_scn" per message
      scnFormatHex: Boolean = false, // "scns":"0x…" replaces "scn"
      timestampCommit: Boolean = false, // "tm" commit nanos per message
      // MESSAGE_FORMAT::SKIP_BEGIN/SKIP_COMMIT (Format.h:76-84): drop the
      // bracket messages from an emitBeginCommit-ed stream
      skipBegin: Boolean = false,
      skipCommit: Boolean = false,
      // SCHEMA_FORMAT::FULL (BuilderJson.h:411-530): typed column
      // descriptors in the schema section, on every message. (The
      // reference's non-REPEATED dedup — emit columns once per table —
      // is inherently a sequential sink-side pass; a parallel engine
      // renders per-message and lets the sink dedup.)
      schemaFormatFull: Boolean = false,
      // ATTRIBUTES_FORMAT bits (Format.h:28-33): which message kinds
      // render the session-attribute map. Default all-on (the engine's
      // established envelope); the reference's all-bits-off default is
      // Format(attributesBegin=false, attributesDml=false,
      // attributesCommit=false).
      attributesBegin: Boolean = true,
      attributesDml: Boolean = true,
      attributesCommit: Boolean = true,
      // RID_FORMAT::SKIP (Format.h:86-89): drop the rowid from payloads
      ridSkip: Boolean = false,
      // SCHEMA_FORMAT::OBJ bit: obj# in the schema section (on by
      // default here — the established goldens carry it)
      schemaObj: Boolean = true,
      // USER_TYPE bits (Format.h:127-134): which message kinds render the
      // "usr" header = the transaction's login-username session attribute
      // (BuilderJson.h:336-345; BuilderJson.cpp passes isUserTypeBegin/
      // Dml/Commit/Ddl per call site)
      userBegin: Boolean = false,
      userDml: Boolean = false,
      userCommit: Boolean = false,
      userDdl: Boolean = false,
      // REDO_THREAD_FORMAT::TEXT: "rth" header (BuilderJson.h:346-350)
      redoThread: Boolean = false,
      // MESSAGE_FORMAT::ADD_OFFSET: redo file offset on DML payloads
      // (BuilderJson.cpp:526-531; bracket messages carry none)
      addOffset: Boolean = false,
      // MESSAGE_FORMAT::ADD_SEQUENCES: "num" per-txn payload ordinal on
      // DML payloads, just before the rowid (BuilderJson.h:89-92 — only
      // appendRowid renders it, so brackets and DDL carry none)
      addSequences: Boolean = false,
      // DB_FORMAT bits (Format.h:35-40): "db" on begin/commit/DML headers
      // (ADD_DML) and on DDL headers (ADD_DDL). Default both-on = the
      // engine's established always-render envelope; the reference's
      // default is both-off.
      dbAddDml: Boolean = true,
      dbAddDdl: Boolean = true) {
    def userAny: Boolean = userBegin || userDml || userCommit || userDdl
  }

  /** The `"format":{"type":"debezium"}` preset (OpenLogReplicator.cpp:
    * 694-708): b_scn/e_scn + scn on every message (SCN_TYPE::DEBEZIUM),
    * tm on every message, db on every kind (DB_FORMAT::ALL), full schema
    * descriptors, "num" sequences (MESSAGE_FORMAT::ADD_SEQUENCES), "rth",
    * text rid, usr on all kinds (USER_TYPE::DEBEZIUM); attributes stay at
    * the reference default (off). The preset's codec-side choices —
    * XID_FORMAT::TEXT_REVERSED, INTERVAL ISO-comma / YM-dash,
    * COLUMN_FORMAT::FULL_UPD — live where those decisions are made:
    * `OracleCodecs.xidFormatReversed`/`interval*String` at feed
    * adaptation and `Materialize.Options(columnFormat = FullUpd)`.
    * SCHEMA_FORMAT::REPEATED dedup stays the documented sink-side
    * non-goal. */
  def debezium(db: String): Format = Format(
    dbName = db,
    scnTypeBegin = true, scnTypeCommit = true,
    timestampCommit = true,
    schemaFormatFull = true,
    attributesBegin = false, attributesDml = false, attributesCommit = false,
    userBegin = true, userDml = true, userCommit = true, userDdl = true,
    redoThread = true,
    addSequences = true)

  /** enriched rows → (key, value) output frame.
    * value = ordered-JSON envelope; key = tag (nullable). */
  def toMessages(enriched: DataFrame, fmt: Format = Format()): DataFrame = {
    val schemaFields =
      Seq(col("owner"), col("table_name").as("table")) ++
        (if (fmt.schemaObj) Seq(col("obj")) else Nil) ++
        (if (fmt.schemaFormatFull) Seq(col("schema_cols").as("columns"))
         else Nil)
    val schemaStruct = struct(schemaFields: _*)
    // DML ops = everything that renders a rowid section (appendRowid —
    // brackets, checkpoints and DDL never reach it)
    val isDml = col("op") =!= MsgOp.Begin && col("op") =!= MsgOp.Commit &&
      col("op") =!= MsgOp.Ddl && col("op") =!= MsgOp.Checkpoint
    val payloadCols = Seq[(String, Column)]("op" -> col("op")) ++
      (if (fmt.addOffset) // offset leads the payload, on DML ops only —
        // BuilderJson.cpp:527/567/608 render it in insert/update/delete;
        // processDdl and the brackets never do
        Seq("offset" -> when(isDml && col("offset") >= 0L, col("offset")))
       else Nil) ++
      Seq[(String, Column)](
      "schema" -> when(col("owner").isNotNull, schemaStruct)) ++
      (if (fmt.addSequences) // "num" sits just before the rid
        Seq("num" -> when(isDml, col("num"))) else Nil) ++
      (if (fmt.ridSkip) Nil else Seq[(String, Column)]("rid" -> col("rid"))) ++
      Seq[(String, Column)](
      "before" -> col("before"),
      "after" -> col("after"),
      "ddl" -> col("ddlText"))

    // SCN_FORMAT::TEXT_HEX renders every scn header as "<key>s":"0x…"
    // 16-digit lowercase hex (BuilderJson.h:239-276 — scn→scns,
    // b_scn→b_scns, e_scn→e_scns)
    def scnHex(c: Column): Column =
      concat(lit("0x"), lpad(lower(hex(c)), 16, "0"))
    val scnCol: (String, Column) =
      if (fmt.scnFormatHex) "scns" -> scnHex(col("scn"))
      else "scn" -> col("scn")
    val bScnCol: (String, Column) = // unknown begin (-1) omitted
      if (fmt.scnFormatHex)
        "b_scns" -> when(col("bScn") >= 0L, scnHex(col("bScn")))
      else "b_scn" -> when(col("bScn") >= 0L, col("bScn"))
    val eScnCol: (String, Column) =
      if (fmt.scnFormatHex) "e_scns" -> scnHex(col("cScn"))
      else "e_scn" -> col("cScn")
    // db renders per message kind (DB_FORMAT bits: DDL gated by ADD_DDL,
    // everything else — begin/commit/DML — by ADD_DML, BuilderJson.cpp:
    // 462-634 appendHeader showDb call sites)
    val dbCol: Seq[(String, Column)] =
      if (fmt.dbName.isEmpty || (!fmt.dbAddDml && !fmt.dbAddDdl)) Nil
      else if (fmt.dbAddDml && fmt.dbAddDdl) Seq("db" -> lit(fmt.dbName))
      else Seq("db" -> when(
        if (fmt.dbAddDdl) col("op") === MsgOp.Ddl else col("op") =!= MsgOp.Ddl,
        lit(fmt.dbName)))
    val headerCols = Seq[(String, Column)](
      "c_scn" -> col("cScn"),
      "c_idx" -> col("cIdx"),
      scnCol) ++
      (if (fmt.scnTypeBegin) Seq(bScnCol) else Nil) ++
      (if (fmt.scnTypeCommit) Seq(eScnCol) else Nil) ++
      (if (fmt.timestampCommit) // 0 = feed has no clock → omitted
        Seq("tm" -> when(col("tm") > 0L, col("tm"))) else Nil) ++
      Seq[(String, Column)](
      "seq" -> col("seq"),
      "xid" -> col("xid")) ++
      dbCol ++
      (if (fmt.userAny) { // header order: db, usr, rth (BuilderJson.h:329-350)
        val kindOk =
          (if (fmt.userBegin) col("op") === MsgOp.Begin else lit(false)) ||
          (if (fmt.userCommit) col("op") === MsgOp.Commit else lit(false)) ||
          (if (fmt.userDdl) col("op") === MsgOp.Ddl else lit(false)) ||
          (if (fmt.userDml)
            col("op") =!= MsgOp.Begin && col("op") =!= MsgOp.Commit &&
              col("op") =!= MsgOp.Ddl
           else lit(false))
        Seq("usr" -> when(kindOk, element_at(col("attrs"), "login username")))
      } else Nil) ++
      (if (fmt.redoThread) Seq[(String, Column)]("rth" -> col("thread"))
       else Nil) ++
      Seq("attributes" -> {
        val kindOk =
          (if (fmt.attributesBegin) col("op") === MsgOp.Begin
           else lit(false)) ||
          (if (fmt.attributesCommit) col("op") === MsgOp.Commit
           else lit(false)) ||
          (if (fmt.attributesDml)
            col("op") =!= MsgOp.Begin && col("op") =!= MsgOp.Commit
           else lit(false))
        when(kindOk && col("attrs").isNotNull && size(col("attrs")) > 0,
          col("attrs"))
      })

    val all = headerCols ++ payloadCols
    val src =
      if (fmt.skipBegin || fmt.skipCommit)
        enriched.filter(
          (if (fmt.skipBegin) col("op") =!= MsgOp.Begin else lit(true)) &&
            (if (fmt.skipCommit) col("op") =!= MsgOp.Commit else lit(true)))
      else enriched
    src.withColumn("value",
        to_json(struct(all.map { case (n, c) => c.as(n) }: _*)))
      .withColumn("key", col("tag"))
  }

  /** MESSAGE_FORMAT::FULL (BuilderJson.cpp:460-548): ONE message per
    * transaction — the header carries the begin record's scn and the
    * commit position, "payload" is the array of the transaction's DML
    * payload objects in commit order. One exchange on (cScn, xid); the
    * collected payload list is bounded by transaction size — the same
    * memory envelope the reference accepts by buffering the whole txn in
    * FULL mode. */
  def toTxnMessages(enriched: DataFrame): DataFrame = {
    val payload = struct(
      col("op"),
      when(col("owner").isNotNull,
        struct(col("owner"), col("table_name").as("table"), col("obj")))
        .as("schema"),
      col("rid"),
      col("before"),
      col("after"),
      col("ddlText").as("ddl"))
    enriched
      .filter(col("op") =!= MsgOp.Begin && col("op") =!= MsgOp.Commit)
      .groupBy(col("cScn"), col("xid"))
      .agg(
        min(col("seq")).as("seq"),
        min(when(col("bScn") >= 0L, col("bScn"))).as("bScnAgg"),
        min(col("scn")).as("minScn"),
        // array_sort + comparator: sort_array can't order structs that
        // contain maps; commit order is cIdx alone
        array_sort(
          collect_list(struct(col("cIdx"), payload.as("p"))),
          (l, r) => when(l("cIdx") < r("cIdx"), -1)
            .when(l("cIdx") > r("cIdx"), 1).otherwise(0))
          .as("ps"))
      .select(
        col("cScn"),
        lit(0L).as("cIdx"),
        to_json(struct(
          col("cScn").as("c_scn"),
          lit(0L).as("c_idx"),
          // begin scn when the assembler recorded one, else first DML scn
          coalesce(col("bScnAgg"), col("minScn")).as("scn"),
          col("seq"),
          col("xid"),
          col("ps")("p").as("payload"))).as("value"),
        lit(null).cast("string").as("key"))
  }

  /** Output table schema for sinks: (key, value) + restart position. */
  def forSink(messages: DataFrame): DataFrame =
    messages.select(col("key"), col("value"), col("cScn").as("c_scn"),
      col("cIdx").as("c_idx"))

  /** Append the reference's `chkpt` message at the max position of the
    * batch (≙ per-LWN checkpoint emission, Parser.cpp:1509-1536): clients
    * advance their restart position even across DML-free stretches. The
    * message optionally carries the log position the reference reports —
    * `seq`/`offset` of the processed log and the `redo` flag
    * (BuilderJson.cpp:675-686; these are stream-position metadata the
    * pipeline knows, not per-row data). Empty batch → no checkpoint (no
    * position to report). cIdx = Long.MaxValue sorts it after every data
    * message of the same scn. */
  def withCheckpointMessage(sink: DataFrame, seq: Option[Long] = None,
      offset: Option[Long] = None, redo: Boolean = false): DataFrame = {
    val fields = Seq(col("scn"), lit(MsgOp.Checkpoint).as("op")) ++
      seq.map(v => lit(v).as("seq")).toSeq ++
      offset.map(v => lit(v).as("offset")).toSeq ++
      (if (redo) Seq(lit(true).as("redo")) else Nil)
    val chk = sink.agg(max(col("c_scn")).as("scn"))
      .filter(col("scn").isNotNull)
      .select(
        lit(null).cast("string").as("key"),
        to_json(struct(fields: _*)).as("value"),
        col("scn").as("c_scn"),
        lit(Long.MaxValue).as("c_idx"))
    sink.unionByName(chk)
  }
}
