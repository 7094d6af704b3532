package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.core.{OracleCodecs, Tables}

/** Output-format surface of the reference (SURVEY.md §1.4 + §2.7): the
  * Format.h rendering variants — XID text forms, TIMESTAMP_FORMAT unix/ISO
  * families, INTERVAL_DTS/YTM string forms — plus the DDL (opcode 24.1)
  * and per-batch checkpoint (`chkpt`) message paths, each gated against a
  * DuckDB oracle that re-derives the rendering arithmetically.
  *
  * All renderings are either codegen'd built-ins (`div`/`%`/`date_format`)
  * or the pure codec functions of [[graft.core.OracleCodecs]] exposed as
  * UDFs — per-row scalar work with no shuffle, so the plans are a single
  * scan→project at any scale.
  */
object FormatOps {
  type Q = (SparkSession, String) => DataFrame

  /** q68 breadth subset: every 10th entry of the key-sorted full reference
    * timeZoneMap (60 of its 595 zones) — deterministic and resource-derived,
    * so the Spark-side region-key bytes and the DuckDB-oracle zone names
    * stay in lockstep by construction. */
  private[graft] lazy val tzBreadth: Seq[(Int, String)] =
    OracleCodecs.timeZoneMap.toSeq.sortBy(_._1).grouped(10).map(_.head).toSeq
  private[graft] lazy val tzBreadthKeys: Seq[Int] = tzBreadth.map(_._1)

  /** selectExpr fragments rendering a nanos-long column `n` into ALL 16
    * TIMESTAMP_FORMAT variants (Format.h:136-153, rendering
    * BuilderJson.cpp:105-280). Unix family: round-half-up on the
    * magnitude, sign carried separately (BuilderJson renders `-` apart
    * from the digit run); the _STRING variants are the same digits
    * quoted. ISO family: fraction rounds half-up at the target precision
    * and CARRIES into the seconds (BuilderJson.cpp:194-216), `T...Z` for
    * the _TZ variants, space-separated plain otherwise; built from pure
    * integer arithmetic + a DATE days-since-epoch cast — independent of
    * spark.sql.session.timeZone; assumes n >= 0 (redo wall clocks).
    * Shared by q64 (micro-truncated for the oracle engine) and
    * FormatOpsSpec (full-nano synthetic pinning). */
  private[graft] val tsRenderExprs: Seq[String] = {
    // ISO rendering of an epoch-SECONDS expression (already carried)
    def iso(s: String, sep: Char) =
      s"concat(CAST(date_add(DATE'1970-01-01', CAST(($s) div 86400 AS INT))" +
        s" AS STRING), '$sep', " +
        s"lpad(CAST((($s) div 3600) % 24 AS STRING), 2, '0'), ':', " +
        s"lpad(CAST((($s) div 60) % 60 AS STRING), 2, '0'), ':', " +
        s"lpad(CAST(($s) % 60 AS STRING), 2, '0'))"
    def frac(total: String, mod: Long, digits: Int) =
      s"lpad(CAST(($total) % $mod AS STRING), $digits, '0')"
    val sgn = "CASE WHEN n < 0 THEN -1 ELSE 1 END"
    val uMicro = s"$sgn * ((abs(n) + 500) div 1000)"
    val uMilli = s"$sgn * ((abs(n) + 500000) div 1000000)"
    val uSec = s"$sgn * ((abs(n) + 500000000) div 1000000000)"
    val tMicro = "((n + 500) div 1000)"          // total micros, carried
    val tMilli = "((n + 500000) div 1000000)"    // total millis, carried
    val tSec = "((n + 500000000) div 1000000000)" // rounded seconds
    Seq(
      s"n AS unix_nano",
      s"$uMicro AS unix_micro",
      s"$uMilli AS unix_milli",
      s"$uSec AS unix_sec",
      s"CAST(n AS STRING) AS unix_nano_str",
      s"CAST($uMicro AS STRING) AS unix_micro_str",
      s"CAST($uMilli AS STRING) AS unix_milli_str",
      s"CAST($uSec AS STRING) AS unix_sec_str",
      s"concat(${iso("n div 1000000000", 'T')}, '.', " +
        s"${frac("n", 1000000000L, 9)}, 'Z') AS iso_nano_tz",
      s"concat(${iso(s"$tMicro div 1000000", 'T')}, '.', " +
        s"${frac(tMicro, 1000000L, 6)}, 'Z') AS iso_micro_tz",
      s"concat(${iso(s"$tMilli div 1000", 'T')}, '.', " +
        s"${frac(tMilli, 1000L, 3)}, 'Z') AS iso_milli_tz",
      s"concat(${iso(tSec, 'T')}, 'Z') AS iso_tz",
      s"concat(${iso("n div 1000000000", ' ')}, '.', " +
        s"${frac("n", 1000000000L, 9)}) AS iso_nano",
      s"concat(${iso(s"$tMicro div 1000000", ' ')}, '.', " +
        s"${frac(tMicro, 1000000L, 6)}) AS iso_micro",
      s"concat(${iso(s"$tMilli div 1000", ' ')}, '.', " +
        s"${frac(tMilli, 1000L, 3)}) AS iso_milli",
      s"${iso(tSec, ' ')} AS iso_sec")
  }

  /** events → ChangeEvent feed with a per-event op + optional ddlText. */
  private def feed(s: SparkSession, dir: String, opExpr: String,
      ddlExpr: String = "CAST(NULL AS STRING)") = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .selectExpr(
        "event_id AS scn", "0 AS subScn", "1L AS seq", "event_id AS offset",
        "1 AS thread", "CAST(user_id AS STRING) AS xid", opExpr + " AS op",
        "0L AS obj", "0L AS bdba", "0 AS slot", "'' AS fb",
        "CAST(NULL AS MAP<STRING,STRING>) AS before",
        "map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING)) AS after",
        "CAST(NULL AS MAP<STRING,STRING>) AS suppBefore",
        "CAST(NULL AS MAP<STRING,STRING>) AS suppAfter",
        "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
        ddlExpr + " AS ddlText",
        "0L AS tm")
      .as[ChangeEvent]
  }

  val defs: Map[String, Q] = Map(
    // Opcode 24.1 DDL through the REAL assembler: DDL ops buffer in the
    // transaction like DML and flush at commit as op="ddl" messages with
    // the statement text attached (Parser.cpp:578-623 appendToTransaction-
    // Ddl → Transaction::flush → BuilderJson ddl payload).
    "q62_ddl_messages" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val f = feed(s, dir,
        "CASE WHEN event_type = 'error' THEN 'DDL' ELSE 'INS' END",
        "CASE WHEN event_type = 'error' THEN concat('ALTER TABLE T', " +
          "CAST(user_id AS STRING), ' /* ', props, ' */') " +
          "ELSE CAST(NULL AS STRING) END")
      TxnAssembly.assembleBatch(f, TxnAssembly.Config(commitAtEnd = true))
        .toDF()
        .filter(col("op") === MsgOp.Ddl)
        .select(col("scn"), col("xid").cast("long").as("user_id"),
          col("op"), col("ddlText").as("ddl_text"))
    }),

    // DDL-op classification counters (Metrics.h:68-73 emitDdlOps*): the
    // q62 DDL path feeds Metrics.ddlCounters — leading-keyword buckets
    // alter/create/drop/truncate/purge with FLASHBACK falling to `other`.
    // One short-key aggregation; the gate pins counts per bucket.
    "q100_ddl_counters" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val verbs = "array('ALTER TABLE T', 'CREATE INDEX I', 'DROP TABLE T'," +
        " 'TRUNCATE TABLE T', 'PURGE RECYCLEBIN -- ', 'FLASHBACK TABLE T')"
      val f = feed(s, dir,
        "CASE WHEN event_type = 'error' THEN 'DDL' ELSE 'INS' END",
        "CASE WHEN event_type = 'error' THEN concat(" +
          s"element_at($verbs, CAST(user_id % 6 AS INT) + 1), " +
          "CAST(user_id AS STRING)) ELSE CAST(NULL AS STRING) END")
      val ddl = TxnAssembly.assembleBatch(f,
          TxnAssembly.Config(commitAtEnd = true))
        .toDF()
        .filter(col("op") === MsgOp.Ddl)
        .withColumnRenamed("ddlText", "ddl_text")
      graft.streaming.Metrics.ddlCounters(ddl)
        .select(col("ddl_kind"), col("n_ops").cast("long"))
    }),

    // Per-batch `chkpt` message (Parser.cpp:1509-1536 per-LWN checkpoint →
    // Envelope.withCheckpointMessage): clients advance their restart
    // position even across DML-free stretches. The gate checks the
    // envelope text and position of the checkpoint row plus the data-row
    // count it rides with.
    "q63_checkpoint_msg" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val msgs = TxnAssembly.assembleBatch(
        feed(s, dir, "'INS'"), TxnAssembly.Config(commitAtEnd = true)).toDF()
      val sink = msgs.select(col("xid").as("key"),
        to_json(struct(col("scn"), col("op"))).as("value"),
        col("cScn").as("c_scn"), col("cIdx").as("c_idx"))
      Envelope.withCheckpointMessage(sink, seq = Some(1L),
          offset = Some(8192L), redo = true)
        .agg(
          count(lit(1)).as("n_total"),
          max(when(col("c_idx") === Long.MaxValue, col("value")))
            .as("chkpt_value"),
          max(when(col("c_idx") === Long.MaxValue, col("c_scn")))
            .as("chkpt_scn"))
    }),

    // TIMESTAMP_FORMAT variants (Format.h:136-153): the unix family is
    // integer arithmetic on the event-time nanos — round-half-up on the
    // MAGNITUDE with the sign carried separately, exactly as the reference
    // renders (BuilderJson.h timestamp paths carry `-` apart from digits).
    // The ISO-8601 family is derived from pure integer arithmetic + a
    // DATE (days-since-epoch) cast, so the rendering is independent of
    // spark.sql.session.timeZone — a driver-provided non-UTC session
    // produces identical strings. The ISO family's `div`/`%` split
    // assumes ts >= 0 (true of the corpus event times; pre-1970 wall
    // clocks are out of scope for the redo stream).
    // events.ts is TIMESTAMP(NANOS) parquet — Spark reads the raw nanos
    // long; the DuckDB oracle engine truncates parquet NANOS to micros at
    // scan, so the GATE pins the micro-truncated rendering (`n` below) on
    // both sides; FormatOpsSpec pins the full-nano fraction on synthetic
    // values the oracle engine can't represent.
    "q64_ts_formats" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .selectExpr("event_id", "(ts div 1000) * 1000 AS n")
        .selectExpr("event_id" +: tsRenderExprs: _*)),

    // XID_FORMAT variants (Format.h:195-200, BuilderJson.h:297-326): hex
    // 0xUSN.SLT.SQN (widths 4/3/8), decimal, packed-numeric, and the
    // little-endian reversed hex dump.
    "q65_xid_formats" -> ((s, dir) => {
      val hexU = udf((x: Long) => OracleCodecs.xidFormat(x))
      val decU = udf((x: Long) => OracleCodecs.xidFormatDec(x))
      val revU = udf((x: Long) => OracleCodecs.xidFormatReversed(x))
      Tables.load(s, dir, "events")
        .selectExpr("event_id",
          "(user_id % 100) * 281474976710656 + (event_id % 10) * 4294967296 " +
            "+ event_id AS xid")
        .select(col("event_id"),
          hexU(col("xid")).as("xid_hex"),
          decU(col("xid")).as("xid_dec"),
          col("xid").as("xidn"),
          revU(col("xid")).as("xid_rev"))
    }),

    // INTERVAL_DTS_FORMAT / INTERVAL_YTM_FORMAT variants (Format.h:54-74):
    // ISO-ish day-to-second string, round-half-up unix micros, months int,
    // Y-M string. Interval values synthesized deterministically from
    // event_id (±5 days, ±41 years) so both engines compute from the same
    // exact integers.
    // CHAR_FORMAT::HEX + UNKNOWN_FORMAT::DUMP (Format.h:42-46,177-185):
    // string images through the REAL Materialize path with hex rendering
    // on (uppercase UTF-8-byte hex, Builder.h:1129-1184), plus the
    // unknown-value surface — payload renders "?" and the diagnostic
    // line dumps size + space-prefixed lowercase hex (Builder.h:395-405).
    "q69_hex_formats" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(0L, 0L, "APP", "T",
        Seq(DbColumn("value", 1), DbColumn("etype", 2)))))
      val messages = Tables.load(s, dir, "events").selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid", "'c' AS op", "0L AS obj",
          "'' AS rid", "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING), " +
            "'etype', event_type) AS after",
          "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "-1L AS bScn", "0L AS tm",
          "1 AS thread", "-1L AS offset", "0L AS num")
        .as[ChangeMessage]
      val dumpU = udf((n: String, b: Array[Byte]) =>
        OracleCodecs.unknownDump(n, b))
      Materialize(messages, dict, Materialize.Options(charFormatHex = true))
        .select(col("cScn").as("event_id"),
          element_at(col("after"), "value").as("value_hex"),
          element_at(col("after"), "etype").as("etype_hex"),
          lit("?").as("unk_value"),
          dumpU(lit("etype"), unhex(element_at(col("after"), "etype")))
            .as("unk_dump"))
    }),

    // TIMESTAMP WITH TIME ZONE rendering (Builder.cpp:272-353 +
    // BuilderJson.cpp:282-348): 13-byte redo values — encoded by the
    // scaffolding inverse, decoded by the REAL codec inside the plan
    // (encode∘decode roundtrip, like q13's rowid) — rendered in the
    // ISO8601_NANO_TZ and UNIX_NANO_STRING families. The tz bytes cycle
    // through 60 named region keys sampled across the FULL 595-entry
    // Locales::timeZoneMap (shipped as a resource — see
    // OracleCodecs.timeZoneMap), both numeric-offset sign paths, and an
    // unmapped key ("TZ?" fallback); the oracle derives the expected names
    // from the same deterministic subset.
    "q68_ts_tz_render" -> ((s, dir) => {
      val encU = udf((sec: Long, frac: Long, b11: Int, b12: Int) =>
        OracleCodecs.tzTimestampEncode(sec, frac, b11, b12))
      val isoU = udf((b: Array[Byte]) => OracleCodecs.tzTimestampIso(b))
      val unixU = udf((b: Array[Byte]) => OracleCodecs.tzTimestampUnix(b))
      val enc = encU(col("sec"), col("frac"), col("b11"), col("b12"))
      // named region keys + "+02:00" (22,60), "-05:30" (15,30), miss (37,0)
      val b11s = tzBreadthKeys.map(_ >> 8) ++ Seq(22, 15, 37)
      val b12s = tzBreadthKeys.map(_ & 0xff) ++ Seq(60, 30, 0)
      val n = b11s.size
      Tables.load(s, dir, "events")
        .selectExpr(
          "event_id",
          "1704067200 + (event_id * 7919) % 31536000 AS sec",
          "(event_id * 1234567) % 1000000000 AS frac",
          s"CAST(event_id % $n AS INT) AS tzi")
        .withColumn("b11", element_at(
          array(b11s.map(lit): _*), col("tzi") + 1))
        .withColumn("b12", element_at(
          array(b12s.map(lit): _*), col("tzi") + 1))
        .select(col("event_id"),
          isoU(enc).as("iso_tz"),
          unixU(enc).as("unix_tz"))
    }),

    // SCN_TYPE / TIMESTAMP_TYPE / SCN_FORMAT header variants
    // (BuilderJson.h:232-289): the Debezium-style b_scn/e_scn/tm trio on
    // every message, and the TEXT_HEX "scns" form, through the REAL
    // Materialize → Envelope path. tm is micro-truncated like q64 (the
    // oracle engine's parquet NANOS ceiling).
    "q70_header_variants" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 1)))))
      val messages = Tables.load(s, dir, "events").selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid", "'c' AS op", "100L AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING)) AS after",
          "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "greatest(event_id - 5, 0) AS bScn",
          "(ts div 1000) * 1000 AS tm",
          "1 AS thread", "-1L AS offset", "0L AS num")
        .as[ChangeMessage]
      val enriched = Materialize(messages, dict)
      val full = Envelope.toMessages(enriched, Envelope.Format(
          scnTypeBegin = true, scnTypeCommit = true, timestampCommit = true))
        .withColumnRenamed("value", "value_full")
      Envelope.toMessages(full, Envelope.Format(scnFormatHex = true))
        .select(col("cScn").as("c_scn"),
          col("value_full").as("value"),
          col("value").as("value_hex"))
    }),

    // MESSAGE_FORMAT::FULL (BuilderJson.cpp:460-548): one message per
    // transaction, payload = the txn's DMLs in commit order. Txns are the
    // per-user event groups (xid = user), so payload arrays are real
    // multi-element lists.
    "q71_txn_message_full" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 1)))))
      val byUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val messages = Tables.load(s, dir, "events")
        .selectExpr("event_id", "user_id",
          "CAST(CAST(value AS DECIMAL(10,2)) AS STRING) AS v")
        .withColumn("cScn", max(col("event_id")).over(byUser))
        .withColumn("cIdx",
          row_number().over(byUser.orderBy("event_id")).cast("long") - 1L)
        .selectExpr("cScn", "cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid", "'c' AS op", "100L AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "map('value', v) AS after",
          "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "-1L AS bScn", "0L AS tm",
          "1 AS thread", "-1L AS offset", "0L AS num")
        .as[ChangeMessage]
      Envelope.toTxnMessages(Materialize(messages, dict))
        .select(col("cScn").as("c_scn"), col("value"))
    }),

    // SCHEMA_FORMAT::FULL (BuilderJson.h:411-530): typed column
    // descriptors — per-type field shapes (number → precision/scale,
    // varchar2 → length) — in the schema section, byte-golden.
    "q72_schema_full" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 2, precision = 10, scale = 2),
          DbColumn("etype", 1, length = 40)))))
      val messages = Tables.load(s, dir, "events").selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid", "'c' AS op", "100L AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING), " +
            "'etype', event_type) AS after",
          "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "-1L AS bScn", "0L AS tm",
          "1 AS thread", "-1L AS offset", "0L AS num")
        .as[ChangeMessage]
      Envelope.toMessages(Materialize(messages, dict),
          Envelope.Format(schemaFormatFull = true))
        .select(col("cScn").as("c_scn"), col("value"))
    }),

    // The remaining envelope knobs in one gate (Format.h:28-33,86-89,
    // 110-116,127-134,91-94 + MESSAGE_FORMAT::ADD_OFFSET): "usr" header
    // from the login-username session attribute, "rth" redo thread,
    // per-DML file offset, rowid skipped, schema without obj#, and the
    // ATTRIBUTES_FORMAT bitmask set to BEGIN-only — attributes render on
    // the begin bracket but not on DML or commit messages.
    "q74_envelope_options" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 1)))))
      val messages = Tables.load(s, dir, "events").selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid",
          "CASE WHEN event_type = 'error' THEN 'begin' " +
            "WHEN event_type = 'signup' THEN 'commit' ELSE 'c' END AS op",
          "CASE WHEN event_type IN ('error','signup') THEN 0L ELSE 100L END" +
            " AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "CASE WHEN event_type IN ('error','signup') " +
            "THEN CAST(NULL AS MAP<STRING,STRING>) " +
            "ELSE map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING))" +
            " END AS after",
          "map('login username', concat('u', CAST(user_id AS STRING)), " +
            "'client info', 'ci') AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "-1L AS bScn", "0L AS tm",
          "CAST(1 + event_id % 4 AS INT) AS thread",
          "CASE WHEN event_type IN ('error','signup') THEN -1L " +
            "ELSE event_id * 16 END AS offset",
          "0L AS num")
        .as[ChangeMessage]
      // schemaless (left-outer) so the obj-less bracket messages survive
      // the dictionary join the way the builder keeps them
      Envelope.toMessages(
          Materialize(messages, dict, Materialize.Options(schemaless = true)),
          Envelope.Format(userBegin = true, userDml = true,
            userCommit = true, userDdl = true, redoThread = true,
            addOffset = true, ridSkip = true, schemaObj = false,
            attributesDml = false, attributesCommit = false))
        .select(col("cScn").as("c_scn"), col("value"))
    }),

    // The last Format.h surfaces in one gate: SCN_FORMAT::TEXT_HEX on all
    // three scn headers (scns/b_scns as 0x-prefixed 16-digit hex,
    // BuilderJson.h:239-276), DB_FORMAT bits (db on begin/commit/DML via
    // ADD_DML but NOT on DDL — ADD_DDL off, Format.h:35-40),
    // USER_TYPE::DML only (usr on DML headers, Format.h:127-134),
    // MESSAGE_FORMAT::ADD_SEQUENCES ("num" per-txn payload ordinal on DML
    // payloads, BuilderJson.h:89-92), and ATTRIBUTES_FORMAT all-off (the
    // reference's default — no attributes section anywhere).
    "q75_db_scn_sequences" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 1)))))
      val messages = Tables.load(s, dir, "events").selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid",
          "CASE WHEN event_type = 'error' THEN 'begin' " +
            "WHEN event_type = 'signup' THEN 'commit' " +
            "WHEN event_type = 'purchase' THEN 'ddl' ELSE 'c' END AS op",
          "CASE WHEN event_type IN ('error','signup') THEN 0L ELSE 100L END" +
            " AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "CASE WHEN event_type IN ('click','view') " +
            "THEN map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING))" +
            " ELSE CAST(NULL AS MAP<STRING,STRING>) END AS after",
          "map('login username', concat('u', CAST(user_id AS STRING)))" +
            " AS attrs",
          "CASE WHEN event_type = 'purchase' " +
            "THEN concat('TRUNCATE TABLE T', CAST(user_id AS STRING)) " +
            "ELSE CAST(NULL AS STRING) END AS ddlText",
          "greatest(event_id - 3, 0L) AS bScn", "0L AS tm",
          "1 AS thread", "-1L AS offset",
          "event_id % 7 AS num")
        .as[ChangeMessage]
      Envelope.toMessages(
          Materialize(messages, dict, Materialize.Options(schemaless = true)),
          Envelope.Format(dbName = "DBX", dbAddDdl = false,
            userDml = true, addSequences = true,
            scnFormatHex = true, scnTypeBegin = true,
            attributesBegin = false, attributesDml = false,
            attributesCommit = false))
        .select(col("cScn").as("c_scn"), col("value"))
    }),

    // UNKNOWN_TYPE::HIDE vs SHOW (Format.h:182-185, Builder.cpp:605-612):
    // a column whose dictionary typeCode is outside the builder's value
    // dispatch (here 121, an ADT) is dropped from the images by default
    // (HIDE) or kept with columnUnknown's QUESTION_MARK rendering (SHOW).
    // Both variants of the same feed in one gate.
    "q76_unknown_type" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 2), DbColumn("payload", 121)))))
      val messages = Tables.load(s, dir, "events").selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "CAST(user_id AS STRING) AS xid", "'c' AS op", "100L AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING), " +
            "'payload', concat('x', CAST(event_id AS STRING))) AS after",
          "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "-1L AS bScn", "0L AS tm",
          "1 AS thread", "-1L AS offset", "0L AS num")
        .as[ChangeMessage]
      def render(opts: Materialize.Options, variant: String) =
        Envelope.toMessages(Materialize(messages, dict, opts))
          .select(col("cScn").as("c_scn"), lit(variant).as("variant"),
            col("value"))
      render(Materialize.Options(), "hide").unionByName(
        render(Materialize.Options(unknownTypeShow = true), "show"))
    }),

    // The whole debezium preset end-to-end (OpenLogReplicator.cpp:694-708
    // — the reference's Debezium-consumer interop mode): FULL_UPD
    // materialization, every header variant on, full schema, "num",
    // reversed-hex xid. One gate proving the knobs compose.
    "q79_debezium" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import spark.implicits._
      val dict = Dictionary(Seq(DbTable(100L, 100L, "APP", "EVENTS",
        Seq(DbColumn("value", 2, precision = 10, scale = 2),
          DbColumn("etype", 1, length = 40)))))
      val revU = udf((x: Long) => OracleCodecs.xidFormatReversed(x))
      val messages = Tables.load(s, dir, "events")
        .withColumn("xid_str", revU(expr(
          "(user_id % 100) * 281474976710656 + (event_id % 10) * 4294967296" +
            " + event_id")))
        .selectExpr(
          "event_id AS cScn", "0L AS cIdx", "event_id AS scn", "1L AS seq",
          "xid_str AS xid", "'c' AS op", "100L AS obj",
          "CAST(NULL AS STRING) AS rid",
          "CAST(NULL AS MAP<STRING,STRING>) AS before",
          "map('value', CAST(CAST(value AS DECIMAL(10,2)) AS STRING), " +
            "'etype', event_type) AS after",
          "map('login username', concat('u', CAST(user_id AS STRING)))" +
            " AS attrs",
          "CAST(NULL AS STRING) AS ddlText",
          "greatest(event_id - 2, 0L) AS bScn",
          "(ts div 1000) * 1000 AS tm",
          "CAST(1 + event_id % 4 AS INT) AS thread",
          "event_id * 16 AS offset",
          "event_id % 3 AS num")
        .as[ChangeMessage]
      Envelope.toMessages(
          Materialize(messages, dict,
            Materialize.Options(columnFormat = Materialize.FullUpd)),
          Envelope.debezium("DB1"))
        .select(col("cScn").as("c_scn"), col("value"))
    }),

    "q66_interval_render" -> ((s, dir) => {
      val dsU = udf((n: Long) => OracleCodecs.intervalDsString(n, ' '))
      val ymU = udf((m: Long) => OracleCodecs.intervalYmString(m, '-'))
      val usU = udf((n: Long) => OracleCodecs.intervalDsUnix(n, 1000L))
      Tables.load(s, dir, "events")
        .selectExpr("event_id",
          "(event_id * 1234567891) % 864000000000000 - 432000000000000 AS ns",
          "event_id % 1000 - 500 AS months")
        .select(col("event_id"),
          dsU(col("ns")).as("ds_iso"),
          usU(col("ns")).as("ds_micro"),
          col("months"),
          ymU(col("months")).as("ym_str"))
    }))

  val oracles: Map[String, String] = Map(
    "q79_debezium" ->
      """WITH x AS (
        |  SELECT *, (user_id % 100) * 281474976710656
        |    + (event_id % 10) * 4294967296 + event_id AS xid
        |  FROM events)
        |SELECT event_id AS c_scn,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scn":' || event_id ||
        |  ',"b_scn":' || greatest(event_id - 2, 0) ||
        |  ',"e_scn":' || event_id ||
        |  ',"tm":' || epoch_ns(ts) ||
        |  ',"seq":1,"xid":"' ||
        |  printf('%02x', (xid >> 48) & 255) || printf('%02x', (xid >> 56) & 255)
        |    || printf('%02x', (xid >> 32) & 255) || printf('%02x', (xid >> 40) & 255)
        |    || printf('%02x', xid & 255) || printf('%02x', (xid >> 8) & 255)
        |    || printf('%02x', (xid >> 16) & 255) || printf('%02x', (xid >> 24) & 255)
        |  || '","db":"DB1","usr":"u' || user_id ||
        |  '","rth":' || (1 + event_id % 4) ||
        |  ',"op":"c",' ||
        |  '"schema":{"owner":"APP","table":"EVENTS","obj":100,"columns":[' ||
        |  '{"name":"value","type":"number","precision":10,"scale":2,"nullable":true},' ||
        |  '{"name":"etype","type":"varchar2","length":40,"nullable":true}]},' ||
        |  '"num":' || (event_id % 3) ||
        |  ',"after":{"value":"' || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
        |    || '","etype":"' || event_type || '"}}' AS value
        |FROM x""".stripMargin,

    "q76_unknown_type" ->
      """SELECT event_id AS c_scn, v.variant,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scn":' || event_id ||
        |  ',"seq":1,"xid":"' || user_id ||
        |  '","op":"c","schema":{"owner":"APP","table":"EVENTS","obj":100}' ||
        |  ',"after":{"value":"' ||
        |  CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) ||
        |  CASE WHEN v.variant = 'show' THEN '","payload":"?"}}'
        |       ELSE '"}}' END AS value
        |FROM events
        |CROSS JOIN (SELECT unnest(['hide','show']) AS variant) v""".stripMargin,

    "q75_db_scn_sequences" ->
      """SELECT event_id AS c_scn,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scns":"0x' ||
        |  printf('%016x', event_id) || '","b_scns":"0x' ||
        |  printf('%016x', greatest(event_id - 3, 0)) ||
        |  '","seq":1,"xid":"' || user_id || '"' ||
        |  CASE WHEN event_type = 'error' THEN ',"db":"DBX","op":"begin"}'
        |  WHEN event_type = 'signup' THEN ',"db":"DBX","op":"commit"}'
        |  WHEN event_type = 'purchase' THEN
        |    ',"op":"ddl","schema":{"owner":"APP","table":"EVENTS",' ||
        |    '"obj":100},"ddl":"TRUNCATE TABLE T' || user_id || '"}'
        |  ELSE
        |    ',"db":"DBX","usr":"u' || user_id ||
        |    '","op":"c","schema":{"owner":"APP","table":"EVENTS",' ||
        |    '"obj":100},"num":' || (event_id % 7) ||
        |    ',"after":{"value":"' ||
        |    CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) || '"}}'
        |  END AS value
        |FROM events""".stripMargin,

    "q74_envelope_options" ->
      """SELECT event_id AS c_scn,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scn":' || event_id ||
        |  ',"seq":1,"xid":"' || user_id || '","usr":"u' || user_id ||
        |  '","rth":' || (1 + event_id % 4) ||
        |  CASE WHEN event_type = 'error' THEN
        |    ',"attributes":{"login username":"u' || user_id ||
        |    '","client info":"ci"},"op":"begin"}'
        |  WHEN event_type = 'signup' THEN ',"op":"commit"}'
        |  ELSE
        |    ',"op":"c","offset":' || (event_id * 16) ||
        |    ',"schema":{"owner":"APP","table":"EVENTS"},"after":{"value":"'
        |    || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) || '"}}'
        |  END AS value
        |FROM events""".stripMargin,

    "q62_ddl_messages" ->
      """SELECT event_id AS scn, user_id, 'ddl' AS op,
        |  'ALTER TABLE T' || user_id || ' /* ' || props || ' */' AS ddl_text
        |FROM events WHERE event_type = 'error'""".stripMargin,

    "q100_ddl_counters" ->
      """SELECT CASE user_id % 6
        |    WHEN 0 THEN 'alter' WHEN 1 THEN 'create' WHEN 2 THEN 'drop'
        |    WHEN 3 THEN 'truncate' WHEN 4 THEN 'purge' ELSE 'other' END
        |    AS ddl_kind,
        |  CAST(count(*) AS BIGINT) AS n_ops
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1""".stripMargin,

    "q63_checkpoint_msg" ->
      """SELECT CAST(count(*)
        |    + CASE WHEN count(*) > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_total,
        |  '{"scn":' || max(event_id) ||
        |    ',"op":"chkpt","seq":1,"offset":8192,"redo":true}'
        |    AS chkpt_value,
        |  max(event_id) AS chkpt_scn
        |FROM events""".stripMargin,

    "q64_ts_formats" -> {
      def iso(s: String, sep: Char) =
        s"CAST(DATE '1970-01-01' + CAST(($s) // 86400 AS INT) AS VARCHAR)" +
          s" || '$sep' || lpad(CAST((($s) // 3600) % 24 AS VARCHAR), 2, '0')" +
          s" || ':' || lpad(CAST((($s) // 60) % 60 AS VARCHAR), 2, '0')" +
          s" || ':' || lpad(CAST(($s) % 60 AS VARCHAR), 2, '0')"
      def frac(total: String, mod: Long, digits: Int) =
        s"lpad(CAST(($total) % $mod AS VARCHAR), $digits, '0')"
      val tMicro = "((n + 500) // 1000)"
      val tMilli = "((n + 500000) // 1000000)"
      val tSec = "((n + 500000000) // 1000000000)"
      s"""WITH t AS (SELECT event_id, epoch_ns(ts) AS n FROM events),
         |s AS (SELECT event_id, n,
         |  CASE WHEN n < 0 THEN -1 ELSE 1 END AS sg, abs(n) AS a FROM t)
         |SELECT event_id,
         |  n AS unix_nano,
         |  sg * ((a + 500) // 1000) AS unix_micro,
         |  sg * ((a + 500000) // 1000000) AS unix_milli,
         |  sg * ((a + 500000000) // 1000000000) AS unix_sec,
         |  CAST(n AS VARCHAR) AS unix_nano_str,
         |  CAST(sg * ((a + 500) // 1000) AS VARCHAR) AS unix_micro_str,
         |  CAST(sg * ((a + 500000) // 1000000) AS VARCHAR) AS unix_milli_str,
         |  CAST(sg * ((a + 500000000) // 1000000000) AS VARCHAR)
         |    AS unix_sec_str,
         |  ${iso("n // 1000000000", 'T')} || '.' ||
         |    ${frac("n", 1000000000L, 9)} || 'Z' AS iso_nano_tz,
         |  ${iso(s"$tMicro // 1000000", 'T')} || '.' ||
         |    ${frac(tMicro, 1000000L, 6)} || 'Z' AS iso_micro_tz,
         |  ${iso(s"$tMilli // 1000", 'T')} || '.' ||
         |    ${frac(tMilli, 1000L, 3)} || 'Z' AS iso_milli_tz,
         |  ${iso(tSec, 'T')} || 'Z' AS iso_tz,
         |  ${iso("n // 1000000000", ' ')} || '.' ||
         |    ${frac("n", 1000000000L, 9)} AS iso_nano,
         |  ${iso(s"$tMicro // 1000000", ' ')} || '.' ||
         |    ${frac(tMicro, 1000000L, 6)} AS iso_micro,
         |  ${iso(s"$tMilli // 1000", ' ')} || '.' ||
         |    ${frac(tMilli, 1000L, 3)} AS iso_milli,
         |  ${iso(tSec, ' ')} AS iso_sec
         |FROM s""".stripMargin
    },

    "q65_xid_formats" ->
      """WITH x AS (
        |  SELECT event_id,
        |    (user_id % 100) * 281474976710656 + (event_id % 10) * 4294967296
        |      + event_id AS xid
        |  FROM events)
        |SELECT event_id,
        |  '0x' || printf('%04x', (xid >> 48) & 65535) || '.' ||
        |    printf('%03x', (xid >> 32) & 65535) || '.' ||
        |    printf('%08x', xid & 4294967295) AS xid_hex,
        |  ((xid >> 48) & 65535) || '.' || ((xid >> 32) & 65535) || '.' ||
        |    (xid & 4294967295) AS xid_dec,
        |  xid AS xidn,
        |  printf('%02x', (xid >> 48) & 255) || printf('%02x', (xid >> 56) & 255)
        |    || printf('%02x', (xid >> 32) & 255) || printf('%02x', (xid >> 40) & 255)
        |    || printf('%02x', xid & 255) || printf('%02x', (xid >> 8) & 255)
        |    || printf('%02x', (xid >> 16) & 255) || printf('%02x', (xid >> 24) & 255)
        |    AS xid_rev
        |FROM x""".stripMargin,

    "q72_schema_full" ->
      """SELECT event_id AS c_scn,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scn":' || event_id ||
        |  ',"seq":1,"xid":"' || user_id || '","op":"c",' ||
        |  '"schema":{"owner":"APP","table":"EVENTS","obj":100,"columns":[' ||
        |  '{"name":"value","type":"number","precision":10,"scale":2,"nullable":true},' ||
        |  '{"name":"etype","type":"varchar2","length":40,"nullable":true}]},' ||
        |  '"after":{"value":"' || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
        |    || '","etype":"' || event_type || '"}}' AS value
        |FROM events""".stripMargin,

    "q71_txn_message_full" ->
      """WITH m AS (
        |  SELECT event_id, user_id,
        |    CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) AS v,
        |    max(event_id) OVER (PARTITION BY user_id) AS c_scn,
        |    min(event_id) OVER (PARTITION BY user_id) AS scn0
        |  FROM events)
        |SELECT c_scn,
        |  '{"c_scn":' || c_scn || ',"c_idx":0,"scn":' || scn0 ||
        |  ',"seq":1,"xid":"' || user_id || '","payload":[' ||
        |  string_agg('{"op":"c","schema":{"owner":"APP","table":"EVENTS",'
        |      || '"obj":100},"after":{"value":"' || v || '"}}',
        |    ',' ORDER BY event_id) ||
        |  ']}' AS value
        |FROM m GROUP BY c_scn, user_id, scn0""".stripMargin,

    "q70_header_variants" ->
      """SELECT event_id AS c_scn,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scn":' || event_id ||
        |  ',"b_scn":' || greatest(event_id - 5, 0) ||
        |  ',"e_scn":' || event_id ||
        |  ',"tm":' || epoch_ns(ts) ||
        |  ',"seq":1,"xid":"' || user_id || '","op":"c",' ||
        |  '"schema":{"owner":"APP","table":"EVENTS","obj":100},' ||
        |  '"after":{"value":"' || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
        |    || '"}}' AS value,
        |  '{"c_scn":' || event_id || ',"c_idx":0,"scns":"0x'
        |    || printf('%016x', event_id) ||
        |  '","seq":1,"xid":"' || user_id || '","op":"c",' ||
        |  '"schema":{"owner":"APP","table":"EVENTS","obj":100},' ||
        |  '"after":{"value":"' || CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)
        |    || '"}}' AS value_hex
        |FROM events""".stripMargin,

    "q69_hex_formats" ->
      """SELECT event_id,
        |  hex(CAST(CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR) AS BLOB))
        |    AS value_hex,
        |  hex(CAST(event_type AS BLOB)) AS etype_hex,
        |  '?' AS unk_value,
        |  'unknown value (column: etype): '
        |    || octet_length(CAST(event_type AS BLOB)) || ' - '
        |    || array_to_string(
        |      list_transform(range(1, octet_length(CAST(event_type AS BLOB)) + 1),
        |        i -> ' ' || lower(substr(hex(CAST(event_type AS BLOB)),
        |          CAST((i-1)*2+1 AS INT), 2))), '') AS unk_dump
        |FROM events""".stripMargin,

    "q68_ts_tz_render" -> {
      val names = tzBreadth.map(_._2) ++ Seq("+02:00", "-05:30", "TZ?")
      val lst = names.map(nm => s"'$nm'").mkString("[", ", ", "]")
      s"""WITH t AS (
        |  SELECT event_id,
        |    1704067200 + (event_id * 7919) % 31536000 AS sec,
        |    (event_id * 1234567) % 1000000000 AS frac,
        |    ($lst)[CAST(event_id % ${names.size} AS INT) + 1] AS tz
        |  FROM events)
        |SELECT event_id,
        |  CAST(DATE '1970-01-01' + CAST(sec // 86400 AS INT) AS VARCHAR)
        |    || 'T' || lpad(CAST((sec // 3600) % 24 AS VARCHAR), 2, '0')
        |    || ':' || lpad(CAST((sec // 60) % 60 AS VARCHAR), 2, '0')
        |    || ':' || lpad(CAST(sec % 60 AS VARCHAR), 2, '0')
        |    || '.' || lpad(CAST(frac AS VARCHAR), 9, '0') || 'Z ' || tz
        |    AS iso_tz,
        |  CAST(sec * 1000000000 + frac AS VARCHAR) || ',' || tz AS unix_tz
        |FROM t""".stripMargin
    },

    "q66_interval_render" ->
      """WITH i AS (
        |  SELECT event_id,
        |    (event_id * 1234567891) % 864000000000000 - 432000000000000 AS ns,
        |    event_id % 1000 - 500 AS months
        |  FROM events),
        |a AS (SELECT event_id, ns, months, abs(ns) AS an, abs(months) AS am
        |  FROM i)
        |SELECT event_id,
        |  CASE WHEN ns < 0 THEN '-' ELSE '' END
        |    || (an // 86400000000000)
        |    || ' ' || lpad(CAST((an // 3600000000000) % 24 AS VARCHAR), 2, '0')
        |    || ':' || lpad(CAST((an // 60000000000) % 60 AS VARCHAR), 2, '0')
        |    || ':' || lpad(CAST((an // 1000000000) % 60 AS VARCHAR), 2, '0')
        |    || '.' || lpad(CAST(an % 1000000000 AS VARCHAR), 9, '0') AS ds_iso,
        |  (CASE WHEN ns < 0 THEN -1 ELSE 1 END) * ((an + 500) // 1000)
        |    AS ds_micro,
        |  months,
        |  CASE WHEN months < 0 THEN '-' ELSE '' END
        |    || (am // 12) || '-' || (am % 12) AS ym_str
        |FROM a""".stripMargin)
}
