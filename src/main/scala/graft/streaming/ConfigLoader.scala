package graft.streaming

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.cdc._
import graft.core.OracleCodecs

/** Loader for the reference replicator's JSON configuration document
  * (`documentation/json/json.adoc` shape: top-level `source`/`target`
  * arrays; `source` nests reader/format/filter, `target` nests writer) —
  * a reference user's existing OpenLogReplicator.json drives this engine
  * directly. Knob values map per `src/common/Format.h` (bit meanings) and
  * the per-section adoc docs; behaviors the engine implements elsewhere
  * (codec rendering choices, path mapping) are surfaced on [[Loaded]] for
  * the feed-adaptation layer instead of being dropped silently.
  *
  * The dictionary (table columns) is NOT in the reference config — the
  * reference reads it from the database; here the caller passes the
  * [[Dictionary]] (from [[Dictionary.fromCatalog]] or a checkpoint) and
  * the config's `filter.table` rules contribute the selectors plus the
  * per-table key/condition/tag overrides.
  */
object ConfigLoader {

  /** target.writer, for the caller to hand to [[graft.sinks.Sinks]]. */
  sealed trait WriterSpec
  case class FileWriterSpec(output: String, maxFileSize: Long,
      newLine: Int, append: Boolean,
      /** strftime pattern rendering `%t` in `output` (8.writer.adoc,
        * default `%F_%T`) — [[graft.sinks.Strftime]]. */
      timestampFormat: String = "%F_%T",
      /** file-writer flush threshold in bytes (default 1 MiB; 0 = flush
        * after every message). */
      writeBufferFlushSize: Long = 1048576L) extends WriterSpec {
    /** new-line 0/1/2 → the bytes appended per message (8.writer.adoc). */
    def newLineStr: String = newLine match {
      case 1 => "\n"; case 2 => "\r\n"; case _ => ""
    }
  }
  case class KafkaWriterSpec(brokers: String, topic: String,
      properties: Map[String, String],
      /** `max-message-mb` (default 100, range 1..953): producer batches
        * split so one Produce payload stays under this —
        * [[graft.sinks.KafkaDirectWriter]] `maxMessageBytes`. */
      maxMessageMb: Int = 100,
      queueSize: Int = 65536,
      pollIntervalUs: Long = 100000L) extends WriterSpec
  /** `transport` selects the wire framing ([[graft.sinks.Framing]]):
    * "network" = plain 4-byte length prefixes (StreamNetwork.cpp),
    * "zeromq" = ZMTP 3.0 PAIR (StreamZeroMQ.cpp,
    * OpenLogReplicator.cpp:1191-1205) — the same pull-protocol state
    * machine either way, matching the reference. */
  case class NetworkWriterSpec(uri: String, transport: String = "network",
      queueSize: Int = 65536, pollIntervalUs: Long = 100000L)
      extends WriterSpec {
    def newFraming(): graft.sinks.Framing = transport match {
      case "zeromq" => new graft.sinks.ZmtpFraming("PAIR")
      case _ => graft.sinks.PlainFraming
    }
  }
  case object DiscardWriterSpec extends WriterSpec

  /** Top-level `metrics` section (OpenLogReplicator.cpp:364-399: `type`,
    * `bind`, `tag-names`). `newRegistry` builds the name-parity
    * [[Prometheus]] registry; `bind` is surfaced for the caller's HTTP
    * exposer (serving the scrape endpoint is deployment plumbing, not
    * engine semantics — [[Prometheus.render]] is the scrape body). */
  case class MetricsConf(metricsType: String, bind: String,
      tagNames: Prometheus.TagNames) {
    def newRegistry(): Prometheus = new Prometheus(tagNames)
  }

  /** source.debug (json/3.debug.adoc): bounded-run / stop-trigger knobs
    * for controlled tests. The micro-batch is the engine's LWN-checkpoint
    * analogue (SURVEY §1.1), so `stop-checkpoints` counts micro-batches
    * and `stop-transactions` counts drained (committed) keyed-state rows;
    * `owner`/`table` name the debug table whose DML stops the run.
    * `stop-log-switches` has no analogue in a pre-decoded feed (there are
    * no redo file switches to observe) and is surfaced for completeness
    * only. Enforcement: [[DebugStop]]. */
  case class DebugConf(stopLogSwitches: Long, stopCheckpoints: Long,
      stopTransactions: Long, owner: String, table: String)

  /** reader start position (2.reader.adoc): raw knob values, validated
    * per the reference's rules. The SCN/seq bounds also land on
    * [[Pipeline.SourceConfig]] as pushdown filters; `time`/`timeRel`
    * resolve to an epoch-nanos bound on the feed's record clock (the
    * reference's TIMESTAMP_TO_SCN needs a live database session). */
  case class StartPosition(scn: Option[Long] = None, seq: Option[Long] = None,
      time: Option[String] = None, timeRel: Option[Long] = None)

  /** `source.state` checkpoint element (11.state.adoc) with the
    * reference's defaults. `keepCheckpoints` drives the dictionary-
    * snapshot retention in [[Pipeline.streamWithEvolution]]; the interval
    * triggers describe redo-byte/redo-time cadence the micro-batch
    * boundary replaces (each batch checkpoints on schema change), so they
    * ride through for operational visibility. */
  case class StateConf(stateType: String = "disk", path: String = "checkpoint",
      intervalMb: Long = 500L, intervalS: Long = 600L,
      keepCheckpoints: Int = 100, schemaForceInterval: Int = 20)

  /** `source.memory` element (9.memory.adoc) with the reference's
    * defaults. These size the reference's own arena; in Spark the
    * executor/driver memory config plays that role, so the values are
    * surfaced (and validated against `transaction-max-mb`, the one
    * cross-check the reference enforces at startup,
    * OpenLogReplicator.cpp:600-605) rather than allocated. */
  case class MemoryConf(minMb: Long = 32L, maxMb: Long = 2048L,
      swapPath: String = "./tmp", swapMb: Long = 1536L,
      readBufferMaxMb: Long = 128L, readBufferMinMb: Long = 4L,
      writeBufferMaxMb: Long = 2048L, writeBufferMinMb: Long = 4L,
      unswapBufferMinMb: Long = 4L)

  case class Loaded(
      alias: String,
      dbName: String,
      config: Pipeline.Config,
      writer: Option[WriterSpec],
      metrics: Option[MetricsConf],
      debug: Option[DebugConf],
      /** ADAPTIVE_SCHEMA (flag 0x0004): callers feed unseen objects
        * through [[graft.cdc.Dictionary.withAdaptive]] per batch. */
      adaptiveSchema: Boolean,
      /** The raw REDO_FLAGS bitmask — reader-layer bits with no analogue
        * in a pre-decoded feed stay visible here instead of vanishing. */
      rawFlags: Long,
      /** codec-side rendering selectors applied at feed adaptation:
        * XID_FORMAT / TIMESTAMP_FORMAT / INTERVAL_DTS / INTERVAL_YTM raw
        * values (Format.h:54-168,195-200). */
      xidFormat: Int,
      timestampFormat: Int,
      intervalDts: Int,
      intervalYtm: Int,
      /** signed east-of-UTC seconds from reader.db-timezone (validated —
        * an unparseable zone throws, like the reference's startup). */
      dbTimezoneSec: Int,
      pathMapping: Seq[(String, String)],
      /** reader.type: online | offline | batch (2.reader.adoc). */
      readerMode: String = "batch",
      /** reader.redo-log — the FULL list (batch mode processes them in
        * order; `config.source.path` keeps the head for single-path
        * callers). */
      redoLogs: Seq[String] = Nil,
      start: StartPosition = StartPosition(),
      /** reader.host-timezone / log-timezone seconds east of UTC; None =
        * the host default (the reference's fallback). */
      hostTimezoneSec: Option[Int] = None,
      logTimezoneSec: Option[Int] = None,
      /** reader.disable-checks bitmask (capture-layer checks the
        * pre-decoded feed replaces; surfaced, not silently dropped). */
      disableChecks: Int = 0,
      state: StateConf = StateConf(),
      memory: MemoryConf = MemoryConf())

  private def jint(v: JValue, dflt: Int = 0): Int = v match {
    case JInt(n) => n.toInt
    case JLong(n) => n.toInt
    case _ => dflt
  }
  private def jlong(v: JValue, dflt: Long = 0L): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case _ => dflt
  }
  private def jstr(v: JValue, dflt: String = ""): String = v match {
    case JString(s) => s
    case _ => dflt
  }
  private def bit(v: Int, b: Int): Boolean = (v & b) != 0
  private def joptLong(v: JValue): Option[Long] = v match {
    case JInt(n) => Some(n.toLong)
    case JLong(n) => Some(n)
    case _ => None
  }
  private def joptStr(v: JValue): Option[String] = v match {
    case JString(s) if s.nonEmpty => Some(s)
    case _ => None
  }
  private def cfgRequire(ok: Boolean, msg: => String): Unit =
    if (!ok) throw new IllegalArgumentException(msg) // ConfigurationException

  /** `now` is injectable so `start-time-rel` resolution is testable. */
  def load(json: String, dict: Dictionary,
      now: () => Long = () => System.currentTimeMillis()): Loaded = {
    val root = JsonMethods.parse(json)
    val src = (root \ "source") match {
      case JArray(xs) if xs.nonEmpty => xs.head
      case other => other // tolerate a single object
    }
    val alias = jstr(src \ "alias")
    val dbName = jstr(src \ "name")

    // ----- reader ---------------------------------------------------------
    val reader = src \ "reader"
    val dbTz = jstr(reader \ "db-timezone", "+00:00")
    val dbTzSec = OracleCodecs.parseTzOffset(dbTz).getOrElse(
      throw new IllegalArgumentException(s"unparseable db-timezone: $dbTz"))
    val pathMapping = (reader \ "path-mapping") match {
      case JArray(xs) =>
        xs.map(jstr(_)).grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
      case _ => Nil
    }
    // batch readers name their input; online mode watches a directory
    val redoLogs = (reader \ "redo-log") match {
      case JArray(xs) => xs.map(jstr(_)).filter(_.nonEmpty)
      case JString(s) if s.nonEmpty => Seq(s)
      case _ => Nil
    }
    val srcPath = redoLogs.headOption.getOrElse("")
    val readerMode = jstr(reader \ "type", "batch")
    cfgRequire(Set("online", "offline", "batch")(readerMode),
      s"""bad JSON, invalid "type" value: $readerMode""") // 30001
    cfgRequire(redoLogs.isEmpty || readerMode == "batch",
      """bad JSON, "redo-log" is only valid for "batch" type""") // 30001

    // ---- start position (2.reader.adoc) ----------------------------------
    val start = StartPosition(
      scn = joptLong(reader \ "start-scn"),
      seq = joptLong(reader \ "start-seq"),
      time = joptStr(reader \ "start-time"),
      timeRel = joptLong(reader \ "start-time-rel"))
    // the reference's mutual-exclusion rules (ReplicatorOnline startup)
    cfgRequire(start.timeRel.isEmpty || start.scn.isEmpty,
      """bad JSON, "start-time-rel" is mutually exclusive with "start-scn"""")
    cfgRequire(start.time.isEmpty || (start.scn.isEmpty && start.timeRel.isEmpty),
      """bad JSON, "start-time" is mutually exclusive with "start-scn" and "start-time-rel"""")
    // absolute "YYYY-MM-DD HH24:MI:SS" is wall time in the DB zone; the
    // relative form counts back from now. Either resolves to epoch nanos
    // against the feed's record clock (ChangeEvent.tm).
    val startTmNanos: Option[Long] = start.time.map { t =>
      val ldt = java.time.LocalDateTime.parse(t,
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      ldt.toEpochSecond(java.time.ZoneOffset.ofTotalSeconds(dbTzSec)) *
        1000000000L
    }.orElse(start.timeRel.map(rel => (now() / 1000L - rel) * 1000000000L))

    // ---- timezones beyond db-timezone ------------------------------------
    def tzOpt(key: String): Option[Int] = joptStr(reader \ key).map { z =>
      OracleCodecs.parseTzOffset(z).getOrElse(
        throw new IllegalArgumentException(s"unparseable $key: $z"))
    }
    val hostTzSec = tzOpt("host-timezone")
    val logTzSec = tzOpt("log-timezone")
    val disableChecks = jint(reader \ "disable-checks")

    // ---- memory + transaction-max-mb (9.memory.adoc + 2.reader.adoc) -----
    val memJ = src \ "memory"
    val memMaxMb = jlong(memJ \ "max-mb", 2048L)
    val memory = MemoryConf(
      minMb = jlong(memJ \ "min-mb", 32L),
      maxMb = memMaxMb,
      swapPath = jstr(memJ \ "swap-path", "./tmp"),
      swapMb = jlong(memJ \ "swap-mb", memMaxMb * 3L / 4L),
      readBufferMaxMb =
        jlong(memJ \ "read-buffer-max-mb", math.min(memMaxMb / 8L, 128L)),
      readBufferMinMb = jlong(memJ \ "read-buffer-min-mb", 4L),
      writeBufferMaxMb =
        jlong(memJ \ "write-buffer-max-mb", math.min(memMaxMb, 2048L)),
      writeBufferMinMb = jlong(memJ \ "write-buffer-min-mb", 4L),
      unswapBufferMinMb = jlong(memJ \ "unswap-buffer-min-mb", 4L))
    cfgRequire(memory.minMb <= memory.maxMb,
      s"""bad JSON, invalid "min-mb" value: ${memory.minMb}, bigger than "max-mb"""")
    val txnMaxMb = jlong(reader \ "transaction-max-mb")
    cfgRequire(txnMaxMb <= memory.maxMb, // OpenLogReplicator.cpp:600-605
      s"""bad JSON, invalid "transaction-max-mb" value: $txnMaxMb, bigger than "max-mb"""")

    // ---- state element (11.state.adoc) -----------------------------------
    val stJ = src \ "state"
    val state = StateConf(
      stateType = jstr(stJ \ "type", "disk"),
      path = jstr(stJ \ "path", "checkpoint"),
      intervalMb = jlong(stJ \ "interval-mb", 500L),
      intervalS = jlong(stJ \ "interval-s", 600L),
      keepCheckpoints = jint(stJ \ "keep-checkpoints", 100),
      schemaForceInterval = jint(stJ \ "schema-force-interval", 20))
    cfgRequire(state.stateType == "disk",
      s"""bad JSON, invalid "type" value: ${state.stateType}""") // only disk

    // ----- filter / table rules -------------------------------------------
    val filter = src \ "filter"
    val rules = (filter \ "table") match {
      case JArray(xs) => xs
      case _ => Nil
    }
    val selectors = rules.map { r =>
      TableSelector(jstr(r \ "owner"), jstr(r \ "table"))
    }
    // per-table key/condition/tag overrides onto the provided dictionary
    val tables = dict.tables.map { t =>
      rules.find(r => TableSelector(jstr(r \ "owner"), jstr(r \ "table"))
        .matches(t.owner, t.name)) match {
        case None => t
        case Some(r) =>
          val t1 = (r \ "key") match {
            case JString(k) if k.nonEmpty =>
              t.copy(keyList = k.split(",").map(_.trim).toSeq)
            case _ => t
          }
          val t2 = (r \ "condition") match {
            case JString(c) if c.nonEmpty => t1.copy(conditionExpr = c)
            case _ => t1
          }
          (r \ "tag") match {
            case JString("[pk]") => t2.copy(tagType = "pk")
            case JString("[all]") => t2.copy(tagType = "all")
            case JString(cols) if cols.nonEmpty =>
              t2.copy(tagCols = cols.split(",").map(_.trim).toSeq)
            case _ => t2
          }
      }
    }
    val skipXids = (filter \ "skip-xid") match {
      case JArray(xs) => xs.map(jstr(_)).toSet
      case _ => Set.empty[String]
    }
    val dumpXids = (filter \ "dump-xid") match {
      case JArray(xs) => xs.map(jstr(_)).toSet
      case _ => Set.empty[String]
    }

    // ----- format (Format.h bit meanings) ----------------------------------
    val fmt = src \ "format"
    val fmtType = jstr(fmt \ "type", "json")
    val columnFormat = jint(fmt \ "column") match {
      case 1 => Materialize.FullInsDec
      case 2 => Materialize.FullUpd
      case _ => Materialize.Changed
    }
    val charV = jint(fmt \ "char") // CHAR_FORMAT: bit 2 = HEX
    val scnTypeV = jint(fmt \ "scn-type") // SCN_TYPE bits
    val msgV = jint(fmt \ "message") // MESSAGE_FORMAT bits
    val attrV = jint(fmt \ "attributes") // ATTRIBUTES_FORMAT bits
    val schemaV = jint(fmt \ "schema") // SCHEMA_FORMAT bits
    val dbV = jint(fmt \ "db") // DB_FORMAT bits
    val userV = jint(fmt \ "user-type") // USER_TYPE bits
    val tsTypeV = jint(fmt \ "timestamp-type") // TIMESTAMP_TYPE bits

    val envelope =
      if (fmtType == "debezium") Envelope.debezium(dbName)
      else Envelope.Format(
        dbName = dbName,
        scnFormatHex = jint(fmt \ "scn") == 1, // SCN_FORMAT::TEXT_HEX
        scnTypeBegin = bit(scnTypeV, 2), // SCN_TYPE::BEGIN
        scnTypeCommit = bit(scnTypeV, 8), // SCN_TYPE::COMMIT
        timestampCommit = bit(tsTypeV, 1), // TIMESTAMP_TYPE::COMMIT_VALUE
        skipBegin = bit(msgV, 4), // MESSAGE_FORMAT::SKIP_BEGIN
        skipCommit = bit(msgV, 8), // ::SKIP_COMMIT
        addOffset = bit(msgV, 16), // ::ADD_OFFSET
        addSequences = bit(msgV, 2), // ::ADD_SEQUENCES
        schemaFormatFull = bit(schemaV, 1), // SCHEMA_FORMAT::FULL
        schemaObj = bit(schemaV, 4), // ::OBJ
        attributesBegin = bit(attrV, 1), // ATTRIBUTES_FORMAT::BEGIN
        attributesDml = bit(attrV, 2), // ::DML
        attributesCommit = bit(attrV, 4), // ::COMMIT
        ridSkip = jint(fmt \ "rid") == 0, // RID_FORMAT::SKIP is 0
        userBegin = bit(userV, 1), userDml = bit(userV, 2),
        userCommit = bit(userV, 4), userDdl = bit(userV, 8),
        redoThread = jint(fmt \ "redo-thread") == 1, // ::TEXT
        dbAddDml = bit(dbV, 1), // DB_FORMAT::ADD_DML
        dbAddDdl = bit(dbV, 2)) // ::ADD_DDL

    // ----- source.flags (1.source.adoc REDO_FLAGS bitmask, Ctx.h:86-106) --
    // Bits with a materialize knob flip it; reader-side bits (ARCH_ONLY,
    // DIRECT_DISABLE, IGNORE_DATA_ERRORS, VERIFY_SCHEMA, CHECKPOINT_KEEP)
    // concern the binary capture layer the pre-decoded feed replaces and
    // ride through on `rawFlags` for the caller.
    val flagsV = jlong(src \ "flags")
    def rflag(b: Int): Boolean = (flagsV & (1L << b)) != 0

    val materialize = Materialize.Options(
      columnFormat = columnFormat,
      showSystemTransactions = rflag(11), // SHOW_SYSTEM_TRANSACTIONS
      schemaless = rflag(1) || rflag(2), // SCHEMALESS (ADAPTIVE implies it)
      showHiddenColumns = rflag(6), // SHOW_HIDDEN_COLUMNS
      showNestedColumns = rflag(8), // SHOW_NESTED_COLUMNS
      showUnusedColumns = rflag(9), // SHOW_UNUSED_COLUMNS
      charFormatHex = bit(charV, 2), // CHAR_FORMAT::HEX
      unknownTypeShow = jint(fmt \ "unknown-type") == 1, // UNKNOWN_TYPE::SHOW
      experimentalJson = rflag(17), // EXPERIMENTAL_JSON
      experimentalXmlType = rflag(16)) // EXPERIMENTAL_XMLTYPE

    // ----- target.writer ----------------------------------------------------
    val tgt = (root \ "target") match {
      case JArray(xs) => xs.find(t => jstr(t \ "source") == alias)
        .orElse(xs.headOption)
      case _ => None
    }
    val writer = tgt.map(_ \ "writer").flatMap { w =>
      val queueSize = jint(w \ "queue-size", 65536)
      cfgRequire(queueSize >= 1 && queueSize <= 1000000,
        s"""bad JSON, invalid "queue-size" value: $queueSize""")
      val pollUs = jlong(w \ "poll-interval-us", 100000L)
      cfgRequire(pollUs >= 100L && pollUs <= 3600000000L,
        s"""bad JSON, invalid "poll-interval-us" value: $pollUs""")
      jstr(w \ "type") match {
        case "file" =>
          val newLine = jint(w \ "new-line") // reference default: none (0)
          cfgRequire(newLine >= 0 && newLine <= 2,
            s"""bad JSON, invalid "new-line" value: $newLine""")
          val flushSize = jlong(w \ "write-buffer-flush-size", 1048576L)
          cfgRequire(flushSize >= 0L && flushSize <= 1048576L,
            s"""bad JSON, invalid "write-buffer-flush-size" value: $flushSize""")
          Some(FileWriterSpec(
            jstr(w \ "output"), jlong(w \ "max-file-size"),
            newLine, jint(w \ "append", 1) == 1,
            timestampFormat = jstr(w \ "timestamp-format", "%F_%T"),
            writeBufferFlushSize = flushSize))
        case "kafka" =>
          val maxMsgMb = jint(w \ "max-message-mb", 100)
          cfgRequire(maxMsgMb >= 1 && maxMsgMb <= 953, // 8.writer.adoc range
            s"""bad JSON, invalid "max-message-mb" value: $maxMsgMb""")
          Some(KafkaWriterSpec(
            jstr(w \ "brokers"), jstr(w \ "topic"),
            (w \ "properties") match {
              case JObject(fields) =>
                fields.map { case (k, v) => k -> jstr(v, v.toString) }.toMap
              case _ => Map.empty
            },
            maxMessageMb = maxMsgMb, queueSize = queueSize,
            pollIntervalUs = pollUs))
        case t @ ("network" | "zeromq") =>
          Some(NetworkWriterSpec(jstr(w \ "uri"), t,
            queueSize = queueSize, pollIntervalUs = pollUs))
        case "discard" => Some(DiscardWriterSpec)
        case _ => None
      }
    }

    // ----- top-level metrics (OpenLogReplicator.cpp:364-399) --------------
    val metricsConf = (root \ "metrics") match {
      case JObject(_) =>
        val m = root \ "metrics"
        val mType = jstr(m \ "type")
        if (mType.isEmpty) None
        else Some(MetricsConf(mType, jstr(m \ "bind"),
          Prometheus.TagNames.parse(jstr(m \ "tag-names", "none"))))
      case _ => None
    }

    // ----- source.debug (3.debug.adoc) ------------------------------------
    val debugConf = (src \ "debug") match {
      case JObject(_) =>
        val d = src \ "debug"
        Some(DebugConf(
          jlong(d \ "stop-log-switches"),
          jlong(d \ "stop-checkpoints"),
          jlong(d \ "stop-transactions"),
          jstr(d \ "owner"), jstr(d \ "table")))
      case _ => None
    }

    Loaded(
      alias = alias,
      dbName = dbName,
      config = Pipeline.Config(
        source = Pipeline.SourceConfig(path = srcPath,
          startScn = start.scn, startSeq = start.seq,
          startTm = startTmNanos),
        dict = new Dictionary(tables, selectors),
        assembly = TxnAssembly.Config(
          skipXids = skipXids, dumpXids = dumpXids,
          maxBytesPerTxn = txnMaxMb * 1024L * 1024L),
        materialize = materialize,
        envelope = envelope,
        wireFormat = if (fmtType == "protobuf") "proto" else "json",
        messageFull = bit(msgV, 1), // MESSAGE_FORMAT::FULL
        snapshotKeep = state.keepCheckpoints),
      writer = writer,
      metrics = metricsConf,
      debug = debugConf,
      adaptiveSchema = rflag(2),
      rawFlags = flagsV,
      xidFormat = jint(fmt \ "xid"),
      timestampFormat = jint(fmt \ "timestamp"),
      intervalDts = jint(fmt \ "interval-dts"),
      intervalYtm = jint(fmt \ "interval-ytm"),
      dbTimezoneSec = dbTzSec,
      pathMapping = pathMapping,
      readerMode = readerMode,
      redoLogs = redoLogs,
      start = start,
      hostTimezoneSec = hostTzSec,
      logTimezoneSec = logTzSec,
      disableChecks = disableChecks,
      state = state,
      memory = memory)
  }
}
