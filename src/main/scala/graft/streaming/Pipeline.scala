package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.cdc._
import graft.sources.EventSource

/** End-to-end pipeline assembly (SURVEY.md §3.1/§3.2): source → transaction
  * assembly → dictionary materialization → envelope. One declarative DAG —
  * the reference's four threads (reader/parser/builder/writer) become plan
  * stages; its thread-boundary queues become the single shuffle on xid.
  */
object Pipeline {

  case class SourceConfig(
      path: String,
      format: String = "json", // json | parquet
      maxFilesPerTrigger: Int = 100,
      /** reader start position (2.reader.adoc `start-scn`/`start-seq`/
        * `start-time`): drop feed records below the bound before assembly
        * (the reference starts reading redo at that position; for a
        * pre-decoded feed the analogue is a pushdown-friendly filter —
        * plain scn/seq/tm predicates reach the parquet/DSv2 scan).
        * `startTm` is epoch NANOS matched against [[ChangeEvent.tm]]
        * (the reference's TIMESTAMP_TO_SCN needs a live database; a feed
        * carries the record clock instead). None = begin at the feed. */
      startScn: Option[Long] = None,
      startSeq: Option[Long] = None,
      startTm: Option[Long] = None)

  case class Config(
      source: SourceConfig,
      dict: Dictionary,
      assembly: TxnAssembly.Config = TxnAssembly.Config(),
      materialize: Materialize.Options = Materialize.Options(),
      envelope: Envelope.Format = Envelope.Format(),
      /** "json" (W1/W2 text envelope) or "proto" (W3 binary wire format —
        * value column becomes the RedoResponse bytes; chkpt messages are
        * JSON-envelope-only). */
      wireFormat: String = "json",
      /** MESSAGE_FORMAT::FULL: one message per transaction with the DML
        * payload array ([[Envelope.toTxnMessages]]); json wire only. */
      messageFull: Boolean = false,
      /** state element `keep-checkpoints` (11.state.adoc, default 100 —
        * the reference's checkpoint-file retention): how many dictionary
        * snapshots [[streamWithEvolution]] keeps on disk. */
      snapshotKeep: Int = 100)

  /** Apply the configured start position as a source-level filter (plain
    * column predicates → pushed to the scan). Public seam: feed adapters
    * outside this pipeline apply the same bound the same way. */
  def fromStart(events: Dataset[ChangeEvent],
      src: SourceConfig): Dataset[ChangeEvent] = {
    import org.apache.spark.sql.functions.col
    var ds = events
    src.startScn.foreach(b => ds = ds.filter(col("scn") >= b))
    src.startSeq.foreach(b => ds = ds.filter(col("seq") >= b))
    src.startTm.foreach(b => ds = ds.filter(col("tm") >= b))
    ds
  }

  /** Batch replay (entry point B): deterministic input → deterministic
    * output; the golden-test mode. */
  def batch(spark: SparkSession, cfg: Config): DataFrame = {
    implicit val s: SparkSession = spark
    val events = cfg.source.format match {
      case "parquet" => EventSource.batchParquet(spark, cfg.source.path)
      case _ => EventSource.batchJson(spark, cfg.source.path)
    }
    run(fromStart(events, cfg.source), cfg, streaming = false)
  }

  /** Continuous replication (entry point A). */
  def stream(spark: SparkSession, cfg: Config): DataFrame = {
    implicit val s: SparkSession = spark
    val events = EventSource.streamJson(spark, cfg.source.path,
      cfg.source.maxFilesPerTrigger)
    run(fromStart(events, cfg.source), cfg, streaming = true)
  }

  /** §1.2 streaming control path: the SAME stream carries user DML and
    * dictionary DML (system-table rows); both flow through TxnAssembly so
    * only COMMITTED system transactions take effect (SystemTransaction
    * .cpp:729 processCommit). Per micro-batch, `foreachBatch` first folds
    * the batch's system messages into the driver-held dictionary
    * (schema-sized collect), CHECKPOINTS it (before any output, so a
    * crash can never emit against a schema newer than the snapshot),
    * then materializes the user messages — the broadcast dictionary side
    * rebuilds from the refreshed dictionary every batch, and the as-of
    * join still resolves each event against the version valid at ITS
    * scn, so pre-DDL events in the same batch keep the old schema. On
    * restart the dictionary restores from the newest snapshot and
    * replayed system messages are idempotent no-ops.
    *
    * `dictRetentionScns`: when > 0, table versions whose validity closed
    * more than this many scns below the batch's max commit scn are
    * pruned from the LIVE dictionary each batch (snapshots keep full
    * history). Size it above the oldest-open-transaction span — the same
    * contract as the abandoned-transaction TTL — so no in-flight event
    * can outlive the versions it needs. 0 = keep everything. */
  def streamWithEvolution(spark: SparkSession, cfg: Config, dictDir: String,
      checkpointLocation: String, dictRetentionScns: Long = 0L)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    implicit val s: SparkSession = spark
    @volatile var dict =
      SchemaEvolution.restoreLatest(dictDir).getOrElse(cfg.dict)
    val events = EventSource.streamJson(spark, cfg.source.path,
      cfg.source.maxFilesPerTrigger)
    val messages =
      TxnAssembly.assembleStream(fromStart(events, cfg.source), cfg.assembly)
    messages.writeStream
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[ChangeMessage], batchId: Long) =>
        import org.apache.spark.sql.functions.col
        val sysObjs = SchemaEvolution.SystemObjs.toSeq
        val sys = batch.filter(col("obj").isin(sysObjs: _*)).collect()
        val before = dict
        if (sys.nonEmpty)
          dict = SchemaEvolution.applyMessages(dict, sys.toSeq)
        // snapshot on change (before any output - a crash must never
        // have emitted against a schema newer than the newest snapshot);
        // batch 0 always snapshots so restore never falls back to a
        // possibly-stale cfg.dict once the stream has run
        if ((dict ne before) || batchId == 0L)
          SchemaEvolution.checkpoint(dictDir, batchId, dict,
            keep = cfg.snapshotKeep)
        val user = batch.filter(!col("obj").isin(sysObjs: _*))
        val enriched = Materialize(user, dict, cfg.materialize)
        sink(envelopeTail(enriched, cfg, streaming = true), batchId)
        if (dictRetentionScns > 0L) {
          // low-water prune AFTER the sink consumed this batch (history
          // stays durable in snapshots): versions closed more than the
          // retention below THIS batch's max commit scn are unreachable
          // by any future emission — the next batch's events commit
          // above this batch's max scn, so the documented open-txn-span
          // retention contract suffices even for wide catch-up batches
          // (pruning before Materialize could drop versions this batch's
          // earlier-committing events still need when the batch spans
          // more scns than the retention).
          val mx = batch.agg(
            org.apache.spark.sql.functions.max(col("cScn"))).head()
          if (!mx.isNullAt(0))
            dict = dict.pruneBefore(mx.getLong(0) - dictRetentionScns)
        }
      }
      .start()
  }

  /** Shared tail: assembly → materialize → envelope → (key, value, c_scn,
    * c_idx). Works for both batch and streaming inputs (same plan). */
  def run(events: Dataset[ChangeEvent], cfg: Config, streaming: Boolean)(
      implicit spark: SparkSession): DataFrame = {
    val messages =
      if (streaming) TxnAssembly.assembleStream(events, cfg.assembly)
      else TxnAssembly.assembleBatch(events, cfg.assembly)
    val enriched = Materialize(messages, cfg.dict, cfg.materialize)
    envelopeTail(enriched, cfg, streaming)
  }

  /** Envelope stage shared by [[run]] and [[streamWithEvolution]]. */
  private def envelopeTail(enriched: DataFrame, cfg: Config,
      streaming: Boolean): DataFrame = {
    if (cfg.wireFormat == "proto") {
      import org.apache.spark.sql.functions.col
      ProtoEnvelope.toMessages(enriched)
        .select(col("key"), col("value_bin").as("value"),
          col("cScn").as("c_scn"), col("cIdx").as("c_idx"))
    } else {
      val base =
        if (cfg.messageFull) Envelope.toTxnMessages(enriched)
        else Envelope.toMessages(enriched, cfg.envelope)
      val sink = Envelope.forSink(base)
      // chkpt emission is a batch-shape concept (per-LWN ≙ per-batch); in
      // streaming, apply it inside foreachBatch on each micro-batch instead.
      if (cfg.envelope.emitCheckpoint && !streaming)
        Envelope.withCheckpointMessage(sink)
      else sink
    }
  }
}
