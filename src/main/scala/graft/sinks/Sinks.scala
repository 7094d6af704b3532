package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.functions._

/** Output writers (SURVEY.md §2.8). Exactly-once contract: Structured
  * Streaming checkpointing + idempotent (c_scn, c_idx) keys — a consumer
  * that de-dups on that pair gets the reference's confirm-protocol
  * semantics (Writer.cpp:106-165) without a custom ack queue.
  */
object Sinks {

  /** W2 file sink (batch): JSON-lines, one dir per run; rotation falls out
    * of Spark's per-partition files rather than a size watcher thread. */
  def writeFile(messages: DataFrame, path: String, overwrite: Boolean = true): Unit =
    messages.select(col("value"))
      .write.mode(if (overwrite) "overwrite" else "append").text(path)

  /** W2 file sink (streaming): append-only JSON-lines with checkpointing;
    * restart resumes after the last committed batch (no duplicates). */
  def streamToFile(messages: DataFrame, path: String, checkpoint: String,
      intervalMs: Long = 1000L): StreamingQuery =
    messages.select(col("value"))
      .writeStream.format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()

  /** W1 Kafka writer config: key = tag, value = envelope. Kept as a
    * builder (no broker in the test env); `kafka.*` passthrough matches
    * the reference's librdkafka property passthrough. */
  def kafkaWriter(messages: DataFrame, bootstrap: String, topic: String,
      checkpoint: String, extra: Map[String, String] = Map.empty): DataStreamWriter[Row] = {
    val base = messages
      .select(col("key").cast("string"), col("value").cast("string"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
    extra.foldLeft(base) { case (w, (k, v)) => w.option(s"kafka.$k", v) }
  }

  /** W4 discard sink (benchmarking). */
  def streamToNoop(messages: DataFrame, checkpoint: String): StreamingQuery =
    messages.writeStream.format("noop")
      .option("checkpointLocation", checkpoint).start()

  /** W3/confirm protocol: contiguous-confirm watermark over out-of-order
    * acks (≙ Writer::confirmMessage's min-heap, Writer.cpp:106-165). A
    * network client acks (c_scn, c_idx) in arbitrary order; the confirmed
    * position only advances over a contiguous prefix of the sent sequence,
    * and restart resumes after it (idempotent replay).
    *
    * Driver-side object (the writer thread analogue); per-message work is
    * O(log inflight). Use inside foreachBatch: send → ack → `confirmed`
    * persists as the resume offset.
    */
  final class ConfirmTracker {
    // sentLog: every sent id ≥ the watermark (trimmed as it advances, so
    // memory stays O(inflight)); pending: sent but not yet acked
    private val sentLog = scala.collection.mutable.SortedSet.empty[(Long, Long)]
    private val pending = scala.collection.mutable.SortedSet.empty[(Long, Long)]
    private var sentMax: Option[(Long, Long)] = None
    private var watermark: Option[(Long, Long)] = None

    /** Record a message as sent (must be called in send order). */
    def sent(cScn: Long, cIdx: Long): Unit = synchronized {
      val id = (cScn, cIdx)
      require(sentMax.forall(m => Ordering[(Long, Long)].lt(m, id)),
        s"sends must be ordered: $id after $sentMax")
      sentMax = Some(id)
      sentLog += id
      pending += id
    }

    /** Ack one message; the watermark advances to the highest SENT id
      * strictly below the lowest still-pending send (never a synthesized
      * position, and gap-filling acks advance it past already-confirmed
      * higher ids — the reference's contiguous min-heap confirm,
      * Writer.cpp:106-165). */
    def confirm(cScn: Long, cIdx: Long): Unit = synchronized {
      pending -= ((cScn, cIdx))
      val wm = pending.headOption match {
        case Some(low) => sentLog.maxBefore(low)
        case None => sentMax
      }
      wm.foreach { w =>
        watermark = Some(w)
        // ids below the watermark can never be needed again
        sentLog --= sentLog.rangeUntil(w)
      }
    }

    /** The idempotent-restart position: all ids ≤ this are delivered. */
    def confirmed: Option[(Long, Long)] = synchronized { watermark }
    def inflight: Int = synchronized { pending.size }
  }
}
