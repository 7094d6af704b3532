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
}
