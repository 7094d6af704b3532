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

  /** W2 rotation parity (WriterFile.cpp:43-235): the reference rotates the
    * output file by `max-file-size` with a filename mask — `%i` (or zero-
    * filled `%2i`..`%10i`) numbered mode, `%t` timestamp mode, `%s` redo-
    * sequence mode, or no token = single file (append required). A message
    * that would overflow `maxFileSize` closes the current file and opens
    * the next name; numbered mode scans the directory at startup and
    * continues after the highest existing number (append) or starts past
    * it (truncate). Single ordered output stream, like the reference's
    * writer thread — use driver-side inside `foreachBatch`, the same seam
    * as ConfirmTracker below.
    */
  final class RotatingFileWriter(output: String, maxFileSize: Long = 0L,
      append: Boolean = true, newLine: String = "\n",
      clock: () => Long = () => System.currentTimeMillis(),
      prom: Option[graft.streaming.Prometheus] = None,
      /** `timestamp-format`: strftime pattern rendering `%t` (reference
        * default `%F_%T`, 8.writer.adoc) — [[Strftime.format]] over the
        * clock at switch time. */
      timestampFormat: String = "%F_%T",
      /** `write-buffer-flush-size` (8.writer.adoc, reference default
        * 1 MiB): messages accumulate in memory and hit disk when this
        * many bytes are buffered, on rotation, or on [[flush]]. 0 (the
        * constructor default, matching the pre-knob behavior) = every
        * message writes through immediately. */
      flushSize: Long = 0L) {
    import java.nio.file.{Files, Paths, StandardOpenOption}

    private val (dir, mask) = {
      val i = output.lastIndexOf('/')
      if (i >= 0) (output.substring(0, i), output.substring(i + 1))
      else (".", output)
    }
    // (mode, prefix, suffix, zeroFill)
    private val NumTok = "%(10|[2-9])?i".r
    private val (mode, prefix, suffix, fill) =
      NumTok.findFirstMatchIn(mask) match {
        case Some(m) =>
          ("num", mask.substring(0, m.start), mask.substring(m.end),
            Option(m.group(1)).map(_.toInt).getOrElse(1))
        case None if mask.contains("%t") =>
          val p = mask.indexOf("%t")
          ("timestamp", mask.substring(0, p), mask.substring(p + 2), 1)
        case None if mask.contains("%s") =>
          val p = mask.indexOf("%s")
          ("sequence", mask.substring(0, p), mask.substring(p + 2), 1)
        case None =>
          require(!mask.contains("%"),
            s"invalid value for 'output': $output") // ConfigurationException 30005
          require(append,
            s"output file is with no rotation: $output - 'append' must be set") // 30006
          ("single", mask, "", 1)
      }
    require(mode == "single" || maxFileSize > 0,
      s"'max-file-size' must be defined for output with rotation: $output") // 30007

    // numbered mode: continue after the highest existing file number
    private var fileNum: Long =
      if (mode != "num") 0L
      else {
        val existing = Option(new java.io.File(dir).listFiles()).toSeq.flatten
          .filter(_.isFile).map(_.getName)
          .filter(n => n.startsWith(prefix) && n.endsWith(suffix) &&
            n.length > prefix.length + suffix.length)
          .flatMap(n => scala.util.Try(
            n.substring(prefix.length, n.length - suffix.length).toLong).toOption)
        existing.foldLeft(0L)((acc, n) =>
          if (append) math.max(acc, n) else math.max(acc, n + 1))
      }
    private var currentSize = 0L
    private var currentPath: Option[java.nio.file.Path] = None

    private def nameFor(seq: Long): String = mode match {
      case "num" =>
        val s = fileNum.toString
        prefix + ("0" * math.max(0, fill - s.length)) + s + suffix
      case "timestamp" =>
        prefix + Strftime.format(timestampFormat, clock()) + suffix
      case "sequence" => prefix + seq.toString + suffix
      case _ => prefix
    }

    // write-buffer: bytes accepted but not yet on disk (counted in
    // currentSize so rotation sees the true would-be file size)
    private val buf = new java.io.ByteArrayOutputStream()

    private def open(seq: Long): java.nio.file.Path = {
      val np = Paths.get(dir, nameFor(seq))
      currentPath = Some(np)
      currentSize = if (Files.exists(np)) Files.size(np) else 0L
      np
    }

    /** Flush buffered bytes to the current file (also runs before every
      * rotation and should run at end-of-batch from the foreachBatch
      * caller when `flushSize` > 0). */
    def flush(): Unit = if (buf.size() > 0) currentPath.foreach { p =>
      Files.write(p, buf.toByteArray, StandardOpenOption.CREATE,
        StandardOpenOption.APPEND)
      buf.reset()
    }

    /** Append one message (rotating first if it would overflow — including
      * the first write after an append-mode restart into an almost-full
      * file, like the reference's checkFile-before-write). A message
      * larger than maxFileSize still writes into an empty file (the
      * reference warns 60029 and proceeds). */
    def write(msg: String, seq: Long = 0L): Unit = {
      val bytes = (msg + newLine).getBytes("UTF-8")
      val rotatable = mode == "num" || mode == "timestamp"
      var p = currentPath.getOrElse(open(seq))
      if (rotatable && currentSize > 0 &&
          currentSize + bytes.length > maxFileSize) {
        flush() // buffered tail of the outgoing file hits disk first
        if (mode == "num") fileNum += 1
        p = open(seq)
      }
      if (flushSize > 0) {
        buf.write(bytes)
        if (buf.size() >= flushSize) flush()
      } else
        Files.write(p, bytes, StandardOpenOption.CREATE,
          StandardOpenOption.APPEND)
      currentSize += bytes.length
      // a file write is sent AND confirmed at once (the reference's
      // file writer calls confirmMessage right after the write)
      prom.foreach { pm =>
        pm.emitMessagesSent(1); pm.emitBytesSent(bytes.length.toLong)
        pm.emitMessagesConfirmed(1); pm.emitBytesConfirmed(bytes.length.toLong)
      }
    }

    /** Sequence mode: a new redo sequence switches the file (the
      * reference's per-log file). */
    def onSequence(seq: Long): Unit =
      if (mode == "sequence") { flush(); currentPath = None; currentSize = 0 }

    def currentFile: Option[String] = currentPath.map(_.toString)
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

    /** Cumulative ack — confirm EVERY pending id at or below
      * (cScn, cIdx): the network-protocol confirm semantics
      * (WriterStream.cpp:215-217 pops the whole queue prefix ≤ the
      * client's position; StreamClient acks only each 1000th message and
      * relies on exactly this). Per-message [[confirm]] remains for sinks
      * that ack individual deliveries (file/Kafka callbacks). */
    def confirmUpTo(cScn: Long, cIdx: Long): Unit = synchronized {
      val id = (cScn, cIdx)
      pending --= pending.rangeTo(id).toList
      val wm = pending.headOption match {
        case Some(low) => sentLog.maxBefore(low)
        case None => sentMax
      }
      wm.foreach { w =>
        watermark = Some(w)
        sentLog --= sentLog.rangeUntil(w)
      }
    }

    /** The idempotent-restart position: all ids ≤ this are delivered. */
    def confirmed: Option[(Long, Long)] = synchronized { watermark }
    def inflight: Int = synchronized { pending.size }
  }
}
