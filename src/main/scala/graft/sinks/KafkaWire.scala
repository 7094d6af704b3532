package graft.sinks

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket, SocketException, SocketTimeoutException}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.zip.CRC32C
import scala.jdk.CollectionConverters._

/** W1 Kafka delivery over the PUBLIC Kafka wire protocol — no client
  * library. The reference links librdkafka (WriterKafka.cpp:59-88) and
  * lets it speak the protocol; this environment ships neither a broker
  * nor kafka-clients jars, so the protocol layer is implemented directly
  * from the published format (KIP-98 record batch v2; the Kafka protocol
  * guide's Produce v3 schema):
  *
  *   - RecordBatch v2: baseOffset/batchLength/leaderEpoch/magic=2,
  *     CRC32C over attributes..end, zigzag-varint records with
  *     key/value/headers;
  *   - ProduceRequest v3 (header v1): transactional_id, acks, timeout,
  *     [topic → [partition → record set]]; ProduceResponse v3 with
  *     trailing throttle_time_ms;
  *   - the DefaultPartitioner's murmur2 key hash
  *     (`(murmur2(key) & 0x7fffffff) % numPartitions`).
  *
  * [[KafkaDirectWriter]] produces over a plain socket and confirms
  * delivery from the produce response (≙ dr_msg_cb → confirmMessage,
  * WriterKafka.cpp:90-97); [[MockKafkaBroker]] accepts, CRC-checks, and
  * stores batches so the whole path runs end-to-end in-process. Against
  * a real single-broker Kafka the writer works as-is (direct-connect,
  * no metadata discovery); multi-broker leader routing is deployment
  * plumbing a production rollout would add in front of the same wire
  * encoding.
  */
object KafkaWire {

  // ---- primitive codecs -------------------------------------------------
  private[sinks] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[sinks] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private[sinks] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = zigzag(v0)
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7f).toInt)
  }
  private[sinks] def readVarint(buf: ByteBuffer): Long = {
    var x = 0L; var shift = 0
    var more = true
    while (more) {
      val b = buf.get() & 0xff
      x |= (b & 0x7fL) << shift; shift += 7
      more = (b & 0x80) != 0
    }
    unzigzag(x)
  }

  /** Kafka's murmur2 (DefaultPartitioner): seed 0x9747b28c. */
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = 0x9747b28c ^ data.length
    var i = 0
    while (i + 4 <= data.length) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val rem = data.length - i
    if (rem == 3) h ^= (data(i + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(i + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(i) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions

  // ---- RecordBatch v2 ---------------------------------------------------
  case class Record(key: Array[Byte], value: Array[Byte])

  /** Encode one record batch (magic 2). `baseTimestamp` is caller-
    * provided so encoding stays deterministic. */
  def encodeBatch(records: Seq[Record], baseOffset: Long = 0L,
      baseTimestamp: Long = 0L): Array[Byte] = {
    val recs = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) =>
      val body = new ByteArrayOutputStream()
      body.write(0) // record attributes
      writeVarint(body, 0L) // timestampDelta
      writeVarint(body, i.toLong) // offsetDelta
      if (r.key == null) writeVarint(body, -1L)
      else { writeVarint(body, r.key.length.toLong); body.write(r.key) }
      if (r.value == null) writeVarint(body, -1L)
      else { writeVarint(body, r.value.length.toLong); body.write(r.value) }
      writeVarint(body, 0L) // header count
      val b = body.toByteArray
      writeVarint(recs, b.length.toLong)
      recs.write(b)
    }
    val recBytes = recs.toByteArray
    // attributes..end — the CRC32C region
    val tail = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + recBytes.length)
    tail.putShort(0) // attributes: no compression, CreateTime
    tail.putInt(math.max(0, records.size - 1)) // lastOffsetDelta
    tail.putLong(baseTimestamp)
    tail.putLong(baseTimestamp)
    tail.putLong(-1L) // producerId
    tail.putShort(-1) // producerEpoch
    tail.putInt(-1) // baseSequence
    tail.putInt(records.size)
    tail.put(recBytes)
    val tailBytes = tail.array()
    val crc = new CRC32C
    crc.update(tailBytes)
    val head = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4)
    head.putLong(baseOffset)
    head.putInt(4 + 1 + 4 + tailBytes.length) // batchLength after this field
    head.putInt(-1) // partitionLeaderEpoch
    head.put(2.toByte) // magic
    head.putInt(crc.getValue.toInt)
    head.array() ++ tailBytes
  }

  /** Decode a batch; verifies magic and CRC32C (throws on mismatch). */
  def decodeBatch(bytes: Array[Byte]): (Long, Seq[Record]) = {
    val buf = ByteBuffer.wrap(bytes)
    val baseOffset = buf.getLong
    val batchLength = buf.getInt
    require(batchLength == bytes.length - 12,
      s"batch length $batchLength != ${bytes.length - 12}")
    buf.getInt // leader epoch
    val magic = buf.get()
    require(magic == 2, s"unsupported magic $magic")
    val crcStored = buf.getInt
    val region = java.util.Arrays.copyOfRange(bytes, 8 + 4 + 4 + 1 + 4, bytes.length)
    val crc = new CRC32C
    crc.update(region)
    require(crc.getValue.toInt == crcStored,
      f"record batch CRC mismatch: stored 0x$crcStored%08x computed 0x${crc.getValue.toInt}%08x")
    buf.getShort // attributes
    buf.getInt // lastOffsetDelta
    buf.getLong; buf.getLong // timestamps
    buf.getLong; buf.getShort; buf.getInt // producer id/epoch/seq
    val n = buf.getInt
    val out = (0 until n).map { _ =>
      val len = readVarint(buf).toInt
      val end = buf.position() + len
      buf.get() // attributes
      readVarint(buf) // tsDelta
      readVarint(buf) // offsetDelta
      val kl = readVarint(buf).toInt
      val key = if (kl < 0) null else { val a = new Array[Byte](kl); buf.get(a); a }
      val vl = readVarint(buf).toInt
      val value = if (vl < 0) null else { val a = new Array[Byte](vl); buf.get(a); a }
      val hn = readVarint(buf).toInt
      require(hn == 0, "headers unsupported in this decoder")
      require(buf.position() == end, "record length mismatch")
      Record(key, value)
    }
    (baseOffset, out)
  }

  // ---- Produce v3 request/response -------------------------------------
  private def putString(b: ByteBuffer, s: String): Unit =
    if (s == null) b.putShort(-1)
    else { val x = s.getBytes(UTF_8); b.putShort(x.length.toShort); b.put(x) }
  private def getString(b: ByteBuffer): String = {
    val n = b.getShort
    if (n < 0) null
    else { val a = new Array[Byte](n); b.get(a); new String(a, UTF_8) }
  }

  /** ProduceRequest v3 for one (topic, partition, batch), header v1. */
  def encodeProduce(correlationId: Int, clientId: String, topic: String,
      partition: Int, batch: Array[Byte], acks: Short = -1,
      timeoutMs: Int = 30000): Array[Byte] = {
    val b = ByteBuffer.allocate(batch.length + topic.length +
      Option(clientId).map(_.length).getOrElse(0) + 64)
    b.putShort(0) // api_key PRODUCE
    b.putShort(3) // api_version
    b.putInt(correlationId)
    putString(b, clientId)
    putString(b, null) // transactional_id
    b.putShort(acks)
    b.putInt(timeoutMs)
    b.putInt(1) // topic array
    putString(b, topic)
    b.putInt(1) // partition array
    b.putInt(partition)
    b.putInt(batch.length) // record set as nullable bytes
    b.put(batch)
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  case class ProduceResult(correlationId: Int, topic: String, partition: Int,
      errorCode: Short, baseOffset: Long)

  /** ProduceResponse v3 (single topic/partition, trailing throttle). */
  def encodeProduceResponse(r: ProduceResult): Array[Byte] = {
    val b = ByteBuffer.allocate(r.topic.length + 64)
    b.putInt(r.correlationId)
    b.putInt(1)
    putString(b, r.topic)
    b.putInt(1)
    b.putInt(r.partition)
    b.putShort(r.errorCode)
    b.putLong(r.baseOffset)
    b.putLong(-1L) // log_append_time
    b.putInt(0) // throttle_time_ms (trailing in produce responses)
    java.util.Arrays.copyOf(b.array(), b.position())
  }

  def decodeProduceResponse(bytes: Array[Byte]): ProduceResult = {
    val b = ByteBuffer.wrap(bytes)
    val corr = b.getInt
    require(b.getInt == 1, "single-topic response expected")
    val topic = getString(b)
    require(b.getInt == 1, "single-partition response expected")
    val partition = b.getInt
    val err = b.getShort
    val baseOffset = b.getLong
    ProduceResult(corr, topic, partition, err, baseOffset)
  }

  private[sinks] def readFrame(in: DataInputStream): Array[Byte] = {
    val n = in.readInt() // Kafka frames are big-endian int32 size prefixed
    val a = new Array[Byte](n)
    in.readFully(a)
    a
  }
  private[sinks] def writeFrame(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length)
    out.write(b)
    out.flush()
  }
}

/** Minimal producer over the wire protocol: batches one `send` into one
  * RecordBatch v2 + ProduceRequest v3, awaits the response, and reports
  * the assigned base offset. Delivery confirmation = the response (the
  * reference's dr_msg_cb seam). */
final class KafkaDirectWriter(host: String, port: Int, topic: String,
    numPartitions: Int = 1, acks: Short = -1,
    clientId: String = "graft-producer",
    prom: Option[graft.streaming.Prometheus] = None) extends AutoCloseable {
  import KafkaWire._

  private val sock = new Socket(host, port)
  private val in = new DataInputStream(sock.getInputStream)
  private val out = new DataOutputStream(sock.getOutputStream)
  private var correlation = 0

  /** Produce one batch of (key, value) pairs to the key-murmur2
    * partition of the FIRST record (one batch = one partition, the
    * librdkafka queue shape); returns the broker-assigned base offset.
    * Throws on a non-zero error code — the caller's confirm seam. */
  def send(records: Seq[(Array[Byte], Array[Byte])],
      baseTimestamp: Long = 0L): Long = {
    require(records.nonEmpty)
    val partition =
      if (records.head._1 == null) 0
      else partitionFor(records.head._1, numPartitions)
    val batch = encodeBatch(records.map { case (k, v) => Record(k, v) },
      baseTimestamp = baseTimestamp)
    correlation += 1
    writeFrame(out, encodeProduce(correlation, clientId, topic, partition, batch, acks))
    prom.foreach { p =>
      p.emitMessagesSent(records.size.toLong)
      p.emitBytesSent(batch.length.toLong)
    }
    val resp = decodeProduceResponse(readFrame(in))
    require(resp.correlationId == correlation,
      s"correlation mismatch: ${resp.correlationId} != $correlation")
    require(resp.errorCode == 0, s"produce failed: error ${resp.errorCode}")
    // the produce ack is the delivery report (dr_msg_cb → confirmMessage)
    prom.foreach { p =>
      p.emitMessagesConfirmed(records.size.toLong)
      p.emitBytesConfirmed(batch.length.toLong)
    }
    resp.baseOffset
  }

  /** Group a mixed-key batch by murmur2 partition and produce one
    * RecordBatch per partition, in ascending partition order (the
    * producer-queue shape librdkafka maintains per partition). */
  def sendPartitioned(records: Seq[(Array[Byte], Array[Byte])],
      baseTimestamp: Long = 0L): Unit =
    records.groupBy { case (k, _) =>
      if (k == null) 0 else partitionFor(k, numPartitions)
    }.toSeq.sortBy(_._1).foreach { case (_, rs) => send(rs, baseTimestamp) }

  def close(): Unit = sock.close()
}

/** In-process single-partition-per-topic broker arm: accepts Produce v3,
  * CRC-verifies every batch, appends records to an in-memory log, and
  * answers with the base offset — enough protocol to drive the producer
  * end-to-end and to assert stored bytes in specs. */
final class MockKafkaBroker extends AutoCloseable {
  import KafkaWire._

  /** (topic, partition, key, value) in append order. */
  val log = new ConcurrentLinkedQueue[(String, Int, Array[Byte], Array[Byte])]()
  @volatile private var running = true
  private val server = new ServerSocket(0, 8,
    java.net.InetAddress.getLoopbackAddress)
  server.setSoTimeout(200)
  def port: Int = server.getLocalPort
  def records: Seq[(String, Int, Array[Byte], Array[Byte])] =
    log.iterator().asScala.toSeq

  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "graft-mock-kafka-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketTimeoutException =>
        case _: SocketException if !running =>
      }
    }
  }, "graft-mock-kafka")
  thread.setDaemon(true)
  thread.start()

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      while (running) {
        val req = ByteBuffer.wrap(readFrame(in))
        val apiKey = req.getShort
        val apiVersion = req.getShort
        val corr = req.getInt
        // client_id (header v1)
        val cidLen = req.getShort
        if (cidLen > 0) req.position(req.position() + cidLen)
        if (apiKey != 0 || apiVersion != 3) {
          // error 35 = UNSUPPORTED_VERSION
          writeFrame(out, encodeProduceResponse(
            ProduceResult(corr, "", 0, 35, -1L)))
        } else {
          val tid = req.getShort // transactional_id
          if (tid > 0) req.position(req.position() + tid)
          req.getShort // acks
          req.getInt // timeout
          req.getInt // topic count (1)
          val tLen = req.getShort
          val tA = new Array[Byte](tLen); req.get(tA)
          val topic = new String(tA, UTF_8)
          req.getInt // partition count (1)
          val partition = req.getInt
          val setLen = req.getInt
          val batch = new Array[Byte](setLen); req.get(batch)
          val resp =
            try {
              val (_, recs) = decodeBatch(batch) // CRC + magic verified
              val baseOffset = log.size().toLong
              recs.foreach(r => log.add((topic, partition, r.key, r.value)))
              ProduceResult(corr, topic, partition, 0, baseOffset)
            } catch {
              // 2 = CORRUPT_MESSAGE
              case _: IllegalArgumentException =>
                ProduceResult(corr, topic, partition, 2, -1L)
            }
          writeFrame(out, encodeProduceResponse(resp))
        }
      }
    } catch {
      case _: java.io.EOFException =>
      case _: SocketException =>
    } finally sock.close()
  }

  def close(): Unit = { running = false; server.close() }
}
