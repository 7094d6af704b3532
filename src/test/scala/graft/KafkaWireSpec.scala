package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{KafkaDirectWriter, KafkaWire, MockKafkaBroker}
import java.nio.charset.StandardCharsets.UTF_8

/** The W1 Kafka path driven end-to-end over the real wire protocol:
  * RecordBatch v2 encode/decode with CRC32C, murmur2 partitioning
  * pinned to Kafka's published Java-compatibility vectors, Produce v3
  * round trip against the in-process broker, and corrupt-batch
  * rejection. The protocol layer is what the environment's missing
  * broker/client jars previously left unexecuted.
  */
class KafkaWireSpec extends AnyFunSuite {
  import KafkaWire._

  test("murmur2 matches Kafka's Java-compatibility vectors") {
    assert(murmur2("21".getBytes(UTF_8)) == -973932308)
    assert(murmur2("foobar".getBytes(UTF_8)) == -790332482)
    assert(murmur2("a-little-bit-long-string".getBytes(UTF_8)) == -985981536)
    assert(partitionFor("21".getBytes(UTF_8), 8) == 4)
    assert(partitionFor("foobar".getBytes(UTF_8), 8) == 6)
  }

  test("record batch v2 round-trips and CRC32C detects corruption") {
    val recs = Seq(
      Record("k1".getBytes(UTF_8), "v1".getBytes(UTF_8)),
      Record(null, "tombstone-key-null".getBytes(UTF_8)),
      Record("k3".getBytes(UTF_8), null))
    val bytes = encodeBatch(recs, baseOffset = 7L, baseTimestamp = 1234L)
    val (base, got) = decodeBatch(bytes)
    assert(base == 7L && got.size == 3)
    assert(new String(got.head.key, UTF_8) == "k1" &&
      new String(got.head.value, UTF_8) == "v1")
    assert(got(1).key == null && got(2).value == null)
    // flip one payload byte → CRC over attributes..end must fail
    val bad = bytes.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x1).toByte
    val e = intercept[IllegalArgumentException](decodeBatch(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("producer → broker end-to-end: produce, offsets, partitioning, " +
    "delivery metrics") {
    val broker = new MockKafkaBroker
    val prom = new graft.streaming.Prometheus()
    try {
      val w = new KafkaDirectWriter("127.0.0.1", broker.port, "events",
        numPartitions = 8, prom = Some(prom))
      try {
        val off0 = w.send(Seq(
          ("21".getBytes(UTF_8), "a".getBytes(UTF_8)),
          ("21".getBytes(UTF_8), "b".getBytes(UTF_8))))
        assert(off0 == 0L)
        // mixed keys split into per-partition batches
        w.sendPartitioned(Seq(
          ("21".getBytes(UTF_8), "c".getBytes(UTF_8)),
          ("foobar".getBytes(UTF_8), "d".getBytes(UTF_8))))
        val recs = broker.records
        assert(recs.size == 4)
        assert(recs.forall(_._1 == "events"))
        // partition = (murmur2(key) & 0x7fffffff) % 8
        assert(recs.take(3).forall(_._2 == 4)) // "21" → 4
        assert(recs.last._2 == 6) // "foobar" → 6
        assert(new String(recs.last._4, UTF_8) == "d")
        val r = prom.render()
        assert(r.contains("messages_sent 4") &&
          r.contains("messages_confirmed 4"))
      } finally w.close()

      // a corrupt record set is rejected with CORRUPT_MESSAGE (2)
      val raw2 = new java.net.Socket("127.0.0.1", broker.port)
      try {
        val in = new java.io.DataInputStream(raw2.getInputStream)
        val out = new java.io.DataOutputStream(raw2.getOutputStream)
        val batch = encodeBatch(Seq(Record("k".getBytes(UTF_8),
          "v".getBytes(UTF_8))))
        batch(batch.length - 1) = (batch(batch.length - 1) ^ 0x1).toByte
        val req = encodeProduce(99, "c", "events", 0, batch)
        out.writeInt(req.length); out.write(req); out.flush()
        val n = in.readInt()
        val resp = new Array[Byte](n); in.readFully(resp)
        assert(decodeProduceResponse(resp).errorCode == 2)
      } finally raw2.close()
    } finally broker.close()
  }
}
