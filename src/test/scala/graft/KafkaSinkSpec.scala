package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sinks.Sinks

/** W1 Kafka sink: this environment ships no Kafka broker OR client jars
  * (zero-egress, /opt/spark/jars has no spark-sql-kafka/kafka-clients).
  * The connector path (`Sinks.kafkaWriter` → spark-sql-kafka) therefore
  * stays builder-wired only; the wire protocol itself is implemented
  * directly ([[graft.sinks.KafkaWire]], KafkaWireSpec) and drives an
  * end-to-end produce in-process. This spec pins:
  *   1. the writer builder wiring — format, topic, checkpoint, and the
  *      `kafka.*` passthrough the reference applies to librdkafka
  *      properties (WriterKafka.cpp reads its properties straight from
  *      the config object the same way);
  *   2. the delivery contract the sink's exactly-once story rests on —
  *      Structured Streaming checkpointing + idempotent (c_scn, c_idx)
  *      keys — proven across a restart through the same micro-batch
  *      machinery with a producer stand-in (foreachBatch), asserting no
  *      duplicate keys reach the producer when the stream resumes;
  *   3. the same contract over the REAL wire: foreachBatch → the
  *      murmur2-partitioned Produce v3 producer → the CRC-checking
  *      in-process broker, restart included.
  */
class KafkaSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kafkaWriter wires format, topic, checkpoint and kafka.* passthrough") {
    // writeStream needs a streaming frame; rate source never starts here
    val df = spark.readStream.format("rate").load()
      .selectExpr("CAST(value AS STRING) AS key",
        "CAST(value AS STRING) AS value")
    val w = Sinks.kafkaWriter(df, bootstrap = "broker:9092", topic = "redo",
      checkpoint = "/tmp/ck", extra = Map("acks" -> "all",
        "enable.idempotence" -> "true"))
    // DataStreamWriter keeps its config in private fields; reflection is
    // the only read path and pins exactly what start() would hand the sink
    def priv[T](name: String): T = {
      val f = w.getClass.getDeclaredFields
        .find(_.getName.endsWith(name)).get
      f.setAccessible(true)
      f.get(w).asInstanceOf[T]
    }
    assert(priv[String]("source") == "kafka")
    val opts = priv[Map[String, String]]("extraOptions")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("topic") == "redo")
    assert(opts("checkpointLocation") == "/tmp/ck")
    // librdkafka-style property passthrough gets the kafka. prefix
    assert(opts("kafka.acks") == "all")
    assert(opts("kafka.enable.idempotence") == "true")
  }

  test("delivery contract: restart resumes after checkpoint, no duplicate keys") {
    implicit val s: SparkSession = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_kafka_twin").toString
    val srcDir = s"$dir/in"
    val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    // producer stand-in: collects (key, value) exactly as the Kafka sink
    // would receive them per batch
    val produced = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    def writeBatch(n: Int, rows: Seq[(Long, Long, String)]): Unit =
      rows.toDF("c_scn", "c_idx", "value").coalesce(1)
        .write.json(s"$srcDir/batch$n")
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema("c_scn LONG, c_idx LONG, value STRING").json(s"$srcDir/*")
        .selectExpr("concat(c_scn, ':', c_idx) AS key", "value")
      val q = in.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r =>
            produced.add((r.getString(0), r.getString(1))))
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    writeBatch(1, Seq((100L, 0L, "a"), (100L, 1L, "b")))
    runOnce()
    // restart sees old + new source files; the checkpoint must skip the
    // already-produced batch — the reference's resume-after-confirm
    writeBatch(2, Seq((101L, 0L, "c")))
    runOnce()
    val keys = produced.toArray.map(_.asInstanceOf[(String, String)]._1).toSeq
    assert(keys.sorted == Seq("100:0", "100:1", "101:0"))
    assert(keys.distinct.size == keys.size, s"duplicate produce: $keys")
  }

  test("delivery contract over the real wire: stream → Produce v3 → " +
    "broker, restart without duplicates") {
    implicit val s: SparkSession = spark
    import s.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = Files.createTempDirectory("graft_kafka_wire").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val broker = new graft.sinks.MockKafkaBroker
    try {
      def writeBatch(n: Int, rows: Seq[(Long, Long, String)]): Unit =
        rows.toDF("c_scn", "c_idx", "value").coalesce(1)
          .write.json(s"$srcDir/batch$n")
      def runOnce(): Unit = {
        val in = spark.readStream
          .schema("c_scn LONG, c_idx LONG, value STRING").json(s"$srcDir/*")
          .selectExpr("concat(c_scn, ':', c_idx) AS key", "value")
        val port = broker.port
        val q = in.writeStream
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows = batch.collect()
              .map(r => (r.getString(0).getBytes(UTF_8),
                r.getString(1).getBytes(UTF_8))).toSeq
            if (rows.nonEmpty) {
              val w = new graft.sinks.KafkaDirectWriter(
                "127.0.0.1", port, "cdc", numPartitions = 4)
              try w.sendPartitioned(rows) finally w.close()
            }
          }
          .start()
        q.processAllAvailable()
        q.stop()
      }
      writeBatch(1, Seq((100L, 0L, "a"), (100L, 1L, "b"), (100L, 2L, "c")))
      runOnce()
      writeBatch(2, Seq((101L, 0L, "d")))
      runOnce()
      val got = broker.records
      val keys = got.map(r => new String(r._3, UTF_8))
      assert(keys.sorted == Seq("100:0", "100:1", "100:2", "101:0"))
      assert(keys.distinct.size == keys.size, s"duplicate produce: $keys")
      // every record landed on its murmur2 partition
      got.foreach { case (_, p, k, _) =>
        assert(p == graft.sinks.KafkaWire.partitionFor(k, 4))
      }
    } finally broker.close()
  }

  test("routed delivery across a 2-broker cluster with a MID-STREAM " +
      "leader change: every record on its leader, no duplicates") {
    // The full librdkafka shape under Structured Streaming: foreachBatch
    // discovers leaders via Metadata, routes per murmur2 partition, and
    // a leader reassignment BETWEEN micro-batches is absorbed by the
    // NOT_LEADER → refresh → re-route path, invisibly to the stream.
    implicit val s: SparkSession = spark
    import s.implicits._
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = Files.createTempDirectory("graft_kafka_routed").toString
    val srcDir = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val cluster = new graft.sinks.MockKafkaCluster(
      numBrokers = 2, numPartitions = 2)
    try {
      def writeBatch(n: Int, rows: Seq[(Long, Long, String)]): Unit =
        rows.toDF("c_scn", "c_idx", "value").coalesce(1)
          .write.json(s"$srcDir/batch$n")
      def runOnce(): Unit = {
        val in = spark.readStream
          .schema("c_scn LONG, c_idx LONG, value STRING").json(s"$srcDir/*")
          .selectExpr("concat(c_scn, ':', c_idx) AS key", "value")
        val port = cluster.brokers(0).port
        val q = in.writeStream
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows = batch.collect()
              .map(r => (r.getString(0).getBytes(UTF_8),
                r.getString(1).getBytes(UTF_8))).toSeq
            if (rows.nonEmpty) {
              val w = new graft.sinks.KafkaRoutedWriter(
                "127.0.0.1", port, "cdc")
              try { w.sendPartitioned(rows); () } finally w.close()
            }
          }
          .start()
        q.processAllAvailable()
        q.stop()
      }
      writeBatch(1, (0 until 8).map(i => (100L, i.toLong, s"v$i")))
      runOnce()
      // leadership flips between micro-batches (broker failover)
      cluster.reassignLeader(0, 1)
      cluster.reassignLeader(1, 0)
      writeBatch(2, (0 until 8).map(i => (101L, i.toLong, s"w$i")))
      runOnce()
      val got = cluster.records
      val keys = got.map(r => new String(r._3, UTF_8))
      assert(keys.sorted ==
        ((0 until 8).map(i => s"100:$i") ++
          (0 until 8).map(i => s"101:$i")).sorted)
      assert(keys.distinct.size == keys.size, s"duplicate produce: $keys")
      // every record sits on the broker that led its partition WHEN
      // produced: batch-1 rows on p%2, batch-2 rows on the flipped map
      cluster.brokers.zipWithIndex.foreach { case (b, bid) =>
        b.records.foreach { case (_, p, k, _) =>
          val scn = new String(k, UTF_8).takeWhile(_ != ':')
          assert(graft.sinks.KafkaWire.partitionFor(k, 2) == p)
          if (scn == "100") assert(p % 2 == bid,
            s"batch-1 record on wrong broker: p$p on broker $bid")
          else assert((p + 1) % 2 == bid,
            s"batch-2 record on wrong broker after flip: p$p on broker $bid")
        }
      }
    } finally cluster.close()
  }
}
