package graft.examples

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession
import graft.cdc._
import graft.sinks.{KafkaDirectWriter, MockKafkaBroker, PullClient, PullServer}
import graft.streaming.{Pipeline, Prometheus}

/** Example: the full serving composition in one process — batch-replay a
  * change-event feed through the pipeline, fan the envelope messages out
  * through BOTH delivery paths (the W3 pull server consumed by the
  * StreamClient-style [[PullClient]], and the W1 Kafka wire producer
  * against the in-process broker), with the Prometheus registry counting
  * sends/confirms the way a migrated dashboard would scrape them.
  *
  * Usage: runMain graft.examples.ServeDemo [eventsJsonDir]
  * (with no argument, a 2,000-transaction synthetic feed is generated)
  */
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = args.headOption.getOrElse {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_serve_feed")
      (1 to 2000).flatMap(i => Seq(
        ChangeEvent(i * 10L, s"$i.0.1", Op.Begin),
        ChangeEvent(i * 10L + 1, s"$i.0.1", Op.Ins).copy(obj = 100L,
          after = Map("ID" -> i.toString, "VAL" -> s"v$i")),
        ChangeEvent(i * 10L + 2, s"$i.0.1", Op.Commit)))
        .toDS().coalesce(1).write.mode("overwrite").json(dir.toString)
      dir.toString
    }

    val dict = Dictionary(Seq(
      DbTable(100L, 100L, "OWNER1", "TABLENAME1",
        Seq(DbColumn("ID", 2, numPk = 1), DbColumn("VAL", 1)),
        tagType = "pk")),
      Seq(TableSelector("OWNER1", ".*")))
    val msgs = Pipeline.batch(spark, Pipeline.Config(
      Pipeline.SourceConfig(input), dict))
      .orderBy("c_scn", "c_idx")
      .select("c_scn", "c_idx", "key", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[String]("key")).getOrElse(""),
        r.getAs[String]("value")))
    println(s"[serve] pipeline produced ${msgs.length} messages")

    val prom = new Prometheus()
    prom.setServiceState("replicating")

    // ---- W3: pull server + client ------------------------------------
    val srv = new PullServer("DB1",
      msgs.toIndexedSeq.map { case (s, i, _, v) => (s, i, v.getBytes(UTF_8)) },
      Some(prom))
    val client = new PullClient("127.0.0.1", srv.port, "DB1", "json")
    try {
      val info = client.info()
      client.begin(info, PullClient.StartSpec.parse("now"))
      var n = 0
      client.consume({ _ => n += 1; n < msgs.length }, confirmEvery = 100)
      // confirms are fire-and-forget; let the server drain them
      var (prev, cur) = (srv.confirmed, srv.confirmed)
      val deadline = System.nanoTime() + 3000000000L
      do {
        prev = cur; Thread.sleep(100); cur = srv.confirmed
      } while ((cur != prev || cur.isEmpty) && System.nanoTime() < deadline)
      println(s"[serve] pull client consumed $n messages; " +
        s"server watermark after cadence confirms: $cur")
    } finally { client.close(); srv.close() }

    // ---- W1: Kafka over the wire protocol ----------------------------
    val broker = new MockKafkaBroker
    try {
      val w = new KafkaDirectWriter("127.0.0.1", broker.port, "cdc",
        numPartitions = 4, prom = Some(prom))
      try msgs.grouped(500).foreach { g =>
        w.sendPartitioned(g.toSeq.map { case (_, _, k, v) =>
          (k.getBytes(UTF_8), v.getBytes(UTF_8)) })
      } finally w.close()
      println(s"[serve] kafka broker stored ${broker.records.size} records")
    } finally broker.close()

    println("[serve] prometheus scrape excerpt:")
    prom.render().linesIterator
      .filter(l => l.startsWith("messages_") || l.startsWith("bytes_sent") ||
        l.startsWith("service_state{state=\"replicating\"}"))
      .foreach(l => println("[serve]   " + l))
    spark.stop()
  }
}
