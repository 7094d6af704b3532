package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.streaming.CorpusIngest
import graft.streaming.CorpusIngest.Doc

/** Streaming first-seen dedup: cross-batch state, in-batch winner rule,
  * restart-without-duplicates, and parity with the batch twin. */
class CorpusIngestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def doc(id: Long, text: String) =
    Doc(id, java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString, text)

  test("cross-batch dedup: later occurrences of a hash never re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = CorpusIngest.firstSeen(in.toDS())
      .writeStream.format("memory").queryName("ingest1")
      .outputMode("append").start()
    try {
      in.addData(doc(1, "alpha"), doc(2, "beta"))
      q.processAllAvailable()
      in.addData(doc(3, "beta"), doc(4, "gamma")) // beta is a dup
      q.processAllAvailable()
      val rows = spark.table("ingest1").collect()
        .map(r => r.getAs[Long]("docId") -> r.getAs[String]("text")).toMap
      assert(rows == Map(1L -> "alpha", 2L -> "beta", 4L -> "gamma"))
    } finally q.stop()
  }

  test("in-batch duplicates: the lowest docId wins deterministically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = CorpusIngest.firstSeen(in.toDS())
      .writeStream.format("memory").queryName("ingest2")
      .outputMode("append").start()
    try {
      in.addData(doc(9, "same"), doc(3, "same"), doc(7, "same"))
      q.processAllAvailable()
      val rows = spark.table("ingest2").collect()
      assert(rows.length == 1 && rows.head.getAs[Long]("docId") == 3L)
    } finally q.stop()
  }

  test("restart from checkpoint: state survives, no duplicate emissions") {
    import spark.implicits._
    // memory sinks can't recover a checkpoint → file source/sink, the
    // f18 (StreamingSpec) restart pattern
    val dir = Files.createTempDirectory("ingest_restart").toString
    val srcDir = s"$dir/docs"; val outDir = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def writeBatch(n: Int, docs: Seq[Doc]): Unit =
      docs.toDS().coalesce(1).write.json(s"$srcDir/batch$n")
    def runOnce(): Unit = {
      val in = spark.readStream
        .schema("docId LONG, hash STRING, text STRING")
        .json(s"$srcDir/*").as[Doc]
      val q = CorpusIngest.firstSeen(in)
        .writeStream.format("json").option("path", outDir)
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      q.stop()
    }
    writeBatch(1, Seq(doc(1, "alpha"), doc(2, "beta")))
    runOnce()
    writeBatch(2, Seq(doc(5, "alpha"), doc(6, "delta"))) // alpha pre-seen
    runOnce()
    val ids = spark.read.json(outDir).collect()
      .map(_.getAs[Long]("docId")).toSet
    assert(ids == Set(1L, 2L, 6L), s"got $ids")
  }

  test("streaming result == batch twin on the same document set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(doc(4, "x"), doc(2, "x"), doc(7, "y"), doc(1, "z"),
      doc(9, "z"), doc(5, "w"))
    val in = MemoryStream[Doc]
    val q = CorpusIngest.firstSeen(in.toDS())
      .writeStream.format("memory").queryName("ingest4")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("ingest4").collect()
        .map(r => (r.getAs[String]("hash"), r.getAs[Long]("docId"))).toSet
      val batch = CorpusIngest.firstSeenBatch(docs.toDF()).collect()
        .map(r => (r.getAs[String]("hash"), r.getAs[Long]("docId"))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("composes with the q101 bloom: history prefiltered, stream deduped") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    GraftExtensions.register(spark)
    // historical corpus → KB-sized bloom over xxhash64(content hash);
    // the stream screens against HISTORY via the broadcast bloom (never
    // joining the corpus) and against ITSELF via firstSeen state
    val history = Seq("old-one", "old-two").toDF("text")
    val bloom = history
      .select(expr("bloom_filter_agg(xxhash64(md5(text)), 10L, 400L)"))
      .collect().head.getAs[Array[Byte]](0)
    val in = MemoryStream[Doc]
    val withBloom = in.toDS()
      .withColumn("seen_hist",
        call_function("bloom_might_contain", lit(bloom),
          xxhash64(col("hash"))))
      .filter(!col("seen_hist")).drop("seen_hist").as[Doc]
    val q = CorpusIngest.firstSeen(withBloom)
      .writeStream.format("memory").queryName("ingest_bloom")
      .outputMode("append").start()
    try {
      in.addData(doc(1, "old-one"), doc(2, "fresh"), doc(3, "fresh"),
        doc(4, "brand-new"))
      q.processAllAvailable()
      val ids = spark.table("ingest_bloom").collect()
        .map(_.getAs[Long]("docId")).toSet
      // old-one: killed by the history bloom (no false negatives);
      // fresh: in-stream dup → lowest id only; brand-new: passes
      assert(ids == Set(2L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("ttl timer contract (TestGroupState): admit → timeout → re-admit") {
    import org.apache.spark.sql.streaming.TestGroupState
    val h = CorpusIngest.firstSeenHandler(1000L) _
    // first sight: admits, arms the timer
    val s1 = TestGroupState.create[Boolean](
      optionalState = org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    val out1 = h("h1", Iterator(doc(5, "alpha"), doc(2, "alpha")), s1).toSeq
    assert(out1.map(_.docId) == Seq(2L)) // lowest docId wins
    assert(s1.exists && s1.get && s1.getTimeoutTimestampMs.isPresent)
    // seen again before the horizon: suppressed
    val s2 = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      500L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    assert(h("h1", Iterator(doc(9, "alpha")), s2).isEmpty)
    // horizon lapses: state removed...
    val s3 = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.of(true), GroupStateTimeout.ProcessingTimeTimeout,
      2000L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = true)
    assert(h("h1", Iterator.empty, s3).isEmpty && s3.isRemoved)
    // ...and the hash re-admits
    val s4 = TestGroupState.create[Boolean](
      org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      2100L, org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    assert(h("h1", Iterator(doc(11, "alpha")), s4).map(_.docId).toSeq == Seq(11L))
  }

  test("withHash(nfcNormalize): precomposed and decomposed forms of the " +
    "same text dedup to one document; raw hashing keeps both") {
    import spark.implicits._
    // same logical string, NFC vs NFD byte forms
    val rows = Seq(
      (1L, "Caf\u00E9 menu"),          // precomposed e-acute
      (2L, "Cafe\u0301 menu")          // e + combining acute
    ).toDF("doc_id", "text")
    val raw = CorpusIngest.firstSeenBatch(
      CorpusIngest.withHash(spark, rows).toDF())
    assert(raw.count() == 2) // byte identity alone keeps both
    val norm = CorpusIngest.firstSeenBatch(
      CorpusIngest.withHash(spark, rows, nfcNormalize = true).toDF())
    val kept = norm.collect()
    assert(kept.length == 1 && kept(0).getAs[Long]("docId") == 1L)
    // emitted text is the ORIGINAL bytes, not the normalized form
    assert(kept(0).getAs[String]("text") == "Caf\u00E9 menu")
  }

  test("CorpusHealth.snapshot matches the gated q195 fit on the same " +
    "corpus and guards the degenerate batch") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").select("doc_id", "text")
    val snap = graft.streaming.CorpusHealth.snapshot(docs).collect()(0)
    val q195 = graft.queries.TextOps.defs("q195_zipf_fit")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(snap.getAs[Long]("vocab_size") == q195.getAs[Long]("vocab_size"))
    assert(snap.getAs[Long]("n_tokens") == q195.getAs[Long]("n_total"))
    assert(snap.getAs[Double]("zipf_slope") == q195.getAs[Double]("zipf_slope"))
    assert(snap.getAs[Double]("heaps_beta") == q195.getAs[Double]("heaps_beta"))
    assert(snap.getAs[Long]("n_docs") == docs.count())
    // degenerate micro-batch: one doc, one token -> NULL fits, no inf/NaN
    val tiny = graft.streaming.CorpusHealth.snapshot(
      Seq((1L, "solo")).toDF("doc_id", "text")).collect()(0)
    assert(tiny.getAs[Long]("vocab_size") == 1L)
    assert(tiny.isNullAt(tiny.fieldIndex("zipf_slope")))
    assert(tiny.isNullAt(tiny.fieldIndex("heaps_beta")))
  }

  test("CorpusHealth.attach: per-micro-batch snapshots equal batch-side " +
    "snapshots of the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.Map[Long, org.apache.spark.sql.Row]()
    val q = graft.streaming.CorpusHealth.attach(
      in.toDS().toDF("doc_id", "text")) {
      (id, row) => seen.synchronized { seen(id) = row }
    }.start()
    try {
      in.addData((1L, "a b b c"), (2L, "a a d"))
      q.processAllAvailable()
      in.addData((3L, "x y"))
      q.processAllAvailable()
    } finally q.stop()
    assert(seen.size == 2)
    val b0 = graft.streaming.CorpusHealth.snapshot(
      Seq((1L, "a b b c"), (2L, "a a d")).toDF("doc_id", "text")).collect()(0)
    assert(seen(0L) == b0)
    val b1 = graft.streaming.CorpusHealth.snapshot(
      Seq((3L, "x y")).toDF("doc_id", "text")).collect()(0)
    assert(seen(1L) == b1)
  }
}
