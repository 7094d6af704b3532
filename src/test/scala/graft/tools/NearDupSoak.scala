package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.NearDupIngest

/** Throughput/state soak for the streaming near-dup tiers over a
  * synthetic corpus with a controlled near-dup rate.
  *
  *   state tier (default): N docs in B micro-batches through
  *     `signatureVerdicts` on RocksDB state — the claim under test is
  *     FLAT per-batch cost as band-keeper state grows (point lookups,
  *     no index scan). Prints per-batch seconds + docs/s + verdicts.
  *
  *   macro tier (`macro` arg): smaller corpus through `processBatch` —
  *     the claim under test is the HONEST one: per-batch cost grows with
  *     the index (zero-Exchange scan, but O(index) IO), which is why this
  *     tier is for crawl-drop cadence, not per-second triggers.
  *
  * Near-dups: 20% of docs copy an earlier doc's 40 tokens with 2
  * replaced (exact-Jaccard ≈ 0.76, expected slot agreement ≈ 6/8).
  * Seeded RNG → reproducible corpus.
  *
  * Run: sbt "Test/runMain graft.tools.NearDupSoak [nDocs] [nBatches] [macro]"
  */
object NearDupSoak {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val macroTier = args.lift(2).contains("macro")
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("ndsoak_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(42)
    val vocab = (0 until 5000).map(i => s"tok$i").toArray
    val docs = new Array[(Long, String)](nDocs)
    (0 until nDocs).foreach { i =>
      docs(i) =
        if (i > 0 && rnd.nextDouble() < 0.2) {
          // near-dup: copy an earlier doc, replace 2 of its 40 tokens
          val src = docs(rnd.nextInt(i))._2.split(' ')
          val t = src.clone()
          t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.length))
          t(rnd.nextInt(t.length)) = vocab(rnd.nextInt(vocab.length))
          (i.toLong, t.mkString(" "))
        } else
          (i.toLong, Array.fill(40)(vocab(rnd.nextInt(vocab.length)))
            .mkString(" "))
    }
    val perBatch = docs.grouped((nDocs + nBatches - 1) / nBatches).toArray

    if (macroTier) {
      NearDupIngest.ensureIndex(spark, "soak_idx")
      val out = java.nio.file.Files.createTempDirectory("ndsoak_out").toString
      val times = perBatch.zipWithIndex.map { case (b, i) =>
        val t0 = System.nanoTime()
        NearDupIngest.processBatch(spark, b.toSeq.toDF("doc_id", "text"),
          i.toLong, "soak_idx", out)
        (System.nanoTime() - t0) / 1e9
      }
      val kept = spark.read.parquet(s"$out/batch=*").count()
      println(f"""{"soak":"neardup-macro","docs":$nDocs,"batches":$nBatches,""" +
        f""""kept":$kept,"total_s":${times.sum}%.1f,""" +
        f""""docs_per_s":${nDocs / times.sum}%.0f,""" +
        s""""batch_s":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
    } else {
      val in = MemoryStream[(Long, String)]
      val q = NearDupIngest.signatureVerdicts(
        NearDupIngest.withSignatures(in.toDS().toDF("doc_id", "text")))
        .writeStream.format("memory").queryName("ndsoak")
        .outputMode("append").start()
      val t0 = System.nanoTime()
      val times = perBatch.map { b =>
        val tb = System.nanoTime()
        in.addData(b.toSeq)
        q.processAllAvailable()
        (System.nanoTime() - tb) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      val verdicts = spark.table("ndsoak").count()
      val flagged = spark.table("ndsoak")
        .select("docId").distinct().count()
      q.stop()
      println(f"""{"soak":"neardup-state","docs":$nDocs,"batches":$nBatches,""" +
        f""""verdicts":$verdicts,"flagged_docs":$flagged,""" +
        f""""total_s":$total%.1f,"docs_per_s":${nDocs / total}%.0f,""" +
        s""""batch_s":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
