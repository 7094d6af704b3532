package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end data SELECTION over a curated corpus — the pack-#4/#5
  * operators chained the way a training run consumes them:
  *
  *   1. importance weights — DSIR hashed-n-gram log-ratios vs the target
  *                           slice (q120's operator)
  *   2. resample           — Gumbel top-k at temperature τ: a
  *                           bit-reproducible weighted sample (q125)
  *   3. tokenizer          — BPE merges learned ON the selected slice,
  *                           then applied to it (q123/q126)
  *   4. shard order        — md5 shard + in-shard rank: the global
  *                           "shuffle" without a global sort (q121)
  *   5. write              — one parquet directory per training shard
  *
  * Run: runMain graft.examples.SelectionPipeline [sfDir] [outDir]
  * Every stage keeps the corpus payload in place: models (DSIR buckets,
  * merge table) are collect-once dimension artifacts, scoring is in-row,
  * and the final write streams each shard independently.
  */
object SelectionPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("selected").toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]").appName("graft-selection")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.tune(spark)

    // 1-2. DSIR weights → Gumbel top-k sample (both oracle-gated ops)
    val sampled = graft.queries.SelectionOps
      .defs("q125_importance_resample")(spark, sfDir)
    println(f"sampled   ${sampled.count()}%7d docs (Gumbel top-k)")

    // 3. learned tokenizer stats on the full corpus, applied per doc
    val encoded = graft.queries.TrainOps
      .defs("q126_bpe_encode")(spark, sfDir)
    val sel = sampled.select("doc_id", "rank")
      .join(encoded, "doc_id")
    println(f"encoded   ${sel.count()}%7d docs (BPE)")

    // 4. deterministic shard + order for the selected slice
    val order = graft.queries.TrainOps
      .defs("q121_train_order")(spark, sfDir)
    val sharded = sel.join(order, "doc_id")
    println(f"sharded   ${sharded.count()}%7d docs")

    // 5. one directory per shard; readers stream shards independently
    sharded.write.mode("overwrite")
      .partitionBy("shard").parquet(s"$outDir/training_shards")
    println(s"training shards -> $outDir/training_shards")
    spark.stop()
  }
}
