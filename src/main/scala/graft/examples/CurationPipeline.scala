package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over the `documents` table — the
  * engine's LLM-pipeline operators chained the way a production corpus
  * build would run them, each stage a narrowing of the last:
  *
  *   1. exact dedup      — content-hash first-seen (CorpusIngest's batch
  *                         twin; the streaming path is the same operator)
  *   2. near-dup apply   — MinHash-LSH verified pairs → connected
  *                         components → drop non-canonical members (q80)
  *   3. quality filter   — C4/Gopher-style in-row rule stack
  *   4. balanced sample  — deterministic md5 cap per source (q47/q86
  *                         discipline: reshard- and rerun-safe)
  *   5. write            — cleaned corpus, bucketed by doc_id for
  *                         downstream co-located joins
  *
  * Run: runMain graft.examples.CurationPipeline [sfDir] [outDir]
  * Prints the per-stage funnel; at scale every stage keeps the corpus
  * payload in place (scan-side filters, short-key exchanges only).
  */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("curated").toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master("local[8]").appName("graft-curation")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.tune(spark)

    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    def n(df: DataFrame, stage: String): DataFrame = {
      println(f"$stage%-14s ${df.count()}%7d docs"); df
    }
    n(docs, "input")

    // 1. exact dedup (first-seen by content hash, lowest doc_id wins)
    val exact = graft.streaming.CorpusIngest.firstSeenBatch(
      docs.select(col("doc_id").as("docId"), md5(col("text")).as("hash"),
        col("text")))
      .select(col("docId").as("doc_id"))
      .join(docs, "doc_id")
    n(exact, "exact-dedup")

    // 2. near-dup apply: LSH pairs → components → keep canonical members
    val pairs = graft.queries.TextOps.lshVerifiedPairs(exact)
      .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
    val drops = graft.operators.ConnectedComponents.runPropagation(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val nearDeduped = exact.join(drops, Seq("doc_id"), "left_anti")
    n(nearDeduped, "near-dedup")

    // 3. quality rules, all in-row (no exchange): token-count bounds +
    // mean token length sanity
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val quality = nearDeduped
      .withColumn("n_tokens", size(toks))
      .filter(col("n_tokens").between(5, 100000))
      .filter((col("n_chars") + 1).cast("double") /
        col("n_tokens").cast("double") < 40.0)
      .drop("n_tokens")
    n(quality, "quality")

    // 4. per-source cap via deterministic md5 order (rerun-safe)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val sampled = quality
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 1000).drop("rk")
    n(sampled, "balanced")

    // 5. cleaned corpus, ready for co-located downstream joins
    sampled.write.mode("overwrite").parquet(s"$outDir/documents_curated")
    println(s"curated corpus -> $outDir/documents_curated")
    spark.stop()
  }
}
