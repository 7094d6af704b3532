package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{ConnectedComponents, IvfIndex}

/** Streaming EMBEDDING near-duplicate ingest — the vector twin of
  * [[NearDupIngest]]: micro-batches of (vec_id, embedding) arrive and
  * only vectors that are not cosine-near-duplicates of anything seen
  * before survive, with the persistent [[IvfIndex]] as the seen-corpus
  * structure (the q34/q92 semantics made incremental).
  *
  * Contract (greedy first-seen, mirroring the text tier):
  *   - a vector is DROPPED if its IVF-pruned nearest indexed neighbor
  *     (same frozen-centroid cell — the q43 recall tradeoff) has cosine
  *     ≥ tau, against ANY earlier batch's vector, kept or dropped;
  *   - within a batch, survivors pair inside their cell (cosine ≥ tau),
  *     cluster via connected components, and each cluster keeps its min
  *     vec_id — one-batch stream ≡ the batch cell-local dedup rule;
  *   - ALL batch vectors (kept and dropped) append to the index, so
  *     later arrivals match the full seen corpus.
  *
  * Bootstrap: an IVF index needs centroids, and the centroid row is
  * FROZEN by design (assignment must never drift under ingest) — so the
  * FIRST non-empty batch seeds the index via [[IvfIndex.write]]; a
  * centroid re-seed is [[IvfIndex.write]]'s offline full refresh, like
  * LSH compaction. An empty bootstrap would freeze an empty centroid
  * set and degenerate every later assignment to one cell, which is why
  * this tier has no `ensureIndex`.
  *
  * Restart safety mirrors the text tier's r12 rule: a marker directory
  * per batchId makes the commit idempotent, and the history match
  * excludes the batch's OWN ids from the INDEX side before the rank
  * window ([[IvfIndex.matchIncrement]] `excludeIds`) — a crash between
  * the index append and the marker replays the batch self-indexed at
  * cosine 1.0, which would otherwise both flag every in-batch pair as a
  * history dup AND displace genuine history matches from rank 1.
  * Replay-duplicated index rows are harmless for the dup DECISION (an
  * existence test) and are removed by the next offline compaction.
  * foreachBatch is SERIAL, so only the LATEST batch can ever be
  * uncommitted — a replay never races a later batch's index rows (the
  * self-exclusion guard only ever needs the replaying batch's own ids).
  *
  * Scale shape: only the increment shuffles (one cell exchange); the
  * index side reads bucket-aligned with zero Exchange and grows by
  * bucket-aligned appends; in-batch clustering touches batch-sized
  * frames only.
  */
object VecDupIngest {

  private val cosine = graft.functions.Expressions.cosineSim _

  /** Process one micro-batch of (vec_id, embedding): writes the kept
    * vectors to `outDir/batch=<id>` and indexes the whole batch. Skips
    * if the batch is already committed. */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexName: String, outDir: String, tau: Double = 0.9,
      nProbe: Int = 1): Unit = {
    val marker = new java.io.File(outDir, s"_committed/$batchId")
    if (marker.exists()) return
    val vecs = batch.select(col("vec_id"), col("embedding")).localCheckpoint()
    if (vecs.isEmpty) { marker.mkdirs(); return }
    val bootstrap = !IvfIndex.exists(spark, indexName)
    if (bootstrap) {
      // first non-empty batch seeds the frozen centroids + cells
      IvfIndex.write(spark, vecs, indexName)
    }
    // 1. drop anything cosine-similar to the seen corpus (self-rows
    //    excluded on the index side — the replay guard; on a bootstrap
    //    batch this leaves no candidates, the correct "no history" read).
    //    nProbe widens the history search to the top-P cells — the
    //    measured recall/cost knob (VecDupSoak table in SCALE.md)
    val histDups = IvfIndex
      .matchIncrement(spark, vecs, indexName, topK = 1,
        excludeIds = Some(vecs.select("vec_id")), nProbe = nProbe)
      .filter(col("cos_sim") >= tau)
      .select(col("new_id").as("vec_id")).distinct()
    val survivors = vecs.join(histDups, Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // 2. in-batch: cell-local verified pairs → components → min vec_id
    implicit val s: SparkSession = spark
    val assigned = survivors
      .crossJoin(broadcast(IvfIndex.centsFrame(spark, indexName)))
      .select(graft.operators.IvfIndex.cellOf(col("embedding")).as("cell"),
        col("vec_id"), col("embedding"))
    val pairs = assigned.as("a").join(assigned.as("b"), "cell")
      .filter(col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosine(col("a.embedding"), col("b.embedding")), 6) >= tau)
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
    val drops = ConnectedComponents.runPropagation(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("vec_id"))
    val kept = survivors.join(drops, Seq("vec_id"), "left_anti")
    kept.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // 3. index the WHOLE batch (kept + dropped) for later arrivals —
    //    unless this batch just SEEDED the index (it is already in)
    if (!bootstrap) IvfIndex.append(spark, vecs, indexName)
    marker.mkdirs()
  }

  /** Wire a (vec_id, embedding) stream through [[processBatch]]. */
  def start(stream: DataFrame, indexName: String, outDir: String,
      checkpoint: String, tau: Double = 0.9,
      nProbe: Int = 1): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) =>
        // micro-batch's own session clone: catalog reads and the append
        // invalidation agree on one relation cache (the NearDupIngest rule)
        processBatch(df.sparkSession, df, id, indexName, outDir, tau, nProbe)
      }
      .start()
}
