package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Shuffle-budget regression net: pins the number of shuffle Exchanges in
  * the CLUSTER-shaped physical plan (graft.spreadLocal=false, so the
  * local-parallelism repartitions are out of the picture) for the
  * structurally interesting queries. A new Exchange in one of these plans
  * is exactly the "shuffle creep" that stays invisible at sf0.001 and
  * becomes the bottleneck at 100 TB — this spec makes it a test failure
  * with a diff-able number instead of a slow bench three rounds later.
  *
  * Budgets are the CURRENT measured counts (static plan nodes, reused
  * subtrees included), not aspirations: tightening one is a win worth a
  * commit; loosening one needs a written scale argument.
  */
class PlanBudgetSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  // (query, max shuffle exchanges in the cluster-shaped plan)
  private val budgets: Seq[(String, Int)] = Seq(
    "q08_txn_assembly"       -> 2, // xid exchange + commit-order sort
    "q25_dedup_exact"        -> 1, // the hash-groupBy
    "q29_minhash_pairs"      -> 3, // band explode + capped self-join + dedup
    "q31_ann_topk"           -> 1, // per-query top-k only (corpus never shuffles)
    "q43_ann_ivf"            -> 3, // cell join + top-k (assignment is in-row)
    "q50_piece_merge"        -> 2, // xid exchange + spillable sort
    "q55_tfidf_top_term"     -> 1, // ONE doc_id agg (vocab stats are a collect job)
    "q59_simhash_pairs"      -> 3, // 16-bit band join, capped (r5 fix)
    "q80_dedup_apply"        -> 2, // pairs + anti-join; corpus not reshuffled
    "q84_contamination"      -> 2, // span-hash agg + verdict agg (grams broadcast)
    "q90_dup_spans"          -> 2, // span-hash groupBy + span dedup
    "q91_kmeans"             -> 4, // k·d partial-sum update (corpus-size-free)
    "q93_token_rarity"       -> 2, // token df + doc_id agg (df broadcast back)
    "q101_bloom_incremental" -> 2, // bloom agg + verified-new agg
    "q104_ann_pq"            -> 3, // top-k + two 32-row codebook packs
    "q105_bigram_novelty"    -> 1, // bigram df only (scoring is in-row)
    "q106_distinct_sketch"   -> 2, // KMV agg + the countDistinct expand
    "q107_zorder_key"        -> 0, // pure per-row arithmetic
    "q109_bm25_topk"         -> 1, // per-query top-k only (scoring in-row)
    "q112_url_canon"         -> 1, // groupBy on the SHORT canonical key
    "q115_paragraph_dedup"   -> 0, // freq set is a collect job; apply in-row
    "q116_quality_classifier" -> 0, // hashed-weight fold inside the row
    "q117_snapshot_delta"    -> 3, // 2 join-side + status agg (0+1 bucketed)
    "q118_chunk_overlap"     -> 0, // in-row generator
    "q119_lm_perplexity"     -> 0, // LM is a collect artifact; scoring in-row
    "q120_dsir_weight"       -> 0, // 256-bucket model collect; fold in-row
    "q121_train_order"       -> 1, // ONE hash exchange; per-shard local sort
    "q122_ann_recall"        -> 5, // q31 (1) + q43 (3) + 10-row groupBy; compare join broadcasts
    "q123_bpe_learn"         -> 0, // learned merge table is a driver artifact
    "q124_threshold_sweep"   -> 1, // (threshold, partials) agg on 9 keys
    "q125_importance_resample" -> 0, // TakeOrdered top-k; rank window post-limit
    "q126_bpe_encode"        -> 1, // vocab broadcasts back; ONE doc agg
    "q127_blocklist_filter"  -> 0  // suffix set + overlap test in-row
  )

  private def shuffleCount(name: String): Int = {
    val df = SparkEntry.queries(name)(spark, sf)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // tree-section shuffle nodes; "(n) Exchange" detail lines don't match,
    // BroadcastExchange is counted separately (broadcasts are the GOAL)
    "[+:]- Exchange \\(".r.findAllIn(plan).length
  }

  test("cluster-shaped plans stay inside their shuffle budgets") {
    spark.conf.set("graft.spreadLocal", "false")
    try {
      val over = budgets.flatMap { case (name, budget) =>
        val got = shuffleCount(name)
        if (got > budget) Some(s"$name: $got shuffles > budget $budget")
        else None
      }
      assert(over.isEmpty, over.mkString("; "))
    } finally spark.conf.set("graft.spreadLocal", "true")
  }

  test("spread gating: local mode may add exchanges, cluster mode never") {
    spark.conf.set("graft.spreadLocal", "false")
    val cluster = try shuffleCount("q90_dup_spans")
    finally spark.conf.set("graft.spreadLocal", "true")
    val local = shuffleCount("q90_dup_spans")
    assert(cluster <= local,
      s"cluster plan ($cluster) must not out-shuffle local plan ($local)")
  }
}
