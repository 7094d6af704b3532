package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.VecMoments

/** Embedding similarity pack over the `embeddings` table (64-dim float vecs).
  *
  * Float parity with the DuckDB oracle: every dot/norm is a sequential
  * left-fold over doubles (`aggregate` in Spark ≙ `list_reduce` in DuckDB),
  * so results are bit-identical — no group-ordering nondeterminism.
  *
  * Scale design: brute-force top-k is the correctness baseline (broadcast the
  * query set, never the corpus); the bucketed variant (q32) is the 100 TB
  * path — candidates are co-partitioned by bucket so the big side shuffles
  * once on a short key instead of cross-joining.
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** q167: hard upper bound on the broadcast anchor set (a contrastive
    * batch size) — the anchor filter is `vec_id % 25 = 0 AND
    * vec_id < 25 * AnchorCap`, so the broadcast side is ≤ AnchorCap rows
    * no matter how large the embeddings corpus grows. */
  private[graft] val AnchorCap = 128L

  /** Left-fold sum of an array<double> column (parity with list_reduce). */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  private def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Same cosine, as a native codegen'd Catalyst expression for the hot
    * ANN path: higher-order functions evaluate interpreted, and a Scala
    * UDF pays boxing + a serialization boundary; the native expression
    * reads floats straight out of Tungsten ArrayData inside whole-stage
    * codegen. Identical left-to-right double accumulation → bit-identical
    * to [[cosine]] and the DuckDB list_reduce oracle
    * (graft.functions.CosineSimilarity, ExpressionsSpec). */
  private val cosineNative = graft.functions.Expressions.cosineSim _

  /** Sign-bucket LSH: signs of the first 4 coordinates (deterministic,
    * portable; random hyperplanes would need engine-specific RNG). */
  private def bucket(a: Column): Column =
    concat((1 to 4).map(i => (element_at(a, i) > 0.0f).cast("int").cast("string")): _*)

  val defs: Map[String, Q] = Map(
    // Pairwise cosine over adjacent vec ids — the scalar primitive.
    // One bucketed-window pass (graft.operators.AdjacentPairs), no
    // self-join: the corpus shuffles once on a dense bucket key.
    "q30_cosine_pairs" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.AdjacentPairs.pairs(e, "vec_id")
        .select(col("vec_id_a"), col("vec_id_b"),
          round(cosine(col("embedding_a"), col("embedding_b")), 6).as("cos_sim"))
    }),

    // Contrastive hard-negative mining: for each anchor (the per-batch
    // anchor set of a contrastive training loop — bounded by batch size,
    // q31's broadcast-dimension rule), the single most-similar vector
    // with a DIFFERENT label. Corpus streams once through the native
    // cosine kernel; the label inequality filters BEFORE the window, so
    // ranked rows are candidates only. Scale path beyond brute force:
    // swap the candidate stream for q43's IVF cells — same downstream.
    // The anchor set is bounded BY CONSTRUCTION (vec_id < 25·AnchorCap ∧
    // vec_id % 25 = 0 → ≤ AnchorCap rows regardless of corpus size), so
    // the broadcast() hint is safe at any scale — a bare modulus filter
    // would grow linearly with the corpus and OOM the broadcast.
    "q167_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val anchors = e.filter(col("vec_id") % 25 === 0 &&
          col("vec_id") < 25L * AnchorCap)
        .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
          col("label").as("a_label"))
      val cand = Tables.spread(e, col("vec_id"))
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("label").as("c_label"))
      val w = Window.partitionBy("a_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      cand.crossJoin(broadcast(anchors))
        .filter(col("c_label") =!= col("a_label"))
        .withColumn("cos_sim", cosineNative(col("a_emb"), col("c_emb")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("a_id"), col("c_id").as("hard_neg_id"),
          round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // Brute-force ANN: top-5 cosine neighbors for a fixed query set.
    // Query side broadcast; corpus streamed once; output ids+rank only
    // (floats stay internal so ranking ties are the only hash risk).
    "q31_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // gated local spread: the corpus arrives as one parquet split; spread
      // the per-row cosine work across cores (no-op under cluster conf —
      // scan splits give the parallelism there, see Tables.spread)
      val cand = Tables.spread(e, col("vec_id"))
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      cand.crossJoin(broadcast(queries))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos_sim", cosineNative(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("q_id", "c_id", "rank")
    }),

    // Bucketed (LSH) ANN: search only within the query's sign-bucket.
    "q32_ann_bucketed" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .withColumn("bucket", bucket(col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("bucket"))
      val cand = e.select(col("vec_id").as("c_id"),
        col("embedding").as("c_emb"), col("bucket"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      cand.join(broadcast(queries), Seq("bucket"))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos_sim", cosineNative(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_id", "c_id", "rank")
    }),

    // IVF ANN: coarse-quantize the corpus to cells (centroids = first 8
    // vectors, deterministic ≙ a trained codebook slot), then search only
    // the query's cell. The 100 TB shape: assignment packs all centroids
    // into ONE broadcast row (q91's discipline) and the argmax-cosine fold
    // runs INSIDE each scanned row — the corpus never shuffles to assign
    // (the former window-on-vec_id formulation re-shuffled the full
    // embedding payload twice); search shuffles on the short cell key only.
    "q43_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val centsPacked = e.filter(col("vec_id") < 8)
        .groupBy().agg(array_sort(collect_list(struct(
          col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))))
          .as("cents"))
      // strict `>` over the cent_id-ascending array == the old
      // (cos desc, cent_id asc) window order: ties keep the lowest id
      val best = aggregate(col("cents"),
        struct(lit(Double.NegativeInfinity).as("cs"), lit(-1L).as("c")),
        (acc, ce) => {
          val csim = cosineNative(col("embedding"), ce.getField("cent_emb"))
          when(csim > acc.getField("cs"),
            struct(csim.as("cs"), ce.getField("cent_id").as("c")))
            .otherwise(acc)
        })
      val assigned = Tables.spread(e, col("vec_id"))
        .crossJoin(broadcast(centsPacked))
        .select(col("vec_id"), col("embedding"), best.getField("c").as("cell"))
      val queries = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("cell"))
      val wTop = Window.partitionBy("q_id")
        .orderBy(col("cos_sim").desc, col("c_id"))
      assigned
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          col("cell"))
        .join(broadcast(queries), Seq("cell"))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos_sim", cosineNative(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 3)
        .select("q_id", "c_id", "rank")
    }),

    // Embedding-cosine near-duplicate detection (adjacent-id candidate
    // set) — same one-pass AdjacentPairs shape as q30.
    "q34_embed_neardup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.AdjacentPairs.pairs(e, "vec_id")
        .withColumn("cos_sim", cosine(col("embedding_a"), col("embedding_b")))
        .filter(col("cos_sim") > 0.2)
        .select(col("vec_id_a"), col("vec_id_b"),
          round(col("cos_sim"), 6).as("cos_sim"))
    }),

    // Deterministic Lloyd k-means (2 assignment passes, 1 centroid update;
    // k = 8 seeded from vec_id 0..7) — the clustering step of
    // cluster-balanced curation / SemDeDup-style semantic dedup. All
    // arithmetic is INTEGER-exact for cross-engine parity: vectors are
    // quantized to round(x·2^20) BIGINTs, squared-L2 distances are BIGINT
    // folds (max 64·(2^22)² < 2^53, no float anywhere), and centroid
    // update is floor(sum/n) on exact sums — ties break to the lowest
    // cluster id. Scale shape: centroids pack into ONE broadcast row and
    // argmin runs INSIDE each row (the corpus never shuffles to assign);
    // the update shuffles (cluster, dim) partial sums — k·d cells,
    // independent of corpus size.
    "q91_kmeans" -> ((s, dir) =>
      kmeansAssign(s, dir).select("vec_id", "cluster", "dist2")),

    // PQ-ANN (product quantization, Jégou et al. TPAMI 2011): the corpus
    // is compressed to M=4 sub-codes — the 64-dim vector splits into four
    // 16-dim subvectors, each quantized against its own 8-entry codebook
    // (seeded from vec_id<8, then ONE integer-exact Lloyd update, the q91
    // discipline generalized per-subspace). Top-k answers by ASYMMETRIC
    // distance: each query precomputes its 4×8 sub-distance table, and a
    // candidate's approximate distance is four table LOOKUPS on its codes
    // — never a 64-dim computation against the raw corpus. The 100 TB
    // shape: the searched representation is 4 small ints per vector (64×
    // smaller than the float payload), codebooks and query tables are
    // broadcast, encode + lookup both run INSIDE the scanned row, the
    // codebook update shuffles only 4·8·16 partial-sum cells, and the
    // only corpus-sized exchange is short (q_id, c_id, dist) rows into
    // the per-query top-k. All arithmetic is BIGINT-exact (2^20
    // quantization, floor(sum/n) update), so the oracle — which computes
    // the same thing relationally, joining codes to the query's table on
    // (m, cluster) and summing over m — matches hash-for-hash.
    "q104_ann_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), quant(col("embedding")).as("q"))
      val c1p = pqTrainCodebook(s, e)
      val enc = Tables.spread(e, col("vec_id")).crossJoin(broadcast(c1p))
        .select(col("vec_id").as("c_id"),
          graft.functions.PqNative.pqEncode(col("q"), col("cents"))
            .as("codes"))
      // asymmetric distance tables: queries stay full-precision
      val qt = e.filter(col("vec_id") < 10).crossJoin(broadcast(c1p))
        .select(col("vec_id").as("q_id"),
          transform(col("cents"), cs => struct(
            cs.getField("m").as("m"),
            cs.getField("cluster").as("cluster"),
            qdist2(slice(col("q"), cs.getField("m") * 16 + 1, lit(16)),
              cs.getField("cent")).as("d"))).as("dtable"))
      val w = Window.partitionBy("q_id").orderBy(col("approx_d"), col("c_id"))
      enc.crossJoin(broadcast(qt))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("approx_d",
          graft.functions.PqNative.adcSum(col("codes"), col("dtable")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("q_id", "c_id", "rank", "approx_d")
    }),

    // Incremental IVF maintenance (operators/IvfIndex — the vector twin
    // of q108's LSH index): the historical 90% of the corpus indexes
    // ONCE (cells bucketed by the in-row frozen-centroid assignment),
    // then the 10% ingest increment assigns against the SAME frozen
    // centroids and meets its cell's members where the index side reads
    // pre-bucketed files with zero Exchange — at 100 TB the historical
    // embeddings never move for an ingest batch, and centroid drift is
    // an explicit rebuild decision, not an ingest side effect.
    // The history BUILD is its own gated query (q214, the q212 pattern):
    // q143 builds only when the dir-keyed index is absent, so its
    // steady-state cost is the per-increment match a production ingest
    // pays — the r10-r13 "q143 fixed-cost floor" ask closed structurally
    // instead of shaving catalog milliseconds.
    "q143_ivf_increment" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(
          s, e.filter(col("vec_id") % 10 =!= 9), name)
      graft.operators.IvfIndex.matchIncrement(
        s, e.filter(col("vec_id") % 10 === 9), name)
    }),

    // The IVF index BUILD gated on its own (the q212 move for the vector
    // side): frozen seed centroids + bucketed cell assignment committed,
    // read back as (vec_id, cell) — the oracle recomputes the argmax-
    // cosine assignment relationally, so a wrong seed order, a broken
    // tie rule, or a lost bucket shows as a hash mismatch.
    "q214_ivf_index_build" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val name = ivfIndexName(dir)
      graft.operators.IvfIndex.write(
        s, e.filter(col("vec_id") % 10 =!= 9), name)
      s.table(s"${name}_cells").select(col("vec_id"), col("cell"))
    }),

    // PQ serving growth under the oracle gate — the q213 lifecycle move
    // for the codes side: build the coarse index + PQ artifacts on the
    // 80% slice (codebook trained THERE and then FROZEN), append the
    // %10==8 increment via pqAppend — new vectors assign against frozen
    // centroids AND encode against the frozen codebook, the production
    // streaming-growth semantics (a per-batch retrain would re-scan
    // history every micro-batch) — then serve the delta over the grown
    // codes table. The oracle trains the codebook on the 80% slice only
    // but encodes/serves ALL history, so a book leaked from the wrong
    // population, a stale-centroid assignment of the increment, or a
    // lost codes append all hash-mismatch.
    // Steady-state accounting (the q143/q191 split discipline): the
    // base build+attach is dir-keyed build-if-missing (its cost is
    // q214's+q220's, gated there); the APPEND path runs every
    // invocation — it IS the semantics under test and is what a
    // production ingest pays per batch — but the increment is
    // REPLAY-DEDUPED first (anti-join against the ids already indexed,
    // the exactly-once ingest discipline): r15 ran the raw append
    // unconditionally and every bench iteration re-appended the same
    // slice, growing the persistent index 1.33× per run — provably
    // output-invariant (min-struct over identical structs) but a
    // linear accounting creep, the q219 failure class. The anti-joined
    // increment is MATERIALIZED before the two-table append (cells
    // first, codes second — a lazy plan would re-evaluate the
    // anti-join AFTER the cells append landed and encode zero codes,
    // the codeless window made permanent).
    "q224_pq_append_match" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = e.filter(col("vec_id") % 10 =!= 9)
      val delta = e.filter(col("vec_id") % 10 === 9)
      val name = "pqa224_v1_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      if (!graft.operators.IvfIndex.exists(s, name) || !pqExists(s, name)) {
        graft.operators.IvfIndex.write(
          s, hist.filter(col("vec_id") % 10 =!= 8), name)
        pqAttach(s, name) // codebook trained on the 80%, then frozen
      }
      val inc = hist.filter(col("vec_id") % 10 === 8)
        .join(s.table(s"${name}_cells").select(col("vec_id")),
          Seq("vec_id"), "left_anti")
        .localCheckpoint()
      if (!inc.isEmpty) pqAppend(s, name, inc)
      adcTop1(s, name, delta)
    }),

    // Multi-probe on the ADC serving path (q225 — the r15 ask): q223
    // added nProbe to the FLAT cosine match; this adds it where
    // production FAISS actually dials it — the PQ path, whose own
    // decomposition (q218) shows coarse-pruning loss as the dominant
    // recall term. The query side explodes ×2 over its top-2 cells by
    // cosine, computes a residual + ADC table PER probed cell, and the
    // min-struct top-1 spans both cells; the stored-codes read stays
    // zero-exchange. The oracle restates probe selection and the
    // cross-cell ADC top-1 relationally, so a wrong probe order, a
    // lost second cell, a per-cell (instead of per-query) top-1, or a
    // residual computed against the wrong cell's centroid all
    // hash-mismatch.
    "q225_multiprobe_adc" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(s, hist, name)
      if (!pqExists(s, name)) pqAttach(s, name)
      adcTop1(s, name, delta, nProbe = 2)
    }),

    // IVF-PQ top-K retrieval (q228): the q216/q225 serving layout with a
    // RANKED result list instead of the dedup decision's top-1 — the
    // k-nearest shape a retrieval/RAG pipeline consumes. Per delta
    // vector, the 3 best stored-code candidates across its top-2 probed
    // cells, ranked (approx_d, old_id). The rank window shuffles only
    // (new_id, cell, old_id, approx_d) short rows — candidates already
    // crossed the cell join as 4-int codes; nothing float-sized moves.
    // Oracle = the multi-probe chain with the top-1 cut widened to 3,
    // so a lost probe, a per-cell window, or a tie-order break all
    // hash-mismatch.
    "q228_ivfpq_topk" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(s, hist, name)
      if (!pqExists(s, name)) pqAttach(s, name)
      val w = Window.partitionBy("new_id")
        .orderBy(col("approx_d"), col("old_id"))
      adcScores(s, name, delta, nProbe = 2)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("new_id", "old_id", "rank", "approx_d")
    }),

    // TWO-STAGE serve under the hash gate (q229): the exact pipeline
    // the streaming ADC tier runs (shortlist by stored codes, then
    // exact-rerank ONLY the shortlist against its float rows) — until
    // now spec-gated only (VecDupIngestSpec parity). Shortlist = ADC
    // top-8 across the top-2 probed cells; rerank = integer squared-L2
    // on the shortlist's 8 float rows fetched by a (cell, old_id)
    // lookup join against the bucketed cells table (the index side
    // stays partitioned by its bucket hash — the lookup never shuffles
    // history); final answer = exact top-3 of the shortlist. The
    // oracle restates shortlist AND rerank relationally, so a
    // too-narrow shortlist read, a lookup that lost rows, or a rerank
    // on approximate distances all hash-mismatch.
    "q229_ivfpq_rerank" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(s, hist, name)
      if (!pqExists(s, name)) pqAttach(s, name)
      val ws = Window.partitionBy("new_id")
        .orderBy(col("approx_d"), col("old_id"))
      val short = adcScores(s, name, delta, nProbe = 2)
        .withColumn("r", row_number().over(ws))
        .filter(col("r") <= 8)
        .select("new_id", "cell", "old_id")
      val oldq = s.table(s"${name}_cells").select(col("cell"),
        col("vec_id").as("old_id"), quant(col("embedding")).as("hq"))
      val newq = delta.select(col("vec_id").as("new_id"),
        quant(col("embedding")).as("q"))
      val wr = Window.partitionBy("new_id").orderBy(col("d2"), col("old_id"))
      short.join(oldq, Seq("cell", "old_id"))
        .join(broadcast(newq), Seq("new_id"))
        .select(col("new_id"), col("old_id"),
          qdist2(col("q"), col("hq")).as("d2"))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 3)
        .select("new_id", "old_id", "rank", "d2")
    }),

    // METADATA-FILTERED serving, per-query predicate (q230): top-3
    // among candidates whose label equals the query's — the tenant/
    // language filter every production vector store serves. The
    // candidate labels come from the cell-colocated _meta table
    // (metaAttach), so the codes⋈meta join is bucket-local and the
    // index side still never shuffles; the equality applies BEFORE the
    // ADC arithmetic. The oracle restates the filter as label joins
    // over the multi-probe chain, so a lost meta row, a stale payload
    // copy, or a filter applied after a shortlist cut all
    // hash-mismatch.
    "q230_filtered_topk" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(
          s, hist.select("vec_id", "embedding"), name)
      if (!pqExists(s, name)) pqAttach(s, name)
      if (!metaExists(s, name)) metaAttach(s, name, hist)
      filteredAdcTopK(s, name, delta, k = 3, nProbe = 2)
    }),

    // SELECTIVITY-ADAPTIVE filtered serving (q231): a constant
    // predicate (label = 3 AND vec_id % 7 = 0, ~1-2% of the index at
    // every SF) dispatches through filteredTopK's strategy switch to
    // the PRE-FILTER branch — eligible ids resolved from the colocated
    // meta table (predicate pushed into its bucketed scan), their float
    // rows fetched by a bucket-local cells⋈meta join, exact integer-L2
    // top-3 against the broadcast queries. The oracle is the exact
    // brute-force restatement over the predicate slice, so the gate
    // fails if the branch ever returns approximate distances, the meta
    // copy drops eligible rows, or the dispatch flips (the dense-branch
    // dispatch and its plan are FilteredAnnSpec's half).
    "q231_filtered_prefilter" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(
          s, hist.select("vec_id", "embedding"), name)
      if (!pqExists(s, name)) pqAttach(s, name)
      if (!metaExists(s, name)) metaAttach(s, name, hist)
      filteredTopK(s, name, delta.select("vec_id", "embedding"),
        col("label") === 3 && col("vec_id") % 7 === 0, k = 3)
    }),

    // SQ8 attach under the hash gate (q232, the q220 move for the
    // scalar-quantized layout): train the per-dim (min, span) book over
    // the index rows, encode every member to d bytes, commit book +
    // bucketed codes, read the STORED codes back. Runs unconditionally
    // — the gate IS the attach (the q219 fixed-cost discipline), so its
    // bench time is the true per-attach cost every run. The gate
    // compares md5 over the comma-joined code list per vector (64
    // columns would be the q220 flatten at this width), so one byte
    // off in any dimension, a wrong span, or a lost bucket
    // hash-mismatches.
    "q232_sq8_attach" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(s, hist, name)
      sqAttach(s, name)
      s.table(s"${name}_sqcodes").select(col("vec_id"), col("cell"),
        md5(concat_ws(",", transform(
          graft.functions.SqNative.sqBytes(col("codes")),
          _.cast("string")))).as("code_md5"))
    }),

    // SQ8 top-k serving (q233): the q228 ranked-list shape over the
    // byte-per-dim codes — candidates cross the probe join as d bytes
    // instead of 64 floats (4× cut) or 4 PQ ints (16× more fidelity;
    // Sq8Spec measures the recall this buys on the regime fixture).
    // The oracle reconstructs every candidate from its integer codes
    // and ranks exactly, so a wrong reconstruction, a lost probe, or a
    // tie-order break all hash-mismatch.
    "q233_sq8_topk" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(s, hist, name)
      if (!sqExists(s, name)) sqAttach(s, name)
      sqTopK(s, name, delta, k = 3, nProbe = 2)
    }),

    // The PRODUCTION-REGIME recall gate (the r15 "what's missing" #1):
    // q222 runs 16 cells against an 8-entry codebook — the INVERTED
    // regime, where the r15 A/B honestly measured raw ≥ residual. This
    // fixture is the regime the residual defense names: 64 cells ≫ the
    // 8-entry codebook, and the within-cell spread is STRUCTURED
    // (8 md5-derived sub-patterns + tiny jitter — regimeVecs), the way
    // real embedding clusters carry low-dimensional internal structure.
    // Here the codebook CAN learn the 8 sub-patterns from residuals
    // (measured sf0.01: pq_cell_hit 44/50) but raw's 8 entries cannot
    // cover 64 centers × 8 sub-patterns (15/50) — the A/B that
    // justifies shipping the residual layout, hash-gated on both arms
    // (q227 is the raw arm) and spec-asserted (RegimeRecallSpec).
    "q226_regime_recall" -> ((s, dir) => {
      val rv = regimeVecs(t(s, dir, "embeddings"))
        .localCheckpoint(true) // fixture computed ONCE (r16: the 64-dim
        // literal-table transform otherwise re-runs on every pass:
        // seeds, assignment write, both recall chains)
      val hist = rv.filter(col("vec_id") % 10 =!= 9)
      val delta = rv.filter(col("vec_id") % 10 === 9)
      graft.operators.IvfIndex.write(s, hist, "q226_idx", k = 64)
      pqAttach(s, "q226_idx")
      recallDecomposed(s, "q226_idx", hist, delta)
    }),

    // The RAW arm of the q226 A/B: identical fixture, identical coarse
    // index (k = 64), identical seed rule — the ONLY difference is the
    // code representation (plain quantized vectors instead of residuals
    // against the probed cell's centroid). Gated so the comparison is
    // bit-pinned in both engines, not a SCALE.md anecdote.
    "q227_regime_raw" -> ((s, dir) => {
      val rv = regimeVecs(t(s, dir, "embeddings"))
        .localCheckpoint(true) // fixture computed ONCE (r16: the 64-dim
        // literal-table transform otherwise re-runs on every pass:
        // seeds, assignment write, both recall chains)
      val hist = rv.filter(col("vec_id") % 10 =!= 9)
      val delta = rv.filter(col("vec_id") % 10 === 9)
      graft.operators.IvfIndex.write(s, hist, "q227_idx", k = 64)
      pqAttach(s, "q227_idx", residual = false)
      recallDecomposed(s, "q227_idx", hist, delta)
    }),

    // Multi-probe IVF match under the oracle gate — the LAST serving
    // knob that was spec-only (IvfIndexSpec/VecDupSoak measured it;
    // nothing hash-verified it): the increment probes its top-2 cells
    // by cosine instead of only the argmax — the standard recall/cost
    // dial that buys back single-probe misses (q190's measured
    // concession) at 2× probe cost. Scale shape unchanged: the
    // increment explodes ×2 BEFORE the cell join (still the small side
    // by construction), the index keeps its zero-exchange bucketed
    // read, and the top-1 max-struct aggregate spans BOTH probed cells
    // per new_id. The oracle restates probe selection (cos desc,
    // cent_id ties) and the cross-cell top-1 relationally, so a wrong
    // probe order, a lost second cell, or a per-cell (instead of
    // per-query) top-1 all hash-mismatch.
    "q223_multiprobe_match" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(
          s, e.filter(col("vec_id") % 10 =!= 9), name)
      graft.operators.IvfIndex.matchIncrement(
        s, e.filter(col("vec_id") % 10 === 9), name, topK = 1, nProbe = 2)
    }),

    // The vec-dedup DECISION as an oracle-gated batch query (the rule
    // VecDupIngest streams): a delta vector is a duplicate iff its
    // IVF-pruned top-1 cosine within the frozen cell reaches tau. tau =
    // 0.3 is CORPUS-CALIBRATED so both branches carry rows on the
    // synthetic embeddings (their max pairwise cosine is ~0.48; real
    // embedding deployments run 0.9+) — the gate pins the rule, the
    // knob carries the semantics.
    "q189_vecdup_batch" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.IvfIndex.write(
        s, e.filter(col("vec_id") % 10 =!= 9), "q189_idx")
      val dups = graft.operators.IvfIndex.matchIncrement(
          s, e.filter(col("vec_id") % 10 === 9), "q189_idx", topK = 1)
        .filter(col("cos_sim") >= 0.3)
        .select(col("new_id").as("vec_id"), lit(1L).as("d"))
      e.filter(col("vec_id") % 10 === 9).select("vec_id")
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), coalesce(col("d"), lit(0L)).as("is_dup"))
    }),

    // The REFINED centroid build gated end-to-end (r13): one Lloyd round
    // over the lowest-id seeds (spherical k-means — cosine argmax
    // assignment, integer-exact 2^20-quantized mean, floor division,
    // dequantized back to float) before the index freezes, then the
    // topK=1 decision match over the refined cells. The oracle restates
    // seed → assign → integer mean → dequantize → reassign → in-cell
    // top-1 relationally, so BOTH the refinement arithmetic (bit-exact
    // float dequantization included) and the max-struct fast path are
    // under the hash gate. Scale: the Lloyd round shuffles k·d partial
    // sums (corpus-size-free); everything else is q143's plan.
    "q193_ivf_refined" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      graft.operators.IvfIndex.write(
        s, e.filter(col("vec_id") % 10 =!= 9), "q193_idx",
        k = 8, refineIters = 1)
      graft.operators.IvfIndex.matchIncrement(
        s, e.filter(col("vec_id") % 10 === 9), "q193_idx", topK = 1)
    }),

    // The RTBF (right-to-be-forgotten) read-back gate — the r13 ask:
    // compact/remove were spec-gated only, so the driver's oracle never
    // covered the index REWRITE path. This is the full operational loop
    // under the hash gate: build on 80% of history, append the rest
    // (multi-file bucket state), REMOVE a takedown set (%20=14), compact
    // the post-delete layout, then run the q189-shape top-1 match over
    // the rewritten index. The oracle restates it as the q143 chain with
    // the candidate side anti-filtered — if remove purged too much, too
    // little, or broke bucket reads, the match hashes differ. Centroids
    // stay frozen through removal (geometry, not storage — the
    // [[graft.operators.IvfIndex.remove]] contract).
    "q213_rtbf_match" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = e.filter(col("vec_id") % 10 =!= 9)
      graft.operators.IvfIndex.write(
        s, hist.filter(col("vec_id") % 10 =!= 8), "q213_idx")
      graft.operators.IvfIndex.append(
        s, hist.filter(col("vec_id") % 10 === 8), "q213_idx")
      graft.operators.IvfIndex.remove(
        s, "q213_idx", e.filter(col("vec_id") % 20 === 14).select("vec_id"))
      graft.operators.IvfIndex.compact(s, "q213_idx")
      graft.operators.IvfIndex.matchIncrement(
        s, e.filter(col("vec_id") % 10 === 9), "q213_idx", topK = 1)
    }),

    // The last index-lifecycle path under the oracle gate (q213 covered
    // remove+compact; this covers REBUILD): a long-running ingest's
    // periodic k-vs-N re-seed — build small (k=8) on 80% of history,
    // append the rest, rebuild at the autoK √N rule from the index's OWN
    // stored vectors (the offline staging-copy path), then the top-1
    // match over the re-seeded cells. The oracle recomputes the √N seed
    // count and the full reassignment relationally, so a wrong dedup of
    // crash-replay rows, a mis-sized k, or a seed-order break all hash-
    // mismatch. At 100 TB this is the operation that keeps per-increment
    // match cost at √N instead of linear (see IvfIndex.autoK).
    "q215_ivf_rebuild" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = e.filter(col("vec_id") % 10 =!= 9)
      // the k=8 build exists only as the index to rebuild FROM (q213
      // covers the append path); rebuild re-seeds at autoK from the
      // index's own stored vectors
      graft.operators.IvfIndex.write(s, hist, "q215_idx", k = 8)
      graft.operators.IvfIndex.rebuild(s, "q215_idx", k = 0)
      graft.operators.IvfIndex.matchIncrement(
        s, e.filter(col("vec_id") % 10 === 9), "q215_idx", topK = 1)
    }),

    // IVF-PQ serving — the production ANN layout (Jégou et al. 2011,
    // the FAISS IVFPQ standard) composed from the two gated halves: the
    // frozen-centroid coarse quantizer (q143's cells, bucketed index
    // side) prunes candidates to one cell, and within the cell the
    // asymmetric-distance computation scores candidates by their
    // STORED 4-subspace RESIDUAL codes (attached once per index state —
    // q220 gates the attach; r14 re-encoded the corpus per query)
    // against the query's in-row distance table — the candidate payload
    // crossing the join is (cell, old_id, 4 ints) instead of 64 floats,
    // the ~30× memory/IO term that makes billion-vector serving
    // possible. All arithmetic BIGINT-exact (2^20 quantization, integer
    // residuals, integer ADC sums), and the oracle restates coarse +
    // residual train/encode + ADC relationally under the hash gate.
    "q216_ivfpq_match" -> ((s, dir) => ivfPqTop1(s, dir)),

    // The PQ ATTACH gated on its own (the q212/q214/q219 fixed-cost
    // ingest class): retrain the residual codebook and rewrite the
    // stored codes UNCONDITIONALLY, read back as one row per index
    // vector with its cell and 4 sub-codes — the oracle recomputes the
    // residuals, the seed rule (8 lowest NON-CENTROID ids: a coarse
    // seed's own residual is identically zero), the one Lloyd round, and
    // the final encode relationally, so a broken residual sign, a
    // degenerate seed, or a lost codebook update all hash-mismatch
    // here, while q216 stays an honest match-only measurement.
    "q220_pq_attach" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(
          s, raw.filter(col("vec_id") % 10 =!= 9), name)
      pqAttach(s, name)
      s.table(s"${name}_pqcodes").select(col("vec_id"), col("cell"),
        element_at(col("codes"), 1).as("c0"),
        element_at(col("codes"), 2).as("c1"),
        element_at(col("codes"), 3).as("c2"),
        element_at(col("codes"), 4).as("c3"))
    }),

    // The q122/q190/q209 discipline applied to IVF-PQ — every index
    // ships with its measured accuracy cost, here DECOMPOSED into its
    // two loss terms per delta vector: cell_old = the exact integer-L2
    // top-1 WITHIN the probed cell (what a lossless in-cell scan would
    // return), true_old = the brute top-1 over ALL history. pq_cell_hit
    // isolates the PQ quantization loss (ADC pick vs in-cell truth);
    // cell_global_hit isolates the coarse-pruning loss (in-cell truth
    // vs global truth). On THIS corpus (near-random vectors, max
    // pairwise cosine ~0.48) both are honestly terrible — 15/50 coarse,
    // 3/50 ADC at sf0.01, UNCHANGED by the r15 residual-encoding
    // upgrade, because within-cell residuals of near-random vectors are
    // themselves near-random: the measured reason IVF-PQ serves real
    // embedding distributions (0.9+ neighbor similarity, clusterable)
    // and is a filter, not a ranker, at low similarity (q209's lesson,
    // reconfirmed). q222 runs this same decomposition on a CLUSTERED
    // fixture where the levels are meaningful and spec-asserted.
    // Brute side is the q31 shape — history scans once and never
    // shuffles, the delta broadcasts, truths are min-struct aggregates
    // (ties to the lowest old_id, matching the ADC window's order).
    "q218_ivfpq_recall" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = raw.filter(col("vec_id") % 10 =!= 9)
      val delta = raw.filter(col("vec_id") % 10 === 9)
      val name = ivfIndexName(dir)
      if (!graft.operators.IvfIndex.exists(s, name))
        graft.operators.IvfIndex.write(s, hist, name)
      if (!pqExists(s, name)) pqAttach(s, name)
      recallDecomposed(s, name, hist, delta)
    }),

    // The q218 decomposition on a CLUSTERABLE fixture (r14 ask #6):
    // q209/q218 run on TESTDATA's near-random vectors (max pairwise
    // cosine ~0.48), where ANY quantized index is a lottery — those
    // gates pin determinism but cannot detect a broken cell assignment
    // or ADC in the regime IVF-PQ exists FOR. This derives a CLUSTERED
    // corpus deterministically from the same vec_ids — 16 md5-derived
    // integer centers (the q206 regenerate-from-nothing move; the k=16
    // seeds are the 16 lowest HIST ids {0..8, 10..16}, so center 9 has
    // no seed and center 0 two — see the clusteredVecs scaladoc; the
    // measured recall levels include that asymmetry) plus small
    // id-keyed arithmetic noise — builds the
    // IVF(k=16) index + residual PQ codes over its history, and reports
    // the same two loss terms. On THIS corpus the gate is SHARP
    // (measured sf0.01: cell_global_hit 50/50, pq_cell_hit well above
    // the random-corpus floor; ClusteredRecallSpec pins the levels), so
    // a wrong tie rule, a degenerate codebook seed, or a broken ADC sum
    // FAILS loudly instead of hiding inside near-random noise.
    "q222_clustered_recall" -> ((s, dir) => {
      val cv = clusteredVecs(t(s, dir, "embeddings"))
        .localCheckpoint(true) // fixture computed ONCE (r16: the 64-dim
        // literal-table transform otherwise re-runs on every pass:
        // seeds, assignment write, both recall chains)
      val hist = cv.filter(col("vec_id") % 10 =!= 9)
      val delta = cv.filter(col("vec_id") % 10 === 9)
      graft.operators.IvfIndex.write(s, hist, "q222_idx", k = 16)
      pqAttach(s, "q222_idx")
      recallDecomposed(s, "q222_idx", hist, delta)
    }),

    // The q122 move applied to the dedup decision: how much does the
    // IVF cell pruning COST against brute-force truth? Per delta vector:
    // its cell-pruned top-1 cosine (q189's evidence) vs the brute-force
    // top-1 over ALL history, and whether the pruned search found the
    // true nearest (cell_hit). Scale shape: the brute side is the q31
    // baseline — history scans once and never shuffles, the delta
    // broadcasts, the top-1 is a max-struct aggregate (no window over
    // the corpus); the IVF side is q189's plan.
    "q190_vecdup_recall" -> ((s, dir) => {
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val hist = e.filter(col("vec_id") % 10 =!= 9)
      val delta = e.filter(col("vec_id") % 10 === 9)
      graft.operators.IvfIndex.write(s, hist, "q190_idx")
      val ivf = graft.operators.IvfIndex
        .matchIncrement(s, delta, "q190_idx", topK = 1)
        .select(col("new_id").as("vec_id"), col("cos_sim").as("ivf_cos"))
      // brute top-1: max over (cos, -old_id) — ties keep the LOWEST old
      // id, matching matchIncrement's (cos desc, old_id asc) order
      val brute = hist
        .crossJoin(broadcast(delta.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"))))
        .select(col("q_id"), round(graft.functions.Expressions
          .cosineSim(col("q_emb"), col("embedding")), 6).as("cos"),
          col("vec_id").as("old_id"))
        .groupBy(col("q_id"))
        .agg(max(struct(col("cos"), (-col("old_id")).as("nid")))
          .getField("cos").as("brute_cos"))
        .select(col("q_id").as("vec_id"), col("brute_cos"))
      delta.select("vec_id")
        .join(ivf, Seq("vec_id"), "left")
        .join(brute, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("ivf_cos"), lit(-1.0)).as("ivf_cos"),
          coalesce(col("brute_cos"), lit(-1.0)).as("brute_cos"),
          (coalesce(col("ivf_cos"), lit(-1.0)) ===
            coalesce(col("brute_cos"), lit(-1.0))).cast("long").as("cell_hit"))
    }),

    "q110_balanced_sample" -> balancedSample,

    // SemDeDup-shaped semantic dedup (Abbas et al. 2023): k-means first,
    // then near-duplicate detection WITHIN each cluster only — the cluster
    // is the candidate-pruning structure, so the corpus is never compared
    // all-pairs. Within a cluster, members chain in vec_id order and each
    // compares to its predecessor (the AdjacentPairs discipline of
    // q26/q30: one window pass, no self-join); cosine above τ marks the
    // later member as a semantic duplicate. Output stays integer-exact —
    // the float cosine is only compared against τ, bit-identically
    // reproducible per the q30/q34 sequential-fold contract.
    "q92_semantic_dedup" -> ((s, dir) => {
      val w = Window.partitionBy("cluster").orderBy("vec_id")
      kmeansAssign(s, dir)
        .join(t(s, dir, "embeddings").select("vec_id", "embedding"), "vec_id")
        .withColumn("prev_id", lag(col("vec_id"), 1).over(w))
        .withColumn("prev_emb", lag(col("embedding"), 1).over(w))
        .withColumn("is_dup",
          when(col("prev_id").isNotNull &&
            cosine(col("embedding"), col("prev_emb")) > 0.2, 1L)
            .otherwise(0L))
        .select(col("vec_id"), col("cluster"), col("prev_id"), col("is_dup"))
    }),

    // kNN label propagation: spread a small seed-labeled set (every 5th
    // vector keeps its curator label) over the unlabeled corpus by
    // majority vote of each target's 3 nearest seeds — the standard
    // cheap-classifier labeling move (domain/quality tags) between
    // clustering (q91) and a trained model. Scale shape: the seed set is
    // a labeled DIMENSION (small by construction — labels are the scarce
    // thing) and broadcasts like q31's query side; the corpus streams
    // once through the in-row cosine kernel, and everything after the
    // rank-≤3 cut is (vec_id, label, count) short rows. The vote window
    // and vote agg both cluster on vec_id, so one exchange serves all
    // three post-cut steps. Ties: (votes desc, label asc) — integer
    // comparisons, engine-independent; neighbor rank ties break on s_id
    // under the q31 float discipline (bit-identical cosine both sides).
    "q146_label_propagation" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val seeds = e.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("s_id"), col("embedding").as("s_emb"),
          col("label").as("s_label"))
      val targets = Tables.spread(e.filter(col("vec_id") % 5 =!= 0), col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      val wk = Window.partitionBy("vec_id")
        .orderBy(col("cos_sim").desc, col("s_id"))
      val wv = Window.partitionBy("vec_id")
        .orderBy(col("n_votes").desc, col("s_label"))
      targets.crossJoin(broadcast(seeds))
        .withColumn("cos_sim", cosineNative(col("embedding"), col("s_emb")))
        .withColumn("r", row_number().over(wk))
        .filter(col("r") <= 3)
        .groupBy(col("vec_id"), col("s_label"))
        .agg(count(lit(1)).cast("int").as("n_votes"))
        .withColumn("rv", row_number().over(wv))
        .filter(col("rv") === 1)
        .select(col("vec_id"), col("s_label").as("pred_label"),
          col("n_votes"))
    }),

    // PCA top principal component by integer-exact power iteration — the
    // dimensionality-reduction primitive an embedding pipeline runs
    // before coarse indexing/visualization. Distribution shape: the
    // sufficient statistics are ONE native vec_moments aggregate over
    // the scan (fixed 2,145-Long state per partition, no row
    // multiplication — the r13 posexplode plan turned 2,000 vectors
    // into 4.2M rows and tripped the ratio gate), the 12-step
    // eigensolve runs on the driver's d×d matrix (4096 cells — a
    // bounded model artifact, the codebook class), and the projection is
    // a second corpus scan folding against the broadcast-literal
    // loading vector in-row. ALL arithmetic is BIGINT-exact:
    // row-count-selected quantization (pcaScale — 2^20 at gate SFs,
    // oracle-mirrored), pmod floor-div for the mean/covariance scaling,
    // and a max-abs renormalization per iteration as floor(w/(s//sc+1))
    // — so the driver loop and the oracle's unrolled recursive CTEs
    // follow bit-identical trajectories (a float norm would make the
    // 12th iterate a last-ulp lottery across engines).
    "q205_pca_power" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings")
      val sc = pcaScale(raw.count())
      val e = raw.select(col("vec_id"), quantAt(col("embedding"), sc).as("q"))
      val (ms, v) = pcaLoadings(e, sc)
      // projection = Σ(q-m)·v = Σq·v - Σm·v: one in-row fold against the
      // literal loading vector minus a driver constant — the final plan
      // is a bare scan, zero exchanges
      val mv = ms.indices.map(i => ms(i) * v(i)).sum
      e.select(col("vec_id"),
        (aggregate(zip_with(col("q"), typedLit(v.toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x) - lit(mv)).as("proj"))
    }),

    // Embedding-distribution DRIFT detection — the corpus-health gate
    // for the vector side (a new crawl/encoder rev whose embeddings
    // moved will poison dedup thresholds and index recall before anyone
    // looks at a query): fit the principal axis on the REFERENCE slice
    // only, project BOTH slices onto it, histogram into 16 integer
    // equi-width bins sized on the reference range, and report per-bin
    // rates + absolute drift. All binning is BIGINT arithmetic (clamped
    // truncating division — identical post-clamp in both engines); the
    // only float math is the fixed-shape per-row rate rounding (the
    // q195 discipline). Shape: the q205 moment pass on the ref slice +
    // one projection scan + a 16-key agg — nothing corpus-quadratic.
    "q210_embedding_drift" -> ((s, dir) => {
      val raw = t(s, dir, "embeddings")
      val isNewRaw = col("vec_id") % 5 === 0
      // scale from the FIT slice's row count (the reference corpus sizes
      // the arithmetic); both slices quantize at the same scale so the
      // projection is comparable
      val sc = pcaScale(raw.filter(!isNewRaw).count())
      val e = raw.select(col("vec_id"), quantAt(col("embedding"), sc).as("q"))
      val isNew = col("vec_id") % 5 === 0
      val (ms, v) = pcaLoadings(e.filter(!isNew), sc)
      val mv = ms.indices.map(i => ms(i) * v(i)).sum
      val proj = e.select(col("vec_id"), isNew.as("is_new"),
        (aggregate(zip_with(col("q"), typedLit(v.toSeq), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x) - lit(mv)).as("proj"))
      val bounds = proj.filter(!col("is_new"))
        .agg(min("proj").as("lo"), max("proj").as("hi"))
      proj.crossJoin(broadcast(bounds))
        .select(col("is_new"),
          greatest(lit(0L), least(lit(15L),
            expr("((proj - lo) * 16) div (hi - lo + 1)"))).as("bin"))
        .groupBy("bin")
        .agg(sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
        .crossJoin(broadcast(proj.groupBy()
          .agg(sum(when(!col("is_new"), 1L).otherwise(0L)).as("t_ref"),
            sum(when(col("is_new"), 1L).otherwise(0L)).as("t_new"))))
        .select(col("bin"), col("n_ref"), col("n_new"),
          round(col("n_ref").cast("double") / col("t_ref"), 6)
            .as("ref_rate"),
          round(col("n_new").cast("double") / col("t_new"), 6)
            .as("new_rate"),
          round(abs(col("n_new").cast("double") / col("t_new") -
            col("n_ref").cast("double") / col("t_ref")), 6).as("drift"))
    }),

    // Sign-random-projection fingerprint (Charikar'02 SimHash for DENSE
    // vectors — the embedding-side sibling of q27's text SimHash): bit b
    // = sign of the projection onto a ±1 hyperplane, 64 bits packed into
    // two 32-bit halves ready for the q201 hamming band join. The
    // hyperplanes are md5-derived (+1 iff the first hex digit of
    // md5('srp|b|j') is 0-7), so BOTH engines regenerate the same matrix
    // from nothing — no side-channel model file — and the BIGINT dot
    // products make every bit deterministic. Shape: the matrix is a
    // 64×64 literal folded in-row against each scanned vector; the plan
    // is a bare scan, zero exchanges, nothing corpus-sized moves. At
    // index time the two halves band into 4×16-bit keys (pigeonhole:
    // any hamming≤3 pair shares a band) — the q201 join, unchanged.
    "q206_srp_fingerprint" -> ((s, dir) =>
      srpHalves(t(s, dir, "embeddings"))),

    // Index-quality gate for the SRP fingerprint — the q122 move applied
    // to q206 (every index here ships with its measured recall): top-3
    // by fingerprint hamming (64 bits, two bit_count(xor) longs, ties to
    // the lowest c_id) against brute-force cosine top-3 truth. Both
    // sides crossJoin a broadcast 10-query probe frame; the payload
    // compared per candidate is 16 BYTES (the two halves) instead of the
    // 64-float vector — the 100 TB argument for fingerprint-first
    // retrieval, here with its accuracy cost pinned by the oracle.
    "q209_srp_recall" -> ((s, dir) => {
      val fps = srpHalves(t(s, dir, "embeddings"))
      val qf = fps.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("h1").as("qh1"),
          col("h2").as("qh2"))
      val w = Window.partitionBy("q_id")
        .orderBy(col("hamming"), col("c_id"))
      val approx = Tables.spread(fps, col("vec_id"))
        .select(col("vec_id").as("c_id"), col("h1"), col("h2"))
        .crossJoin(broadcast(qf))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("hamming",
          bit_count(expr("h1 ^ qh1")) + bit_count(expr("h2 ^ qh2")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= 3)
        .select(col("q_id"), col("c_id"), lit(1L).as("hit"))
      defs("q31_ann_topk")(s, dir).filter(col("rank") <= 3)
        .join(broadcast(approx), Seq("q_id", "c_id"), "left")
        .groupBy("q_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).cast("int").as("n_hit"))
        .select(col("q_id"), col("n_hit"),
          round(col("n_hit") / 3.0, 6).as("recall"))
    })
  )

  /** Largest corpus for which the moment pass is overflow-free at the
    * full 2^20 quantization: Σqᵢqⱼ sums n products of two |q| ≤ X·2^20
    * cells, so with the |x| ≤ 2 data envelope n·(2·2^20)² must stay
    * under 2^63 ⇒ n ≤ 2^21 ≈ 2.1e6. */
  private[graft] val PcaTier1MaxRows = 2000000L

  /** Row-count-selected quantization scale for the PCA kernel (the r13
    * overflow headroom, now code instead of a SCALE.md comment). Tier 1
    * (2^20) is the oracle-pinned gate arithmetic; tier 2 (2^14) keeps
    * the BIGINT second moments exact to n·(2·2^14)² < 2^63 ⇒ n < 2^33 ≈
    * 8.6e9 rows — past any plausible embedding corpus. The DuckDB
    * oracle mirrors the same CASE on count(*) (sqlPcaChain), so the two
    * engines switch tiers together. */
  private[graft] def pcaScale(n: Long): Long =
    if (n <= PcaTier1MaxRows) 1048576L else 16384L

  /** q205/q210 shared kernel: integer-exact top principal component.
    * ONE native `vec_moments` aggregate over `(vec_id, q)` gathers every
    * sufficient statistic — count, per-dim sums, upper-triangle Σqᵢqⱼ —
    * in a fixed 2,145-Long state per partition (map-side mergeable, no
    * row multiplication; the r13 posexplode formulation at ×2,081
    * rows/vector was the round's ratio violation). Centering never
    * touches the corpus — the exact integer identity
    * Σ(x-m)(x-m)ᵀ = Σxxᵀ - m·sᵀ - s·mᵀ + n·m·mᵀ (with m = floor(s/n))
    * reconstructs the centered covariance on the driver from the raw
    * moments (d(d+3)/2 collected cells — a bounded model artifact); 12
    * all-BIGINT power iterations with the floor(w/(max|w|//sc+1))
    * max-abs renorm give a bit-deterministic loading vector. The power
    * pass carries its own exact overflow guard: renorm bounds |v| ≤ sc,
    * so |w| ≤ d·max|cs|·sc is driver-checkable before iterating — when
    * the bound nears 2^63 the covariance is pre-shrunk by a power of
    * two (direction-preserving; never fires at oracle-gated SFs, where
    * the trajectory stays bit-identical to DuckDB's).
    * Returns (means, loadings). */
  private[graft] def pcaLoadings(
      e: DataFrame, sc: Long = 1048576L): (Array[Long], Array[Long]) = {
    val d = 64
    val stats = e.agg(VecMoments(col("q"), d).as("m"))
      .head().getSeq[Long](0).toArray
    val n = stats(0)
    if (n == 0L) return (new Array[Long](d), Array.fill(d)(sc))
    val sums = Array.tabulate(d)(i => stats(1 + i))
    val ms = sums.map(Math.floorDiv(_, n))
    val cs = new Array[Long](d * d)
    var k = 1 + d
    for (i <- 0 until d; j <- i until d) {
      val cov = stats(k) - ms(i) * sums(j) - ms(j) * sums(i) +
        n * ms(i) * ms(j)
      val c = Math.floorDiv(cov, sc)
      cs(i * d + j) = c; cs(j * d + i) = c
      k += 1
    }
    val (ms2, v) = (ms, powerIterate(cs, d, sc))
    (ms2, v)
  }

  /** Driver-side integer power iteration with an exact overflow guard
    * (see [[pcaLoadings]]). Exposed for the overflow-boundary spec. */
  private[graft] def powerIterate(
      cs: Array[Long], d: Int, sc: Long): Array[Long] = {
    val maxCs = math.max(cs.map(math.abs).max, 1L)
    val safeCs = Long.MaxValue / (2L * d * sc)
    var g = 1L
    while (maxCs / g > safeCs) g *= 2L
    val csg = if (g == 1L) cs else cs.map(Math.floorDiv(_, g))
    var v = Array.fill(d)(sc)
    for (_ <- 1 to 12) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => csg(i * d + j) * v(j)).sum)
      val dd = w.map(math.abs).max / sc + 1
      v = w.map(Math.floorDiv(_, dd))
    }
    v
  }

  /** q206/q209 shared kernel: 64-bit sign-random-projection fingerprint
    * as two band-ready 32-bit halves. The ±1 hyperplanes are md5-derived
    * (+1 iff the first hex digit of md5('srp|b|j') is 0-7) so both
    * engines regenerate the same matrix from nothing; dot products and
    * bit packing are BIGINT-exact in-row folds — a bare scan. */
  private[graft] def srpHalves(emb: DataFrame): DataFrame = {
    val d = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(b: Int, j: Int): Long = {
      val h = md.digest(s"srp|$b|$j".getBytes("UTF-8"))
      if (((h(0) >> 4) & 0xf) < 8) 1L else -1L
    }
    val planes: Seq[Seq[Long]] =
      (0 until d).map(b => (0 until d).map(j => sign(b, j)))
    val pw = (0 until 32).map(i => 1L << (31 - i))
    val bits = transform(sequence(lit(0), lit(d - 1)), b =>
      when(aggregate(
        zip_with(col("q"), element_at(typedLit(planes), b + 1),
          (x, sg) => x * sg),
        lit(0L), (acc, x) => acc + x) > 0, 1L).otherwise(0L))
    def half(bs: Column, off: Int): Column =
      aggregate(zip_with(slice(bs, off + 1, 32), typedLit(pw),
        (bit, w) => bit * w), lit(0L), (acc, x) => acc + x)
    emb.select(col("vec_id"), quant(col("embedding")).as("q"))
      .select(col("vec_id"), bits.as("bits"))
      .select(col("vec_id"), half(col("bits"), 0).as("h1"),
        half(col("bits"), 32).as("h2"))
  }

  /** Cluster-balanced sampling — the curation step after q91/q92: cap
    * each k-means cluster at 40 members so no dense region dominates the
    * training mix (the DoReMi/SemDeDup-style balance pass). Selection
    * order inside a cluster is md5(vec_id) — deterministic, reshard- and
    * rerun-safe like q47/q86, and unbiased w.r.t. insertion order. Scale
    * shape: assignment is the q91 broadcast-argmin (corpus never shuffles
    * to assign); the cap is one window per cluster over (cluster, hash,
    * id) triples — `WindowGroupLimit` prunes map-side, so the exchange
    * carries at most what the rank filter keeps per partition. */
  lazy val balancedSample: Q = (s, dir) => {
    val w = Window.partitionBy("cluster")
      .orderBy(col("pick"), col("vec_id"))
    kmeansAssign(s, dir).select("vec_id", "cluster")
      .withColumn("pick", md5(col("vec_id").cast("string")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 40)
      .select(col("vec_id"), col("cluster"), col("rk"))
  }

  /** Shared 2-pass Lloyd assignment (see q91): (vec_id, cluster, dist2). */
  private def kmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), quant(col("embedding")).as("q"))
    val cents0 = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cluster"), col("q").as("cent"))
    val a1 = e.crossJoin(broadcast(pack(cents0)))
      .select(col("vec_id"), col("q"),
        graft.functions.PqNative.nearestCent(col("q"), col("cents"))
          .getField("c").as("cluster"))
    val cents1 = a1
      .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      // floor(sum/n) via INTEGER arithmetic: (s - pmod(s,n)) is exactly
      // divisible, so `div` is exact — no double quotient anywhere, which
      // keeps the integer-exactness claim valid past |sum| = 2^53 (a
      // double floor can land off-by-one there)
      .agg(expr("(sum(v) - pmod(sum(v), count(*))) div count(*)")
        .cast("long").as("cd"))
      .groupBy("cluster")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cd")))),
        x => x.getField("cd")).as("cent"))
    e.crossJoin(broadcast(pack(cents1)))
      .withColumn("best",
        graft.functions.PqNative.nearestCent(col("q"), col("cents")))
      .select(col("vec_id"), col("best").getField("c").as("cluster"),
        col("best").getField("d").as("dist2"))
  }

  /** Dir-keyed warehouse name shared by q214 (build) and q143 (match):
    * persists per corpus so q143's build-if-missing never reads another
    * SF's tables; bump the version on assignment-semantics changes. */
  private def ivfIndexName(dir: String): String =
    "ivf143_v1_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** round(x·2^20) as BIGINT — integer-exact embedding quantization. */
  private def quant(e: Column): Column = quantAt(e, 1048576L)

  /** round(x·sc) as BIGINT at a row-count-selected scale ([[pcaScale]]). */
  private def quantAt(e: Column, sc: Long): Column =
    transform(e, x => round(x.cast("double") * sc.toDouble).cast("long"))

  /** Integer squared-L2 between two quantized vectors (BIGINT fold). */
  private def qdist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (s, d) => s + d)

  /** (m, cluster, cent) codebook rows → ONE row holding the
    * (m, cluster)-sorted array, so PQ encode is a 1-row broadcast and the
    * per-subspace argmin stays inside the scanned row (q91's pack,
    * extended with the subspace key). */
  private def pqPack(cb: DataFrame): DataFrame =
    cb.groupBy().agg(array_sort(collect_list(
      struct(col("m"), col("cluster"), col("cent")))).as("cents"))

  /** The cell's frozen centroid embedding, looked up in-row from the
    * broadcast packed `cents` column (the cells are few; the filter+pick
    * runs inside the scanned row, no join). */
  private def centEmbOf(cell: Column): Column =
    element_at(filter(col("cents"),
      ce => ce.getField("cent_id") === cell), 1).getField("cent_emb")

  /** Per-warehouse cache of the packed 1-row PQ codebook (the
    * IvfIndex.centsCache discipline): the book is a 32-row dimension
    * artifact read by every serving query; [[pqAttach]] is the only
    * mutation and replaces the entry. */
  private val pqBookCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.Row]()

  private def pqCacheKey(s: SparkSession, name: String): String =
    s.conf.get("spark.sql.warehouse.dir") + "#" + name

  /** The cached book ROW, validated against the catalog first: any index
    * mutation DROPS the `_pqbook` table (IvfIndex.dropPq), so a cached
    * row whose table no longer exists is stale and must be evicted —
    * serving correctness must not hang on every caller remembering to
    * re-guard with [[pqExists]] (the r15 implicit-invariant finding). A
    * dropped-then-unattached read then fails loudly instead of serving
    * the dead book. */
  private def pqBookRow(s: SparkSession,
      name: String): org.apache.spark.sql.Row = {
    val key = pqCacheKey(s, name)
    if (!s.catalog.tableExists(s"${name}_pqbook")) pqBookCache.remove(key)
    var row = pqBookCache.get(key)
    if (row == null) {
      row = s.table(s"${name}_pqbook").collect().head
      pqBookCache.put(key, row)
    }
    row
  }

  private def pqBookFrame(s: SparkSession, name: String): DataFrame = {
    val row = pqBookRow(s, name)
    s.createDataFrame(
      java.util.Collections.singletonList(row),
      row.asInstanceOf[org.apache.spark.sql.catalyst.expressions
        .GenericRowWithSchema].schema)
  }

  /** The encoding the stored codes were trained with ("residual" |
    * "raw") — recorded IN the book artifact at attach time, so serving
    * derives the query-side transform from the index state instead of a
    * caller-supplied flag that could disagree with the codes. */
  private def pqEncodingOf(s: SparkSession, name: String): String = {
    val row = pqBookRow(s, name)
    row.getString(row.fieldIndex("enc"))
  }

  /** Both PQ artifacts present (the existsWeighted rule: pqAttach commits
    * two tables; a crash between them must read as absent). */
  private[graft] def pqExists(s: SparkSession, name: String): Boolean =
    s.catalog.tableExists(s"${name}_pqcodes") &&
      s.catalog.tableExists(s"${name}_pqbook")

  /** The quantized RESIDUAL of each index row against its frozen cell
    * centroid — integer differences at the same 2^20 quantization, so
    * every downstream distance stays BIGINT-exact and hash-gateable. */
  private def residualFrame(s: SparkSession, name: String): DataFrame =
    s.table(s"${name}_cells")
      .crossJoin(broadcast(graft.operators.IvfIndex.centsFrame(s, name)))
      .select(col("cell"), col("vec_id"),
        zip_with(quant(col("embedding")), quant(centEmbOf(col("cell"))),
          (x, y) => x - y).as("q"))

  /** Attach the PQ serving artifacts to an existing IVF index (FAISS
    * IVFPQ, Jégou et al. 2011 — now with the standard RESIDUAL encoding,
    * the r14 refinement): train the 4-subspace codebook on the index
    * rows' residuals against their frozen coarse centroids, then commit
    *
    *   - `<name>_pqbook`  — the packed 1-row codebook (4·8 rows of
    *     16 BIGINTs, a dimension artifact, exactly how production PQ
    *     ships codebooks);
    *   - `<name>_pqcodes` — (cell, vec_id, codes): 4 small ints per
    *     vector, bucketed by cell like the cells table, so the serving
    *     join reads it with ZERO index-side exchange and the payload
    *     crossing the join is ~30× smaller than the float vectors.
    *
    * Residual encoding is the FAISS production standard because at
    * real scale (k ≈ √N cells ≫ codebook entries, structured
    * within-cell spread) a raw codebook wastes its entries re-encoding
    * coarse structure the cell id already carries, while residuals hand
    * PQ only the within-cell spread. Measured honestly in BOTH regimes:
    * on near-random vectors any 4×8 code is a lottery (q218: 3/50 both
    * encodings), and on the REGIME fixture the claim names — 64 cells
    * ≫ the 8-entry codebook with codebook-learnable within-cell
    * structure (regimeVecs) — residual wins 44/50 vs raw's 15/50
    * (RegimeRecallSpec pins the A/B; q226/q227 hash-gate both chains).
    * Codebook seeds are the 8 lowest index ids that are NOT coarse
    * centroids — a centroid row's residual against itself is
    * identically zero, so centroid seeds would coincide at the origin
    * and collapse every code to cluster 0 (at k > 8 the old
    * `vec_id ≥ 8` rule silently seeded exactly that degenerate book —
    * the r15 q222 A/B ran it, which is why residual "lost" there).
    * The exclusion applies to BOTH encodings so the A/B differs only
    * in the representation.
    *
    * Trained once per index state: any IvfIndex mutation drops these
    * tables (see IvfIndex.write/append/remove/compact) and the serving
    * query's attach-if-missing guard retrains — codes are never
    * recomputed per query (the r14 full-corpus-re-encode finding). */
  private[graft] def pqAttach(s: SparkSession, name: String,
      residual: Boolean = true): Unit = {
    Seq(s"${name}_pqcodes", s"${name}_pqbook")
      .foreach(graft.core.Tables.dropTableFast(s, _))
    val res = if (residual) residualFrame(s, name)
      else s.table(s"${name}_cells")
        .select(col("cell"), col("vec_id"), quant(col("embedding")).as("q"))
    val centIds = graft.operators.IvfIndex.centIds(s, name)
    val book = pqTrainCodebook(s, res.select(col("vec_id"), col("q")),
        seedSel = _.filter(!col("vec_id").isin(centIds: _*))
          .orderBy("vec_id").limit(8))
      .withColumn("enc", lit(if (residual) "residual" else "raw"))
    val bookRow = book.collect().head
    pqBookCache.put(pqCacheKey(s, name), bookRow)
    val bookLocal = s.createDataFrame(
      java.util.Collections.singletonList(bookRow),
      bookRow.asInstanceOf[org.apache.spark.sql.catalyst.expressions
        .GenericRowWithSchema].schema)
    val buckets = s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_cells"))
      .bucketSpec.map(_.numBuckets).getOrElse(16)
    // book first, codes second, sequentially: the codes write dominates
    // wall time anyway, and a crash between the two reads as absent via
    // pqExists (requires BOTH tables) — the r15 Future/Await overlap
    // bought nothing and added a concurrent-catalog-write race surface
    bookLocal.write.saveAsTable(s"${name}_pqbook")
    graft.core.Tables.writeBucketed(
      res.crossJoin(broadcast(bookLocal.select(col("cents"))))
        .select(col("cell"), col("vec_id"),
          graft.functions.PqNative.pqEncode(col("q"), col("cents"))
            .as("codes"))
        .repartition(buckets, col("cell")),
      s"${name}_pqcodes", "cell", buckets)
  }

  /** Append an increment to BOTH the coarse index and its PQ serving
    * artifacts — the streaming-growth path for a PQ-served index (q224):
    * new vectors assign against the FROZEN centroids (IvfIndex.append)
    * and encode against the FROZEN codebook — the same frozen-artifact
    * discipline the coarse side already follows; codebook drift, like
    * centroid drift, is a rebuild/attach decision, never an ingest side
    * effect (at 100 TB a per-batch retrain would re-scan history every
    * micro-batch). Cells append first, codes second: a crash between
    * the two leaves the appended vectors CODELESS — a bounded recall
    * loss (they vanish from ADC serving; never a wrong match), visible
    * as a cells-vs-pqcodes count gap and healed by [[pqAttach]] — the
    * LshIndex.remove retry-to-completion contract. */
  private[graft] def pqAppend(s: SparkSession, name: String,
      newVecs: DataFrame): Unit = {
    require(pqExists(s, name), s"$name has no PQ artifacts to append to")
    graft.operators.IvfIndex.append(s, newVecs, name, keepPq = true)
    appendCodes(s, name, newVecs)
  }

  /** Encode `vecs` (vec_id, embedding) against `name`'s FROZEN centroids
    * + FROZEN codebook (whichever encoding the book records) and append
    * the codes bucket-aligned — the shared tail of [[pqAppend]] and
    * [[pqHeal]]. */
  private def appendCodes(s: SparkSession, name: String,
      vecs: DataFrame): Unit = {
    val buckets = s.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        s"${name}_pqcodes"))
      .bucketSpec.map(_.numBuckets).getOrElse(16)
    val assigned = vecs
      .crossJoin(broadcast(graft.operators.IvfIndex.centsFrame(s, name)))
      .select(col("vec_id"), col("cents"),
        graft.operators.IvfIndex.cellOf(col("embedding")).as("cell"),
        quant(col("embedding")).as("q"))
    val rq =
      if (pqEncodingOf(s, name) == "residual")
        assigned.select(col("cell"), col("vec_id"),
          zip_with(col("q"), quant(centEmbOf(col("cell"))),
            (x, y) => x - y).as("rq"))
      else assigned.select(col("cell"), col("vec_id"), col("q").as("rq"))
    val codes = rq
      .crossJoin(broadcast(pqBookFrame(s, name).select(col("cents"))))
      .select(col("cell"), col("vec_id"),
        graft.functions.PqNative.pqEncode(col("rq"), col("cents"))
          .as("codes"))
      .repartition(buckets, col("cell"))
    graft.core.Tables.appendBucketed(codes, s"${name}_pqcodes", "cell",
      buckets)
    s.catalog.refreshTable(s"${name}_pqcodes")
  }

  /** Heal the [[pqAppend]] crash window: cells append first, codes
    * second, so a crash between the two leaves the appended vectors
    * CODELESS — present in `<name>_cells` but absent from
    * `<name>_pqcodes`, a silent recall loss at serving time (they
    * vanish from ADC candidate sets; never a wrong match). This finds
    * the gap by anti-join, re-encodes the missing vectors against the
    * FROZEN book, and appends their codes — idempotent (zero rows when
    * the artifacts agree), crash-replay-safe (a duplicate code row
    * cannot change a min-struct top-1 over identical structs), and run
    * by the streaming ingest's recovery pass on every (re)start
    * ([[graft.streaming.VecDupIngest]] ADC mode). Returns the number of
    * healed vectors. */
  private[graft] def pqHeal(s: SparkSession, name: String): Long = {
    require(pqExists(s, name), s"$name has no PQ artifacts to heal")
    val missing = s.table(s"${name}_cells")
      .select(col("vec_id"), col("embedding"))
      .join(s.table(s"${name}_pqcodes").select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .dropDuplicates("vec_id")
      .localCheckpoint()
    val n = missing.count()
    if (n > 0L) appendCodes(s, name, missing)
    n
  }

  /** Both SQ8 artifacts present (the pqExists two-table rule: attach
    * commits book then codes; a crash between must read as absent). */
  private[graft] def sqExists(s: SparkSession, name: String): Boolean =
    s.catalog.tableExists(s"${name}_sqcodes") &&
      s.catalog.tableExists(s"${name}_sqbook")

  /** The cached SQ book row — the pqBookRow read-through (shared cache
    * map, "#sq"-suffixed key) with the same catalog-validated eviction:
    * every index mutation drops `_sqbook`, so a cached row whose table
    * is gone is stale. */
  private def sqBookRow(s: SparkSession,
      name: String): org.apache.spark.sql.Row = {
    val key = pqCacheKey(s, name) + "#sq"
    if (!s.catalog.tableExists(s"${name}_sqbook")) pqBookCache.remove(key)
    var row = pqBookCache.get(key)
    if (row == null) {
      row = s.table(s"${name}_sqbook").collect().head
      pqBookCache.put(key, row)
    }
    row
  }

  private def sqBookFrame(s: SparkSession, name: String): DataFrame = {
    val row = sqBookRow(s, name)
    s.createDataFrame(
      java.util.Collections.singletonList(row),
      row.asInstanceOf[org.apache.spark.sql.catalyst.expressions
        .GenericRowWithSchema].schema)
  }

  /** Attach SQ8 scalar-quantization serving artifacts to an existing
    * IVF index — the OTHER FAISS-standard code layout next to PQ
    * (IndexScalarQuantizer QT_8bit): one byte per dimension against a
    * frozen per-dim (min, span) book learned over the index rows'
    * quantized values, committed as
    *
    *   - `<name>_sqbook`  — the packed 1-row book (d (mn, sc) pairs, a
    *     dimension artifact like the PQ codebook);
    *   - `<name>_sqcodes` — (cell, vec_id, codes BINARY): d bytes per
    *     vector, bucketed by cell like the cells/codes tables, zero
    *     index-side exchange at serve time.
    *
    * The layout point vs PQ: 16× the bits (64 B vs 4 B at d = 64) for
    * fidelity that needs no codebook training — the memory/recall
    * middle ground between PQ codes and float rows, and Sq8Spec
    * measures exactly that on the regime fixture. Encoding is RAW
    * (global book), not per-cell residual: 256 levels per dimension
    * already out-resolve within-cell spread at this width, and a
    * global book keeps serving reconstruction independent of the
    * probed cell. Book first, codes second (the pqAttach sequential
    * rule); [[sqExists]] requires both. Invalidated, like every
    * derived artifact, by any index mutation; there is no sqAppend —
    * the streaming growth path serves PQ codes ([[pqAppend]]), and a
    * grown index re-attaches SQ on the next gated read. */
  private[graft] def sqAttach(s: SparkSession, name: String): Unit = {
    Seq(s"${name}_sqcodes", s"${name}_sqbook")
      .foreach(graft.core.Tables.dropTableFast(s, _))
    val qrows = s.table(s"${name}_cells")
      .select(col("cell"), col("vec_id"), quant(col("embedding")).as("q"))
    // per-dim min/span: one distributed pass, d partial cells per
    // partition; the packed 1-row book is a dimension artifact (the
    // cents/pqbook collect class)
    val book = qrows
      .select(posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v")).as("mn"), (max(col("v")) - min(col("v"))).as("sc"))
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mn"), col("sc")))),
        x => struct(x.getField("mn").as("mn"), x.getField("sc").as("sc")))
        .as("book"))
    val bookRow = book.collect().head
    pqBookCache.put(pqCacheKey(s, name) + "#sq", bookRow)
    val bookLocal = s.createDataFrame(
      java.util.Collections.singletonList(bookRow),
      bookRow.asInstanceOf[org.apache.spark.sql.catalyst.expressions
        .GenericRowWithSchema].schema)
    val buckets = s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_cells"))
      .bucketSpec.map(_.numBuckets).getOrElse(16)
    bookLocal.write.saveAsTable(s"${name}_sqbook")
    graft.core.Tables.writeBucketed(
      qrows.crossJoin(broadcast(bookLocal))
        .select(col("cell"), col("vec_id"),
          graft.functions.SqNative.sqEncode(col("q"), col("book"))
            .as("codes"))
        .repartition(buckets, col("cell")),
      s"${name}_sqcodes", "cell", buckets)
  }

  /** Top-k serve over the stored SQ8 codes — the q228 shape with the
    * byte-per-dim representation: candidates cross the probe join as
    * (cell, old_id, d bytes); the query side packs its quantized value
    * with the broadcast book per dim (struct(qv, mn, sc)) in-row and
    * broadcasts (batch-sized × nProbe by construction); distance is
    * integer squared-L2 against the RECONSTRUCTED candidate
    * ([[graft.functions.SqNative.sqDist]]). One exchange: the rank
    * window. Unlike PQ's per-cell residual tables, the global book
    * makes the distance independent of the probed cell — multi-probe
    * only widens the candidate set. */
  private[graft] def sqTopK(s: SparkSession, name: String, delta: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val cand = s.table(s"${name}_sqcodes")
      .select(col("cell"), col("vec_id").as("old_id"), col("codes"))
    val withCents = delta
      .crossJoin(broadcast(graft.operators.IvfIndex.centsFrame(s, name)))
    val assigned =
      if (nProbe <= 1)
        withCents.select(col("vec_id").as("new_id"),
          graft.operators.IvfIndex.cellOf(col("embedding")).as("cell"),
          quant(col("embedding")).as("q"))
      else
        withCents.select(col("vec_id").as("new_id"),
          explode(graft.operators.IvfIndex
            .topCells(col("embedding"), nProbe)).as("cell"),
          quant(col("embedding")).as("q"))
    val qs = broadcast(assigned
      .crossJoin(broadcast(sqBookFrame(s, name)))
      .select(col("new_id"), col("cell"),
        zip_with(col("q"), col("book"), (x, b) => struct(x.as("qv"),
          b.getField("mn").as("mn"), b.getField("sc").as("sc")))
          .as("qt")))
    val w = Window.partitionBy("new_id")
      .orderBy(col("approx_d"), col("old_id"))
    cand.join(qs, "cell")
      .withColumn("approx_d", graft.functions.SqNative
        .sqDist(col("codes"), col("qt")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("new_id", "old_id", "rank", "approx_d")
  }

  /** The cell-colocated metadata (payload) table is present. Unlike the
    * two-table PQ commit, _meta is a single atomic saveAsTable, so bare
    * existence is the whole invariant. */
  private[graft] def metaExists(s: SparkSession, name: String): Boolean =
    s.catalog.tableExists(s"${name}_meta")

  /** Attach a cell-colocated METADATA table to an existing IVF index —
    * the payload-column layout every production vector store pairs with
    * its inverted lists (FAISS id-maps, vector-DB payload storage):
    * `<name>_meta` (cell, vec_id, label), bucketed by cell like the
    * cells/codes tables, so a filtered serve reads candidate metadata
    * with ZERO index-side exchange (the codes⋈meta join is bucket-local
    * sort-merge). Without this copy, every metadata-filtered query would
    * join the index side against the lake table on vec_id — a full
    * index shuffle per query, the exact cost class the bucketed layout
    * exists to avoid. Assignment is in-row from the SOURCE embeddings
    * against the frozen packed-centroid broadcast (never a join against
    * the cells table — attaching payload must not shuffle the index
    * either); `src` must be the index's own population (vec_id,
    * embedding, label). Invalidated, like the PQ artifacts, by every
    * index mutation (IvfIndex.write/append/remove — append drops it
    * even under keepPq: nothing appends payload, and a stale meta table
    * would silently hide appended rows from every filtered serve). */
  private[graft] def metaAttach(s: SparkSession, name: String,
      src: DataFrame): Unit = {
    graft.core.Tables.dropTableFast(s, s"${name}_meta")
    val buckets = s.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_cells"))
      .bucketSpec.map(_.numBuckets).getOrElse(16)
    val assigned = src
      .crossJoin(broadcast(graft.operators.IvfIndex.centsFrame(s, name)))
      .select(graft.operators.IvfIndex.cellOf(col("embedding")).as("cell"),
        col("vec_id"), col("label"))
      .repartition(buckets, col("cell"))
    graft.core.Tables.writeBucketed(assigned, s"${name}_meta", "cell",
      buckets)
  }

  /** PER-QUERY metadata-filtered ADC top-k (q230) — the vector-DB
    * "tenant/language filter" serve: each query ranks only candidates
    * whose label EQUALS its own. A per-query predicate can never
    * pre-filter (the eligible set differs per query), so this is the
    * post-filter strategy: candidates = stored codes ⋈ colocated meta
    * (bucket-local, zero exchange), the label equality applies at the
    * probe join BEFORE the ADC arithmetic (wrong-label candidates never
    * reach the distance sum), and the rank window spans the probed
    * cells. Semantics: exact filtered top-k WITHIN the probed cells —
    * the filter costs no recall beyond coarse pruning because nothing
    * is shortlisted before it applies (a widened nProbe is the recall
    * dial, exactly as in the unfiltered serve). Only (new_id, cell,
    * old_id, 4 ints, label) rows ever cross an exchange. */
  private[graft] def filteredAdcTopK(s: SparkSession, name: String,
      delta: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val cand = s.table(s"${name}_pqcodes")
      .select(col("cell"), col("vec_id"), col("codes"))
      .join(s.table(s"${name}_meta")
        .select(col("cell"), col("vec_id"), col("label").as("old_label")),
        Seq("cell", "vec_id"))
      .select(col("cell"), col("vec_id").as("old_id"), col("codes"),
        col("old_label"))
    // the query side is batch-sized by construction (delta × nProbe
    // rows) — broadcast it EXPLICITLY: the label join above it hides
    // its size from the estimator, and a fallback SMJ would exchange
    // the bucketed candidate read it exists to keep local
    val qs = broadcast(adcQuerySide(s, name,
        delta.select(col("vec_id"), col("embedding")), nProbe)
      .join(broadcast(delta.select(col("vec_id").as("new_id"),
        col("label").as("q_label"))), "new_id"))
    val w = Window.partitionBy("new_id")
      .orderBy(col("approx_d"), col("old_id"))
    cand.join(qs, "cell")
      .filter(col("old_label") === col("q_label"))
      .withColumn("approx_d", graft.functions.PqNative
        .adcSum(col("codes"), col("dtable")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("new_id", "old_id", "rank", "approx_d")
  }

  /** CONSTANT-predicate filtered top-k with the selectivity-adaptive
    * strategy switch every production vector store implements (q231):
    *
    *   - predicate matches < `selThreshold` of the index → PRE-FILTER:
    *     resolve the eligible id set from the colocated meta table (the
    *     predicate pushes into its bucketed scan), fetch ONLY those
    *     members' float rows by a bucket-local cells⋈meta join (zero
    *     index-side exchange), and score them EXACTLY against the
    *     broadcast queries — recall-lossless, cost ∝ selectivity × N;
    *   - dense predicate → POST-FILTER through the ADC index: restrict
    *     the stored codes by the same bucket-local meta join, then the
    *     standard probed-cell ADC rank — cost ∝ probed-cell mass, the
    *     filter only narrows it.
    *
    * The dispatch counts the predicate over the meta table itself (a
    * 3-narrow-column bucketed scan — index-owned statistics, not a lake
    * scan; a production deployment would cache these counts with the
    * index and refresh on mutation). The threshold is a cost-tolerance
    * dial, not an asymptotic crossover: below it the exact scan costs
    * ≤ threshold × corpus float reads AND buys exactness, the
    * pgvector/FAISS "brute-force small filters" rule. Both branches
    * return (new_id, old_id, rank, dist) — dist is exact integer L2 on
    * the pre-filter branch, the ADC approximation on the dense branch,
    * the inherent semantics of the adaptive serve. */
  private[graft] def filteredTopK(s: SparkSession, name: String,
      delta: DataFrame, pred: Column, k: Int, nProbe: Int = 2,
      selThreshold: Double = 0.05): DataFrame = {
    val meta = s.table(s"${name}_meta")
    // ONE statistics pass, not two count jobs: total and matching ride
    // the same scan of the 3-narrow-column meta table
    val cnt = meta.agg(count(lit(1)).as("n"),
      count(when(pred, 1)).as("m")).head()
    val (total, matching) = (cnt.getLong(0), cnt.getLong(1))
    if (total == 0L || matching < selThreshold * total) {
      val elig = meta.filter(pred).select(col("cell"), col("vec_id"))
      val cand = s.table(s"${name}_cells")
        .join(elig, Seq("cell", "vec_id"))
        .select(col("vec_id").as("old_id"),
          quant(col("embedding")).as("hq"))
      val dq = delta.select(col("vec_id").as("new_id"),
        quant(col("embedding")).as("q"))
      val w = Window.partitionBy("new_id").orderBy(col("dist"), col("old_id"))
      cand.crossJoin(broadcast(dq))
        .select(col("new_id"), col("old_id"),
          qdist2(col("q"), col("hq")).as("dist"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("new_id", "old_id", "rank", "dist")
    } else {
      val cand = s.table(s"${name}_pqcodes")
        .select(col("cell"), col("vec_id"), col("codes"))
        .join(meta.filter(pred).select(col("cell"), col("vec_id")),
          Seq("cell", "vec_id"))
        .select(col("cell"), col("vec_id").as("old_id"), col("codes"))
      val w = Window.partitionBy("new_id").orderBy(col("dist"), col("old_id"))
      cand.join(adcQuerySide(s, name, delta, nProbe), "cell")
        .withColumn("dist", graft.functions.PqNative
          .adcSum(col("codes"), col("dtable")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("new_id", "old_id", "rank", "dist")
    }
  }

  /** q216/q218 shared serving kernel: ADC top-1 per delta vector over
    * the dir-keyed coarse cells (built when absent) + the STORED
    * residual PQ codes (attached when absent — q220 gates the attach
    * itself). The serving plan never touches the float cells table:
    * candidates are (cell, old_id, 4 ints) read bucketed with zero
    * index-side exchange; the query side computes its coarse cell, its
    * residual against that cell's centroid, and its 4×8 ADC distance
    * table all in-row against 1-row broadcasts. Top-1 is a min-struct
    * aggregate (map-side partial, the q143/q189 discipline — no per-key
    * sort), ties to the lowest old_id like the oracle's
    * ORDER BY approx_d, old_id. Returns (new_id, old_id, approx_d). */
  private def ivfPqTop1(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val hist = raw.filter(col("vec_id") % 10 =!= 9)
    val delta = raw.filter(col("vec_id") % 10 === 9)
    // one coarse index, many consumers: serve off the SAME dir-keyed
    // cells q214 builds and q143 matches (identical hist split),
    // building only when absent
    val name = ivfIndexName(dir)
    if (!graft.operators.IvfIndex.exists(s, name))
      graft.operators.IvfIndex.write(s, hist, name)
    if (!pqExists(s, name)) pqAttach(s, name)
    adcTop1(s, name, delta)
  }

  /** The serving kernel proper (index + PQ artifacts must exist):
    * ADC top-1 of `delta` (vec_id, embedding) against `name`'s stored
    * codes — shared by q216 (dir-keyed corpus index), q222/q226/q227
    * (the fixture gates) and q225 (multi-probe). The query-side
    * transform follows the encoding the book RECORDS (residual
    * subtracts the probed cell's centroid; raw serves the plain
    * quantized vector). `nProbe` > 1 probes the query's top-P cells —
    * the standard FAISS serving dial on the PQ path (q223 added it to
    * the flat path; coarse-pruning loss is the dominant recall term,
    * q218's decomposition): the query side explodes ×P in-row BEFORE
    * the cell join (still the small side by construction), each probed
    * cell gets its own residual + ADC table, the stored-codes read
    * stays zero-exchange, and the min-struct top-1 spans ALL probed
    * cells per new_id. */
  private def adcTop1(s: SparkSession, name: String,
      delta: DataFrame, nProbe: Int = 1): DataFrame =
    adcScores(s, name, delta, nProbe)
      .groupBy("new_id")
      .agg(min(struct(col("approx_d"), col("old_id"))).as("best"))
      .select(col("new_id"), col("best").getField("old_id").as("old_id"),
        col("best").getField("approx_d").as("approx_d"))

  /** Per-candidate ADC scores — (new_id, cell, old_id, approx_d) for
    * every stored code in the query's probed cell(s). The shared core
    * of [[adcTop1]] and the streaming ingest's shortlist-then-verify
    * serving ([[graft.streaming.VecDupIngest]] ADC mode, which needs
    * the pre-aggregation rows for a top-R cut plus `excludeIds` — the
    * crash-replay self-match guard, batch-sized broadcast anti like
    * IvfIndex.matchIncrement's). */
  private[graft] def adcScores(s: SparkSession, name: String,
      delta: DataFrame, nProbe: Int = 1,
      excludeIds: Option[DataFrame] = None): DataFrame = {
    val cand0 = s.table(s"${name}_pqcodes")
      .select(col("cell"), col("vec_id").as("old_id"), col("codes"))
    val cand = excludeIds.fold(cand0)(ex => cand0.join(
      broadcast(ex.select(col("vec_id").as("old_id"))), Seq("old_id"),
      "left_anti"))
    cand.join(adcQuerySide(s, name, delta, nProbe), "cell")
      .withColumn("approx_d", graft.functions.PqNative
        .adcSum(col("codes"), col("dtable")))
      .select(col("new_id"), col("cell"), col("old_id"), col("approx_d"))
  }

  /** The ADC query side — (new_id, cell, dtable) per delta vector and
    * probed cell: probed cell(s), the encoding's query transform
    * (residual subtracts the probed cell's centroid), then the
    * per-(query, cell) 4×8 ADC distance table — each step in-row vs a
    * 1-row broadcast; nothing here touches the index side. nProbe = 1
    * keeps the scalar argmax path (no Generate node in the gated
    * q216/q224 plans). Shared by [[adcScores]] and the filtered serves
    * ([[filteredAdcTopK]], [[filteredTopK]]'s dense branch). */
  private def adcQuerySide(s: SparkSession, name: String,
      delta: DataFrame, nProbe: Int): DataFrame = {
    val withCents = delta
      .crossJoin(broadcast(
        graft.operators.IvfIndex.centsFrame(s, name)))
    val assigned =
      if (nProbe <= 1)
        withCents.select(col("vec_id").as("new_id"), col("cents"),
          graft.operators.IvfIndex.cellOf(col("embedding")).as("cell"),
          quant(col("embedding")).as("q"))
      else
        withCents.select(col("vec_id").as("new_id"), col("cents"),
          explode(graft.operators.IvfIndex
            .topCells(col("embedding"), nProbe)).as("cell"),
          quant(col("embedding")).as("q"))
    val rq =
      if (pqEncodingOf(s, name) == "residual")
        assigned.select(col("new_id"), col("cell"),
          zip_with(col("q"), quant(centEmbOf(col("cell"))),
            (x, y) => x - y).as("rq"))
      else assigned.select(col("new_id"), col("cell"), col("q").as("rq"))
    rq.crossJoin(broadcast(pqBookFrame(s, name).select(col("cents"))))
      .select(col("new_id"), col("cell"),
        transform(col("cents"), cs => struct(
          cs.getField("m").as("m"),
          cs.getField("cluster").as("cluster"),
          qdist2(slice(col("rq"), cs.getField("m") * 16 + 1, lit(16)),
            cs.getField("cent")).as("d"))).as("dtable"))
  }

  /** The q218/q222 shared decomposition: per delta vector, the ADC pick
    * (pq_old), the exact integer-L2 top-1 WITHIN the probed cell
    * (cell_old — what a lossless in-cell scan would return) and the
    * brute top-1 over ALL history (true_old); pq_cell_hit isolates the
    * PQ quantization loss, cell_global_hit the coarse-pruning loss.
    * Brute side is the q31 shape — history scans once and never
    * shuffles, the delta broadcasts, truths are min-struct aggregates
    * (ties to the lowest old_id, matching the ADC pick's order). */
  private def recallDecomposed(s: SparkSession, name: String,
      hist: DataFrame, delta: DataFrame): DataFrame = {
    val pq = adcTop1(s, name, delta)
      .select(col("new_id").as("vec_id"), col("old_id").as("pq_old"))
    // exact in-cell truth: same cell join as the serving plan, full
    // integer L2 instead of ADC
    val qcell = delta
      .crossJoin(broadcast(
        graft.operators.IvfIndex.centsFrame(s, name)))
      .select(col("vec_id").as("q_id"),
        graft.operators.IvfIndex.cellOf(col("embedding")).as("cell"),
        quant(col("embedding")).as("q"))
    val cellTrue = s.table(s"${name}_cells")
      .select(col("cell"), col("vec_id").as("old_id"),
        quant(col("embedding")).as("hq"))
      .join(qcell, "cell")
      .select(col("q_id"), col("old_id"),
        qdist2(col("q"), col("hq")).as("d2"))
      .groupBy("q_id")
      .agg(min(struct(col("d2"), col("old_id"))).getField("old_id")
        .as("cell_old"))
      .select(col("q_id").as("vec_id"), col("cell_old"))
    val brute = hist
      .select(col("vec_id").as("old_id"), quant(col("embedding")).as("hq"))
      .crossJoin(broadcast(delta.select(col("vec_id").as("q_id"),
        quant(col("embedding")).as("q"))))
      .select(col("q_id"), col("old_id"), qdist2(col("q"), col("hq")).as("d2"))
      .groupBy("q_id")
      .agg(min(struct(col("d2"), col("old_id"))).getField("old_id")
        .as("true_old"))
      .select(col("q_id").as("vec_id"), col("true_old"))
    pq.join(cellTrue, Seq("vec_id")).join(brute, Seq("vec_id"))
      .select(col("vec_id"), col("pq_old"), col("cell_old"),
        col("true_old"),
        (col("pq_old") === col("cell_old")).cast("long")
          .as("pq_cell_hit"),
        (col("cell_old") === col("true_old")).cast("long")
          .as("cell_global_hit"))
  }

  /** Deterministic CLUSTERED embedding corpus derived from vec_ids (the
    * q222 fixture): 16 integer centers regenerated from md5 in BOTH
    * engines (the q206 move — +(hexdigit−7)·4 per dim, no side-channel
    * file) plus small id-keyed arithmetic noise (±2 per dim vs center
    * magnitudes up to 32 → within-cluster cosine ≥ 0.99, max
    * cross-center cosine ~0.28 measured). Integer values are exactly
    * representable as doubles, so cosine / quantization / residuals are
    * bit-identical across engines. Seed coverage (corrected r16): the
    * index is built on hist = vec_id % 10 ≠ 9, so the 16 lowest HIST
    * ids are {0..8, 10..16} — center 9 (id 9 is delta) gets NO seed and
    * center 0 two (ids 0 and 16); cluster-9 queries still resolve
    * deterministically (their argmax lands on a fixed other-center
    * seed, same rule both engines) and the measured recall levels
    * (ClusteredRecallSpec) include that asymmetry. regimeVecs below
    * derives its cluster id from the HIST RANK instead, so its seeds
    * cover every center exactly once. */
  private[graft] def clusteredVecs(emb: DataFrame): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex0(seed: String): Int = {
      val h = md.digest(seed.getBytes("UTF-8"))
      (h(0) >> 4) & 0xf
    }
    val centers: Seq[Seq[Long]] = (0 until 16).map(c =>
      (0 until 64).map(j => (hex0(s"cc|$c|$j") - 7).toLong * 4L))
    val cid = (col("vec_id") % 16).cast("int")
    // float, like the real embeddings column (the native cosine kernel's
    // input type); every value is a small integer (|v| ≤ 34), exactly
    // representable in float AND double, so both engines' arithmetic is
    // identical whatever width they carry it at
    emb.select(col("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (element_at(element_at(typedLit(centers), cid + 1), j + 1)
          + ((col("vec_id") * 13 + j * 7 + col("vec_id") * j) % 5 - 2))
          .cast("float")).as("embedding"))
  }

  /** The PRODUCTION-REGIME fixture (q226/q227): 64 md5-derived integer
    * centers (scale ±28) so cells ≫ the 4×8 codebook, PLUS structured
    * within-cluster spread — each vector adds one of 8 md5-derived
    * SUB-PATTERNS (scale ±7) and tiny id-keyed jitter (±1). Real
    * embedding clusters carry low-dimensional internal structure like
    * this; it is exactly what residual PQ exists to encode: the 8-entry
    * residual codebook can learn the 8 sub-patterns (one Lloyd round
    * recovers them near-exactly), while a raw 8-entry codebook would
    * need 64 centers × 8 sub-patterns = 512 combinations. Measured
    * sf0.01 (simulated first, then gate-pinned): residual pq_cell_hit
    * 44/50 vs raw 15/50, coarse 50/50 both. The cluster id is the
    * vector's HIST RANK mod 64 (rank = vec_id − ⌊(vec_id+1)/10⌋, dense
    * over hist = vec_id % 10 ≠ 9), so the 64 lowest hist ids — the
    * k = 64 coarse seeds — cover every center exactly once (the q222
    * coverage hole, closed by construction). All values are small
    * integers (|v| ≤ 36), exactly representable in float and double, so
    * both engines' arithmetic is identical. */
  private[graft] def regimeVecs(emb: DataFrame): DataFrame = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex0(seed: String): Int = {
      val h = md.digest(seed.getBytes("UTF-8"))
      (h(0) >> 4) & 0xf
    }
    val centers: Seq[Seq[Long]] = (0 until 64).map(c =>
      (0 until 64).map(j => (hex0(s"rc|$c|$j") - 7).toLong * 4L))
    val subs: Seq[Seq[Long]] = (0 until 8).map(t =>
      (0 until 64).map(j => (hex0(s"rs|$t|$j") - 7).toLong))
    // hist rank: vec_id minus the count of excluded (%10==9) ids below
    // it — integer `div`, not `/` (Column `/` is double division)
    val cid = ((col("vec_id") - expr("(vec_id + 1) div 10")) % 64)
      .cast("int")
    val sid = ((col("vec_id") * 7 + 3) % 8).cast("int")
    emb.select(col("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (element_at(element_at(typedLit(centers), cid + 1), j + 1)
          + element_at(element_at(typedLit(subs), sid + 1), j + 1)
          + ((col("vec_id") * 13 + j * 7 + col("vec_id") * j) % 3 - 1))
          .cast("float")).as("embedding"))
  }

  /** One-Lloyd-round PQ codebook trained on `e` (vec_id, q), returned as
    * the packed 1-row broadcast frame (shared by q104's top-k and q216's
    * IVF-PQ serving). Seeds = the 8 lowest-id vectors per subspace; one
    * integer-exact floor-mean update (shuffles k·M·subdim cells —
    * corpus-size-free); the trained book is a DIMENSION ARTIFACT
    * (4·8 rows) collected once — exactly how production PQ ships
    * codebooks — so every consumer's serving plan is scan + broadcasts
    * instead of re-running the training subtree. */
  private def pqTrainCodebook(s: SparkSession, e: DataFrame,
      seedSel: DataFrame => DataFrame = _.filter(col("vec_id") < 8))
      : DataFrame = {
    val cents0 = seedSel(e)
      .select(col("vec_id").cast("int").as("cluster"), col("q"))
      .select(explode(sequence(lit(0), lit(3))).as("m"), col("cluster"),
        col("q"))
      .select(col("m"), col("cluster"),
        slice(col("q"), col("m") * 16 + 1, lit(16)).as("cent"))
    val a0 = Tables.spread(e, col("vec_id"))
      .crossJoin(broadcast(pqPack(cents0)))
      .select(col("vec_id"), col("q"),
        graft.functions.PqNative.pqEncode(col("q"), col("cents"))
          .as("codes0"))
    // one Lloyd update per (subspace, code): floor(sum/n) in pure
    // integer arithmetic; shuffles k·M·subdim cells, corpus-size-free
    val cents1 = a0
      .select(col("q"), posexplode(col("codes0")).as(Seq("m", "code")))
      .select(col("m"), col("code"),
        posexplode(slice(col("q"), col("m") * 16 + 1, lit(16)))
          .as(Seq("pos", "v")))
      .groupBy("m", "code", "pos")
      .agg(expr("(sum(v) - pmod(sum(v), count(*))) div count(*)")
        .cast("long").as("cd"))
      .groupBy("m", "code")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cd")))),
        x => x.getField("cd")).as("cent"))
      .select(col("m"), col("code").as("cluster"), col("cent"))
    import s.implicits._
    val cbLocal = cents1.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
      .toSeq.toDF("m", "cluster", "cent")
    pqPack(cbLocal)
  }

  /** In-row PQ encoder, Column-HOF REFERENCE formulation: for each
    * subspace m, argmin squared-L2 over that subspace's codebook entries;
    * strict `<` over the (m, cluster)-sorted array breaks ties to the
    * lowest cluster id (≙ the oracle's `ORDER BY dist2, cluster`).
    * q104 runs the native kernel (graft.functions.PqNative — interpreted
    * HOF lambdas were 5.6× the oracle at sf0.1); VectorOpsSpec pins the
    * kernel to this formulation. */
  private[graft] def pqEncodeRef(q: Column, cents: Column): Column =
    transform(sequence(lit(0), lit(3)), m => {
      val sub = slice(q, m * 16 + 1, lit(16))
      aggregate(filter(cents, cs => cs.getField("m") === m),
        struct(lit(Long.MaxValue).as("d"), lit(-1).as("c")),
        (acc, cs) => {
          val d = qdist2(sub, cs.getField("cent"))
          when(d < acc.getField("d"),
            struct(d.as("d"), cs.getField("cluster").as("c"))).otherwise(acc)
        }).getField("c")
    })

  /** (cluster, cent) rows → ONE row holding the cluster-sorted centroid
    * array, so assignment is a 1-row broadcast and argmin stays inside
    * the scanned row. */
  private def pack(cents: DataFrame): DataFrame =
    cents.groupBy().agg(
      array_sort(collect_list(struct(col("cluster"), col("cent"))))
        .as("cents"))

  /** Argmin fold over the packed centroid array, Column-HOF REFERENCE
    * formulation: strict `<` on a cluster-ascending array breaks ties to
    * the LOWEST cluster id. q91/q92/q110 run the native kernel
    * (PqNative.NearestCent — the interpreted fold was the whole cost of
    * a bench-honest assignment pass); VectorOpsSpec pins equality. */
  private[graft] def nearestRef(q: Column, cents: Column): Column =
    aggregate(cents,
      struct(lit(Long.MaxValue).as("d"), lit(-1).as("c")),
      (acc, cs) => {
        val d = qdist2(q, cs.getField("cent"))
        when(d < acc.getField("d"),
          struct(d.as("d"), cs.getField("cluster").as("c"))).otherwise(acc)
      })

  // DuckDB mirror of dot/cosine: sequential left-fold in double.
  private def sqlDot(a: String, b: String) =
    s"""list_reduce(
       |  list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
       |  (x, y) -> x + y)""".stripMargin
  /** The hist/delta split + frozen-centroid assignment CTE chain shared
    * by q143 (top-k match), q189 (dedup decision) and q213 (post-RTBF
    * match): hist = 90% of the corpus, delta = the ingest increment,
    * cents = the k lowest hist ids, hassign/dassign = argmax-cosine cell
    * per vector. `candWhere` narrows the CANDIDATE side only (q213's
    * takedown set). `centWhere` narrows the SEED slice: q213's Spark
    * index freezes its centroids at write time from the 80% build slice
    * (hist minus %10==8 — the appended rows never reseed), so the oracle
    * must seed from exactly that slice; on the gate fixture the two
    * coincide (ids dense from 0 → the 8 lowest carry no %10==8 id), but
    * the equivalence must not depend on the id layout. */
  private def sqlIvfSplitChain(candWhere: String = "",
      centWhere: String = "", src: String = "embeddings",
      k: Int = 8): String =
    s"""hist AS (
       |  SELECT vec_id, embedding FROM $src WHERE vec_id % 10 <> 9),
       |delta AS (
       |  SELECT vec_id, embedding FROM $src WHERE vec_id % 10 = 9),
       |cents AS (SELECT vec_id AS cent_id, embedding AS cent
       |  FROM hist$centWhere ORDER BY vec_id LIMIT $k),
       |hassign AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM (
       |    SELECT h.vec_id, h.embedding, c.cent_id,
       |      row_number() OVER (PARTITION BY h.vec_id
       |        ORDER BY ${sqlCos("h.embedding", "c.cent")} DESC,
       |                 c.cent_id) AS r
       |    FROM hist h CROSS JOIN cents c$candWhere)
       |  WHERE r = 1),
       |dassign AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM (
       |    SELECT d.vec_id, d.embedding, c.cent_id,
       |      row_number() OVER (PARTITION BY d.vec_id
       |        ORDER BY ${sqlCos("d.embedding", "c.cent")} DESC,
       |                 c.cent_id) AS r
       |    FROM delta d CROSS JOIN cents c)
       |  WHERE r = 1)""".stripMargin

  private def sqlCos(a: String, b: String) =
    s"(${sqlDot(a, b)}) / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)}))"

  /** The IVF-SQ8 WITH-chain (q232/q233): coarse split, the per-dim
    * (min, span) book over the INDEX rows' quantized values, byte codes
    * (floor-div on non-negative numerators — DuckDB `//` ≡ the Scala
    * integer division), and — for serving — per-candidate integer
    * reconstruction. Raw encoding against the GLOBAL book (the shipped
    * sqAttach choice), so reconstruction is cell-independent and the
    * probe CTE only widens the candidate set. */
  private def sqlIvfSqChain(nProbe: Int = 1): String = {
    val probeCte = if (nProbe <= 1) "" else s""",
dassignp AS (
SELECT vec_id, cent_id AS cell FROM (
SELECT d.vec_id, c.cent_id,
row_number() OVER (PARTITION BY d.vec_id
ORDER BY ${sqlCos("d.embedding", "c.cent")} DESC,
c.cent_id) AS r
FROM delta d CROSS JOIN cents c)
WHERE r <= $nProbe)"""
    s"""${sqlIvfSplitChain()}$probeCte,
       |qq AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
       |  FROM embeddings),
       |sqb AS MATERIALIZED (
       |  SELECT pos, min(v) AS mn, max(v) - min(v) AS sc
       |  FROM (SELECT unnest(qq.q) AS v, generate_subscripts(qq.q, 1) AS pos
       |        FROM qq JOIN hassign ha ON ha.vec_id = qq.vec_id)
       |  GROUP BY pos),
       |scodes AS MATERIALIZED (
       |  SELECT vec_id, cell, list(code ORDER BY pos) AS codes FROM (
       |    SELECT hu.vec_id, hu.cell, hu.pos,
       |      CASE WHEN b.sc <= 0 OR hu.v <= b.mn THEN 0
       |           ELSE LEAST(255, ((hu.v - b.mn) * 255) // b.sc) END AS code
       |    FROM (SELECT ha.vec_id, ha.cell, unnest(qq.q) AS v,
       |            generate_subscripts(qq.q, 1) AS pos
       |          FROM qq JOIN hassign ha ON ha.vec_id = qq.vec_id) hu
       |    JOIN sqb b ON b.pos = hu.pos)
       |  GROUP BY vec_id, cell)""".stripMargin
  }

  /** The IVF-PQ WITH-chain: coarse split, the per-row code
    * representation (`residual` = integer residuals against the
    * assigned cell's quantized centroid — the FAISS standard; false =
    * plain quantized vectors, q227's raw arm), codebook train (seeds =
    * the 8 lowest hist ids that are NOT coarse centroids — a centroid's
    * residual is identically zero; mirrors pqAttach's exclusion rule) +
    * one Lloyd round + encode on history, per-(query, probed-cell) ADC
    * sums on the delta side. Shared by q216 (top-1), q218 (recall),
    * q220 (the stored-codes read-back), q222/q226/q227 (fixtures),
    * q224 (append) and q225 (multi-probe); `src`/`k` retarget the
    * corpus, `centWhere` narrows the coarse SEED slice, `trainWhere`
    * (an AND-clause on vec_id) narrows the codebook TRAINING population
    * — q224's append semantics, where the book is trained on pre-append
    * history and then frozen while codes cover everything — and
    * `nProbe` > 1 assigns each delta vector to its top-P cells (the
    * q223 dassign2 move), with the ADC table computed PER probed cell
    * and the final top-1 spanning them all. */
  private def sqlIvfPqChain(src: String = "embeddings",
      k: Int = 8, centWhere: String = "", trainWhere: String = "",
      residual: Boolean = true, nProbe: Int = 1): String = {
    val dprobe = if (nProbe <= 1) "dassign" else "dassignp"
    val probeCte = if (nProbe <= 1) "" else s""",
dassignp AS (
SELECT vec_id, embedding, cent_id AS cell FROM (
SELECT d.vec_id, d.embedding, c.cent_id,
row_number() OVER (PARTITION BY d.vec_id
ORDER BY ${sqlCos("d.embedding", "c.cent")} DESC,
c.cent_id) AS r
FROM delta d CROSS JOIN cents c)
WHERE r <= $nProbe)"""
    // the code representation: residual subtracts the assigned cell's
    // quantized centroid; raw serves the quantized vector unchanged
    val hRep =
      if (residual)
        """SELECT ha.vec_id, ha.cell,
list_transform(list_zip(qq.q, qc.qc), p -> p[1] - p[2]) AS r
FROM hassign ha JOIN qq ON qq.vec_id = ha.vec_id
JOIN qcent qc ON qc.cent_id = ha.cell"""
      else
        """SELECT ha.vec_id, ha.cell, qq.q AS r
FROM hassign ha JOIN qq ON qq.vec_id = ha.vec_id"""
    val dRep =
      if (residual)
        s"""SELECT da.vec_id, da.cell,
list_transform(list_zip(qq.q, qc.qc), p -> p[1] - p[2]) AS r
FROM $dprobe da JOIN qq ON qq.vec_id = da.vec_id
JOIN qcent qc ON qc.cent_id = da.cell"""
      else
        s"""SELECT da.vec_id, da.cell, qq.q AS r
FROM $dprobe da JOIN qq ON qq.vec_id = da.vec_id"""
    s"""${sqlIvfSplitChain(centWhere = centWhere, src = src, k = k)}$probeCte,
       |qq AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
       |  FROM $src),
       |qcent AS (
       |  SELECT cent_id, list_transform(cent,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS qc
       |  FROM cents),
       |hres AS MATERIALIZED (
       |$hRep),
       |hsub AS (
       |  SELECT vec_id, cell, CAST(t.range AS INT) AS m,
       |    r[t.range*16+1 : t.range*16+16] AS sub
       |  FROM hres, range(4) t),
       |c0 AS (SELECT m, CAST(vec_id AS INT) AS cluster, sub AS cent
       |       FROM hsub WHERE vec_id IN (
       |         SELECT vec_id FROM hres
       |         WHERE vec_id NOT IN (SELECT cent_id FROM cents)$trainWhere
       |         ORDER BY vec_id LIMIT 8)),
       |d0 AS (
       |  SELECT s.vec_id, s.m, c.cluster,
       |    list_reduce(list_transform(list_zip(s.sub, c.cent),
       |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS dist2
       |  FROM hsub s JOIN c0 c USING (m) WHERE 1=1$trainWhere),
       |a0 AS (SELECT vec_id, m, cluster FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist2, cluster) AS rn FROM d0) WHERE rn = 1),
       |u AS (
       |  SELECT m, cluster, pos,
       |    CAST((sum(v) - ((sum(v) % count(*)) + count(*)) % count(*))
       |      // count(*) AS BIGINT) AS cd
       |  FROM (SELECT a0.m, a0.cluster, unnest(s.sub) AS v,
       |          generate_subscripts(s.sub, 1) AS pos
       |        FROM a0 JOIN hsub s ON s.vec_id = a0.vec_id AND s.m = a0.m)
       |  GROUP BY m, cluster, pos),
       |c1 AS MATERIALIZED (SELECT m, cluster, list(cd ORDER BY pos) AS cent
       |       FROM u GROUP BY m, cluster),
       |d1 AS (
       |  SELECT s.vec_id, s.cell, s.m, c.cluster,
       |    list_reduce(list_transform(list_zip(s.sub, c.cent),
       |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS dist2
       |  FROM hsub s JOIN c1 c USING (m)),
       |codes AS MATERIALIZED (SELECT vec_id, cell, m, cluster FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist2, cluster) AS rn FROM d1) WHERE rn = 1),
       |dres AS (
       |$dRep),
       |dsub AS (
       |  SELECT vec_id, cell, CAST(t.range AS INT) AS m,
       |    r[t.range*16+1 : t.range*16+16] AS sub
       |  FROM dres, range(4) t),
       |qt AS MATERIALIZED (
       |  SELECT s.vec_id AS q_id, s.cell, c.m, c.cluster,
       |    list_reduce(list_transform(list_zip(s.sub, c.cent),
       |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS d
       |  FROM dsub s JOIN c1 c USING (m)),
       |approx AS (
       |  SELECT qt.q_id AS new_id, co.vec_id AS old_id,
       |    CAST(sum(qt.d) AS BIGINT) AS approx_d
       |  FROM codes co JOIN qt ON qt.cell = co.cell AND qt.m = co.m
       |    AND qt.cluster = co.cluster
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** The q218/q222 shared decomposition tail over a chain that left
    * `approx`, `qq`, `dassign`, `hassign` in scope: ADC top-1, exact
    * in-cell L2 top-1, brute global L2 top-1, and the two hit bits.
    * FLUSH-LEFT (the sqlSrpBits rule): this interpolates into
    * stripMargin callers, so no line may begin with '|'. */
  private lazy val sqlRecallTail: String =
    """atop AS (SELECT new_id, old_id FROM (
      |SELECT *, row_number() OVER (PARTITION BY new_id
      |ORDER BY approx_d, old_id) AS rk FROM approx) WHERE rk = 1),
      |cd AS (
      |SELECT da.vec_id AS q_id, ha.vec_id AS old_id,
      |list_reduce(list_transform(list_zip(dq.q, hq.q),
      |p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS d2
      |FROM dassign da JOIN hassign ha USING (cell)
      |JOIN qq dq ON dq.vec_id = da.vec_id
      |JOIN qq hq ON hq.vec_id = ha.vec_id),
      |ctop AS (SELECT q_id, old_id AS cell_old FROM (
      |SELECT *, row_number() OVER (PARTITION BY q_id
      |ORDER BY d2, old_id) AS rk FROM cd) WHERE rk = 1),
      |bd AS (
      |SELECT d.vec_id AS q_id, h.vec_id AS old_id,
      |list_reduce(list_transform(list_zip(d.q, h.q),
      |p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS d2
      |FROM (SELECT * FROM qq WHERE vec_id % 10 = 9) d
      |CROSS JOIN (SELECT * FROM qq WHERE vec_id % 10 <> 9) h),
      |btop AS (SELECT q_id, old_id AS true_old FROM (
      |SELECT *, row_number() OVER (PARTITION BY q_id
      |ORDER BY d2, old_id) AS rk FROM bd) WHERE rk = 1)
      |SELECT a.new_id AS vec_id, a.old_id AS pq_old, c.cell_old,
      |b.true_old,
      |CAST(a.old_id = c.cell_old AS BIGINT) AS pq_cell_hit,
      |CAST(c.cell_old = b.true_old AS BIGINT) AS cell_global_hit
      |FROM atop a JOIN ctop c ON c.q_id = a.new_id
      |JOIN btop b ON b.q_id = a.new_id""".stripMargin

  /** DuckDB mirror of [[clusteredVecs]]: the 16 centers regenerate from
    * the same md5('cc|c|j') first hex digit, the noise from the same
    * integer formula — both engines derive the corpus from nothing.
    * FLUSH-LEFT (interpolates into stripMargin callers), and '||'
    * concatenations sit at line ENDS (a line beginning with '|' would be
    * re-stripped by the caller's stripMargin). */
  private lazy val sqlClusteredVecs: String =
    """cvecs AS (SELECT vec_id, list_transform(range(64), j ->
      |CAST(((CASE WHEN substr(md5('cc|' || CAST(vec_id % 16 AS VARCHAR) ||
      |'|' || CAST(j AS VARCHAR)), 1, 1) BETWEEN '0' AND '9'
      |THEN CAST(substr(md5('cc|' || CAST(vec_id % 16 AS VARCHAR) ||
      |'|' || CAST(j AS VARCHAR)), 1, 1) AS INT)
      |ELSE ascii(substr(md5('cc|' || CAST(vec_id % 16 AS VARCHAR) ||
      |'|' || CAST(j AS VARCHAR)), 1, 1)) - 87 END - 7) * 4
      |+ ((vec_id*13 + j*7 + vec_id*j) % 5 - 2)) AS DOUBLE))
      |AS embedding FROM embeddings)""".stripMargin

  /** One md5 first-hex-digit as an INT 0..15 (the clusteredVecs CASE,
    * factored for reuse). FLUSH-LEFT; no line begins with '|'. */
  private def sqlHex0(seedExpr: String): String =
    s"""(CASE WHEN substr(md5($seedExpr), 1, 1) BETWEEN '0' AND '9'
THEN CAST(substr(md5($seedExpr), 1, 1) AS INT)
ELSE ascii(substr(md5($seedExpr), 1, 1)) - 87 END)"""

  /** DuckDB mirror of [[regimeVecs]]: 64 centers (scale 4) + 8
    * sub-patterns (scale 1) + id-keyed jitter, all regenerated from the
    * same md5 digits and integer formulas — both engines derive the
    * corpus from nothing. FLUSH-LEFT (interpolates into stripMargin
    * callers); '||' concatenations sit at line ENDS. */
  private lazy val sqlRegimeVecs: String = {
    val cidStr =
      "CAST((vec_id - (vec_id + 1) // 10) % 64 AS VARCHAR)"
    val sidStr = "CAST((vec_id * 7 + 3) % 8 AS VARCHAR)"
    val center = sqlHex0(s"'rc|' || $cidStr || '|' || CAST(j AS VARCHAR)")
    val sub = sqlHex0(s"'rs|' || $sidStr || '|' || CAST(j AS VARCHAR)")
    s"""rvecs AS (SELECT vec_id, list_transform(range(64), j ->
CAST((($center - 7) * 4
+ ($sub - 7)
+ ((vec_id*13 + j*7 + vec_id*j) % 3 - 1)) AS DOUBLE))
AS embedding FROM embeddings)"""
  }

  private val sqlBucket =
    (1 to 4).map(i =>
      "CAST(CAST(embedding[" + i + "] > 0.0 AS INT) AS VARCHAR)")
      .mkString(" || ")

  val oracles: Map[String, String] = Map(
    "q30_cosine_pairs" ->
      s"""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |  round(${sqlCos("a.embedding", "b.embedding")}, 6) AS cos_sim
         |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1""".stripMargin,

    "q167_hard_negatives" ->
      s"""SELECT a_id, hard_neg_id, cos_sim FROM (
         |  SELECT a.vec_id AS a_id, c.vec_id AS hard_neg_id,
         |    round(${sqlCos("a.embedding", "c.embedding")}, 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY ${sqlCos("a.embedding", "c.embedding")} DESC,
         |        c.vec_id) AS rk
         |  FROM embeddings a CROSS JOIN embeddings c
         |  WHERE a.vec_id % 25 = 0 AND a.vec_id < ${25L * AnchorCap}
         |    AND c.label <> a.label)
         |WHERE rk = 1""".stripMargin,

    "q31_ann_topk" -> sqlAnnTopk,

    "q32_ann_bucketed" ->
      s"""WITH bucketed AS (
         |  SELECT vec_id, embedding, $sqlBucket AS bucket FROM embeddings)
         |SELECT q_id, c_id, rank FROM (
         |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
         |  FROM bucketed q JOIN bucketed c USING (bucket)
         |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
         |WHERE rank <= 3""".stripMargin,

    "q143_ivf_increment" ->
      s"""WITH ${sqlIvfSplitChain()}
         |SELECT new_id, old_id, rank, round(cs, 6) AS cos_sim FROM (
         |  SELECT d.vec_id AS new_id, h.vec_id AS old_id,
         |    ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |    row_number() OVER (PARTITION BY d.vec_id
         |      ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |               h.vec_id) AS rank
         |  FROM dassign d JOIN hassign h USING (cell))
         |WHERE rank <= 3""".stripMargin,

    // the committed cell assignment recomputed relationally — ≙ the
    // q214 read-back of the cells table
    "q214_ivf_index_build" ->
      s"""WITH ${sqlIvfSplitChain()}
         |SELECT vec_id, cell FROM hassign""".stripMargin,

    // coarse (q143 chain on raw floats) + fine (residual PQ train/encode
    // on history) + integer ADC over in-cell pairs — ≙ the IVF-PQ
    // serving plan over the stored codes
    "q216_ivfpq_match" ->
      s"""WITH ${sqlIvfPqChain()}
         |SELECT new_id, old_id, approx_d FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY approx_d, old_id) AS rk FROM approx)
         |WHERE rk = 1""".stripMargin,

    // the q216 chain with the coarse seeds AND the codebook training
    // population narrowed to the pre-append 80% slice while codes and
    // serving cover ALL history — ≙ attach-then-pqAppend
    "q224_pq_append_match" ->
      s"""WITH ${sqlIvfPqChain(centWhere = " WHERE vec_id % 10 <> 8",
             trainWhere = " AND vec_id % 10 <> 8")}
         |SELECT new_id, old_id, approx_d FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY approx_d, old_id) AS rk FROM approx)
         |WHERE rk = 1""".stripMargin,

    // the q143 chain with the delta assigned to its TOP-2 cells (same
    // cosine/tie order as the argmax) and the top-1 window spanning
    // both probed cells — ≙ matchIncrement(nProbe = 2)
    "q223_multiprobe_match" ->
      s"""WITH ${sqlIvfSplitChain()},
         |dassign2 AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT d.vec_id, d.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY ${sqlCos("d.embedding", "c.cent")} DESC,
         |                 c.cent_id) AS r
         |    FROM delta d CROSS JOIN cents c)
         |  WHERE r <= 2)
         |SELECT new_id, old_id, rank, round(cs, 6) AS cos_sim FROM (
         |  SELECT d.vec_id AS new_id, h.vec_id AS old_id,
         |    ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |    row_number() OVER (PARTITION BY d.vec_id
         |      ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |               h.vec_id) AS rank
         |  FROM dassign2 d JOIN hassign h USING (cell))
         |WHERE rank = 1""".stripMargin,

    // the stored-codes table recomputed relationally: residuals → seed
    // rule → Lloyd round → encode, pivoted to one row per index vector
    "q220_pq_attach" ->
      s"""WITH ${sqlIvfPqChain()}
         |SELECT vec_id, cell,
         |  CAST(max(CASE WHEN m = 0 THEN cluster END) AS INT) AS c0,
         |  CAST(max(CASE WHEN m = 1 THEN cluster END) AS INT) AS c1,
         |  CAST(max(CASE WHEN m = 2 THEN cluster END) AS INT) AS c2,
         |  CAST(max(CASE WHEN m = 3 THEN cluster END) AS INT) AS c3
         |FROM codes GROUP BY vec_id, cell""".stripMargin,

    // the q216 chain + exact in-cell L2 top-1 + brute global L2 top-1 —
    // the two loss terms of the composed index, decomposed
    "q218_ivfpq_recall" ->
      s"""WITH ${sqlIvfPqChain()},
         |$sqlRecallTail""".stripMargin,

    // the identical decomposition over the md5-regenerated clustered
    // corpus (cvecs) with the k=16 seed rule — the fixture where the
    // recall levels are meaningful (ClusteredRecallSpec pins them)
    "q222_clustered_recall" ->
      s"""WITH $sqlClusteredVecs,
         |${sqlIvfPqChain("cvecs", 16)},
         |$sqlRecallTail""".stripMargin,

    // the q216 chain with the delta side assigned to its TOP-2 cells
    // (the q223 dassign2 move on the PQ path): per-probed-cell
    // residuals + ADC tables, final top-1 spanning both cells
    "q225_multiprobe_adc" ->
      s"""WITH ${sqlIvfPqChain(nProbe = 2)}
         |SELECT new_id, old_id, approx_d FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY approx_d, old_id) AS rk FROM approx)
         |WHERE rk = 1""".stripMargin,

    // the same multi-probe chain, cut widened to the ranked top-3
    "q228_ivfpq_topk" ->
      s"""WITH ${sqlIvfPqChain(nProbe = 2)}
         |SELECT new_id, old_id, CAST(rank AS INT) AS rank, approx_d FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY approx_d, old_id) AS rank FROM approx)
         |WHERE rank <= 3""".stripMargin,

    // shortlist (ADC top-8 over the probed cells) then exact integer-L2
    // rerank of ONLY the shortlist — ≙ the streaming tier's two-stage
    // serve, restated relationally
    "q229_ivfpq_rerank" ->
      s"""WITH ${sqlIvfPqChain(nProbe = 2)},
         |short AS (SELECT new_id, old_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY approx_d, old_id) AS r FROM approx) WHERE r <= 8),
         |exd AS (
         |  SELECT s.new_id, s.old_id,
         |    list_reduce(list_transform(list_zip(dq.q, hq.q),
         |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS d2
         |  FROM short s JOIN qq dq ON dq.vec_id = s.new_id
         |  JOIN qq hq ON hq.vec_id = s.old_id)
         |SELECT new_id, old_id, CAST(rank AS INT) AS rank, d2 FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY d2, old_id) AS rank FROM exd)
         |WHERE rank <= 3""".stripMargin,

    // the multi-probe ADC chain with the per-query label filter: only
    // candidates sharing the query's label enter the rank — a filter
    // applied after a shortlist cut would change the picks
    "q230_filtered_topk" ->
      s"""WITH ${sqlIvfPqChain(nProbe = 2)},
         |lab AS (SELECT vec_id, label FROM embeddings)
         |SELECT new_id, old_id, CAST(rank AS INT) AS rank, approx_d FROM (
         |  SELECT a.new_id, a.old_id, a.approx_d,
         |    row_number() OVER (PARTITION BY a.new_id
         |      ORDER BY a.approx_d, a.old_id) AS rank
         |  FROM approx a JOIN lab lo ON lo.vec_id = a.old_id
         |  JOIN lab ln ON ln.vec_id = a.new_id
         |  WHERE lo.label = ln.label)
         |WHERE rank <= 3""".stripMargin,

    // the pre-filter branch is EXACT by construction, so the oracle is
    // the plain brute-force over the predicate slice — no index chain
    "q231_filtered_prefilter" ->
      """WITH qe AS (
        |  SELECT vec_id, label, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
        |  FROM embeddings),
        |cand AS (SELECT vec_id, q FROM qe
        |  WHERE vec_id % 10 <> 9 AND label = 3 AND vec_id % 7 = 0),
        |dq AS (SELECT vec_id, q FROM qe WHERE vec_id % 10 = 9),
        |exd AS (
        |  SELECT d.vec_id AS new_id, c.vec_id AS old_id,
        |    list_reduce(list_transform(list_zip(d.q, c.q),
        |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS dist
        |  FROM dq d CROSS JOIN cand c)
        |SELECT new_id, old_id, CAST(rank AS INT) AS rank, dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY new_id
        |    ORDER BY dist, old_id) AS rank FROM exd)
        |WHERE rank <= 3""".stripMargin,

    // the stored SQ8 codes restated from scratch: per-dim min/span book
    // over the index rows, byte codes, md5 over the comma-joined list
    "q232_sq8_attach" ->
      s"""WITH ${sqlIvfSqChain()}
         |SELECT vec_id, cell, md5(array_to_string(
         |  list_transform(codes, x -> CAST(x AS VARCHAR)), ','))
         |  AS code_md5
         |FROM scodes""".stripMargin,

    // SQ8 serving: every candidate reconstructed from its integer
    // codes (mn + (c·sc) // 255 per dim), exact integer-L2 rank over
    // the probed cells
    "q233_sq8_topk" ->
      s"""WITH ${sqlIvfSqChain(nProbe = 2)},
         |hrec AS MATERIALIZED (
         |  SELECT vec_id, cell, list(b.mn + (cu.code * b.sc) // 255
         |    ORDER BY cu.pos) AS r
         |  FROM (SELECT vec_id, cell, unnest(codes) AS code,
         |          generate_subscripts(codes, 1) AS pos FROM scodes) cu
         |  JOIN sqb b ON b.pos = cu.pos
         |  GROUP BY vec_id, cell),
         |approx AS (
         |  SELECT da.vec_id AS new_id, h.vec_id AS old_id,
         |    list_reduce(list_transform(list_zip(dq.q, h.r),
         |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS approx_d
         |  FROM dassignp da JOIN hrec h ON h.cell = da.cell
         |  JOIN qq dq ON dq.vec_id = da.vec_id)
         |SELECT new_id, old_id, CAST(rank AS INT) AS rank, approx_d FROM (
         |  SELECT *, row_number() OVER (PARTITION BY new_id
         |    ORDER BY approx_d, old_id) AS rank FROM approx)
         |WHERE rank <= 3""".stripMargin,

    // the q218 decomposition over the REGIME fixture (64 cells ≫ the
    // 8-entry codebook, structured within-cell spread) — residual arm
    "q226_regime_recall" ->
      s"""WITH $sqlRegimeVecs,
         |${sqlIvfPqChain("rvecs", 64)},
         |$sqlRecallTail""".stripMargin,

    // identical chain, raw codes — the A/B's control arm
    "q227_regime_raw" ->
      s"""WITH $sqlRegimeVecs,
         |${sqlIvfPqChain("rvecs", 64, residual = false)},
         |$sqlRecallTail""".stripMargin,

    // the q143 chain re-seeded at the autoK √N rule — ≙ matching over
    // the rebuilt index (rebuild dedups stored rows, so hist is exact)
    "q215_ivf_rebuild" ->
      s"""WITH hist AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 9),
         |delta AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 9),
         |cents AS (SELECT vec_id AS cent_id, embedding AS cent FROM (
         |    SELECT vec_id, embedding,
         |      row_number() OVER (ORDER BY vec_id) AS rn FROM hist)
         |  WHERE rn <= (SELECT greatest(8,
         |      CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM hist)),
         |hassign AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT h.vec_id, h.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY h.vec_id
         |        ORDER BY ${sqlCos("h.embedding", "c.cent")} DESC,
         |                 c.cent_id) AS r
         |    FROM hist h CROSS JOIN cents c)
         |  WHERE r = 1),
         |dassign AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT d.vec_id, d.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY ${sqlCos("d.embedding", "c.cent")} DESC,
         |                 c.cent_id) AS r
         |    FROM delta d CROSS JOIN cents c)
         |  WHERE r = 1)
         |SELECT new_id, old_id, rank, round(cs, 6) AS cos_sim FROM (
         |  SELECT d.vec_id AS new_id, h.vec_id AS old_id,
         |    ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |    row_number() OVER (PARTITION BY d.vec_id
         |      ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |               h.vec_id) AS rank
         |  FROM dassign d JOIN hassign h USING (cell))
         |WHERE rank = 1""".stripMargin,

    // the q143 chain with the candidate side anti-filtered by the
    // takedown set and the seeds drawn from the WRITE slice (the index
    // froze its centroids before the %10==8 append) — ≙ matching over
    // the post-remove+compact index
    "q213_rtbf_match" ->
      s"""WITH ${sqlIvfSplitChain(" WHERE h.vec_id % 20 <> 14",
             " WHERE vec_id % 10 <> 8")}
         |SELECT new_id, old_id, rank, round(cs, 6) AS cos_sim FROM (
         |  SELECT d.vec_id AS new_id, h.vec_id AS old_id,
         |    ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |    row_number() OVER (PARTITION BY d.vec_id
         |      ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |               h.vec_id) AS rank
         |  FROM dassign d JOIN hassign h USING (cell))
         |WHERE rank = 1""".stripMargin,

    // the refined-centroid chain: seeds → cosine-argmax assignment →
    // integer-exact quantized mean (the q91 floor-division discipline) →
    // REAL dequantization (bit-matching Spark's (cd/2^20).toFloat) →
    // reassign both sides → in-cell top-1. Empty cells keep their seed
    // (the LEFT JOIN / COALESCE), mirroring IvfIndex.write.
    "q193_ivf_refined" ->
      s"""WITH hist AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 9),
         |delta AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 9),
         |cents0 AS (SELECT vec_id AS cent_id, embedding AS cent
         |  FROM hist ORDER BY vec_id LIMIT 8),
         |a0 AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT h.vec_id, h.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY h.vec_id
         |        ORDER BY ${sqlCos("h.embedding", "c.cent")} DESC,
         |                 c.cent_id) AS r
         |    FROM hist h CROSS JOIN cents0 c)
         |  WHERE r = 1),
         |qh AS (
         |  SELECT cell, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
         |  FROM a0),
         |u AS (
         |  SELECT cell, pos,
         |    CAST((sum(v) - ((sum(v) % count(*)) + count(*)) % count(*))
         |      // count(*) AS BIGINT) AS cd
         |  FROM (SELECT cell, unnest(q) AS v,
         |          generate_subscripts(q, 1) AS pos FROM qh)
         |  GROUP BY cell, pos),
         |c1 AS (SELECT cell, list(cd ORDER BY pos) AS qc FROM u GROUP BY cell),
         |refined AS (
         |  SELECT c0.cent_id, COALESCE(list_transform(c1.qc,
         |      v -> CAST(CAST(v AS DOUBLE) / 1048576.0 AS REAL)), c0.cent)
         |    AS cent
         |  FROM cents0 c0 LEFT JOIN c1 ON c1.cell = c0.cent_id),
         |h2 AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT h.vec_id, h.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY h.vec_id
         |        ORDER BY ${sqlCos("h.embedding", "c.cent")} DESC,
         |                 c.cent_id) AS r
         |    FROM hist h CROSS JOIN refined c)
         |  WHERE r = 1),
         |d2 AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT d.vec_id, d.embedding, c.cent_id,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY ${sqlCos("d.embedding", "c.cent")} DESC,
         |                 c.cent_id) AS r
         |    FROM delta d CROSS JOIN refined c)
         |  WHERE r = 1)
         |SELECT new_id, old_id, rank, round(cs, 6) AS cos_sim FROM (
         |  SELECT d.vec_id AS new_id, h.vec_id AS old_id,
         |    ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |    row_number() OVER (PARTITION BY d.vec_id
         |      ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |               h.vec_id) AS rank
         |  FROM d2 d JOIN h2 h USING (cell))
         |WHERE rank = 1""".stripMargin,

    // pruning-cost gate: IVF top-1 (within-cell) vs brute top-1 (all
    // history) per delta vector; -1 stands in for "no candidate"
    "q190_vecdup_recall" ->
      s"""WITH ${sqlIvfSplitChain()},
         |ivf AS (
         |  SELECT new_id, round(cs, 6) AS ivf_cos FROM (
         |    SELECT d.vec_id AS new_id,
         |      ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |                 h.vec_id) AS rank
         |    FROM dassign d JOIN hassign h USING (cell))
         |  WHERE rank = 1),
         |brute AS (
         |  SELECT new_id, round(cs, 6) AS brute_cos FROM (
         |    SELECT d.vec_id AS new_id,
         |      ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |                 h.vec_id) AS rank
         |    FROM delta d CROSS JOIN hist h)
         |  WHERE rank = 1)
         |SELECT d.vec_id,
         |  COALESCE(i.ivf_cos, -1.0) AS ivf_cos,
         |  COALESCE(b.brute_cos, -1.0) AS brute_cos,
         |  CAST(COALESCE(i.ivf_cos, -1.0) = COALESCE(b.brute_cos, -1.0)
         |    AS BIGINT) AS cell_hit
         |FROM delta d
         |LEFT JOIN ivf i ON i.new_id = d.vec_id
         |LEFT JOIN brute b ON b.new_id = d.vec_id""".stripMargin,

    // the vec-dedup DECISION: top-1 within the cell vs the threshold;
    // delta vectors with an empty cell carry no top1 row → is_dup 0
    "q189_vecdup_batch" ->
      s"""WITH ${sqlIvfSplitChain()},
         |top1 AS (
         |  SELECT new_id, round(cs, 6) AS cos FROM (
         |    SELECT d.vec_id AS new_id,
         |      ${sqlCos("d.embedding", "h.embedding")} AS cs,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY ${sqlCos("d.embedding", "h.embedding")} DESC,
         |                 h.vec_id) AS rank
         |    FROM dassign d JOIN hassign h USING (cell))
         |  WHERE rank = 1)
         |SELECT d.vec_id,
         |  CAST(CASE WHEN t.cos >= 0.3 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
         |FROM delta d LEFT JOIN top1 t ON t.new_id = d.vec_id""".stripMargin,

    "q43_ann_ivf" ->
      s"""WITH assigned AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT v.vec_id, v.embedding, c.vec_id AS cent_id,
         |      row_number() OVER (PARTITION BY v.vec_id
         |        ORDER BY ${sqlCos("v.embedding", "c.embedding")} DESC,
         |                 c.vec_id) AS r
         |    FROM embeddings v CROSS JOIN embeddings c WHERE c.vec_id < 8)
         |  WHERE r = 1)
         |SELECT q_id, c_id, rank FROM (
         |  SELECT q.vec_id AS q_id, x.vec_id AS c_id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${sqlCos("q.embedding", "x.embedding")} DESC,
         |               x.vec_id) AS rank
         |  FROM assigned q JOIN assigned x USING (cell)
         |  WHERE q.vec_id < 10 AND x.vec_id <> q.vec_id)
         |WHERE rank <= 3""".stripMargin,

    "q34_embed_neardup" ->
      s"""SELECT vec_id_a, vec_id_b, round(cos_sim, 6) AS cos_sim FROM (
         |  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |    ${sqlCos("a.embedding", "b.embedding")} AS cos_sim
         |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
         |WHERE cos_sim > 0.2""".stripMargin,

    // Integer-exact mirror of q91: same quantization, BIGINT distances,
    // floor(sum/n) centroid update, ties to the lowest cluster id.
    "q91_kmeans" -> sqlKmeans,

    // Relational mirror of the PQ pipeline: subspaces via range(4),
    // argmin via row_number, the ADC lookup via a join on (m, cluster)
    // summed over m — same integers, different algebra.
    "q104_ann_pq" ->
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
        |  FROM embeddings),
        |sub AS (
        |  SELECT vec_id, CAST(t.range AS INT) AS m,
        |    q[t.range*16+1 : t.range*16+16] AS sub
        |  FROM q, range(4) t),
        |c0 AS (SELECT m, CAST(vec_id AS INT) AS cluster, sub AS cent
        |       FROM sub WHERE vec_id < 8),
        |d0 AS (
        |  SELECT s.vec_id, s.m, c.cluster,
        |    list_reduce(list_transform(list_zip(s.sub, c.cent),
        |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS dist2
        |  FROM sub s JOIN c0 c USING (m)),
        |a0 AS (SELECT vec_id, m, cluster FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |    ORDER BY dist2, cluster) AS rn FROM d0) WHERE rn = 1),
        |u AS (
        |  SELECT m, cluster, pos,
        |    CAST((sum(v) - ((sum(v) % count(*)) + count(*)) % count(*))
        |      // count(*) AS BIGINT) AS cd
        |  FROM (SELECT a0.m, a0.cluster, unnest(s.sub) AS v,
        |          generate_subscripts(s.sub, 1) AS pos
        |        FROM a0 JOIN sub s ON s.vec_id = a0.vec_id AND s.m = a0.m)
        |  GROUP BY m, cluster, pos),
        |c1 AS (SELECT m, cluster, list(cd ORDER BY pos) AS cent
        |       FROM u GROUP BY m, cluster),
        |d1 AS (
        |  SELECT s.vec_id, s.m, c.cluster,
        |    list_reduce(list_transform(list_zip(s.sub, c.cent),
        |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS dist2
        |  FROM sub s JOIN c1 c USING (m)),
        |codes AS (SELECT vec_id, m, cluster FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |    ORDER BY dist2, cluster) AS rn FROM d1) WHERE rn = 1),
        |qt AS (
        |  SELECT s.vec_id AS q_id, c.m, c.cluster,
        |    list_reduce(list_transform(list_zip(s.sub, c.cent),
        |      p -> (p[1]-p[2])*(p[1]-p[2])), (x, y) -> x + y) AS d
        |  FROM sub s JOIN c1 c USING (m) WHERE s.vec_id < 10),
        |approx AS (
        |  SELECT qt.q_id, codes.vec_id AS c_id,
        |    CAST(sum(qt.d) AS BIGINT) AS approx_d
        |  FROM codes JOIN qt ON qt.m = codes.m AND qt.cluster = codes.cluster
        |  GROUP BY qt.q_id, codes.vec_id)
        |SELECT q_id, c_id, rank, approx_d FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY approx_d, c_id) AS rank
        |  FROM approx WHERE c_id <> q_id)
        |WHERE rank <= 3""".stripMargin,

    // same kmeans CTE; the cap is a row_number over (md5(id), id)
    "q110_balanced_sample" ->
      s"""WITH assign AS ($sqlKmeans)
         |SELECT vec_id, cluster, rk FROM (
         |  SELECT vec_id, cluster, row_number() OVER (
         |    PARTITION BY cluster
         |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
         |  FROM assign)
         |WHERE rk <= 40""".stripMargin,

    "q92_semantic_dedup" ->
      s"""WITH assign AS ($sqlKmeans),
         |m AS (SELECT a.vec_id, a.cluster,
         |        lag(a.vec_id) OVER (PARTITION BY a.cluster
         |          ORDER BY a.vec_id) AS prev_id
         |      FROM assign a),
         |p AS (SELECT m.vec_id,
         |        CASE WHEN ${sqlCos("e.embedding", "pe.embedding")} > 0.2
         |          THEN 1 ELSE 0 END AS dup
         |      FROM m JOIN embeddings e ON e.vec_id = m.vec_id
         |             JOIN embeddings pe ON pe.vec_id = m.prev_id)
         |SELECT m.vec_id, m.cluster, m.prev_id,
         |  CAST(coalesce(p.dup, 0) AS BIGINT) AS is_dup
         |FROM m LEFT JOIN p ON p.vec_id = m.vec_id""".stripMargin,

    "q146_label_propagation" ->
      s"""WITH seeds AS (
         |  SELECT vec_id AS s_id, embedding AS s_emb, label AS s_label
         |  FROM embeddings WHERE vec_id % 5 = 0),
         |knn AS (
         |  SELECT vec_id, s_label FROM (
         |    SELECT t.vec_id, s.s_label,
         |      row_number() OVER (PARTITION BY t.vec_id
         |        ORDER BY ${sqlCos("t.embedding", "s.s_emb")} DESC, s.s_id)
         |        AS r
         |    FROM embeddings t CROSS JOIN seeds s
         |    WHERE t.vec_id % 5 <> 0)
         |  WHERE r <= 3),
         |votes AS (SELECT vec_id, s_label, CAST(count(*) AS INT) AS n_votes
         |  FROM knn GROUP BY vec_id, s_label)
         |SELECT vec_id, s_label AS pred_label, n_votes FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY n_votes DESC, s_label) AS rv FROM votes)
         |WHERE rv = 1""".stripMargin,

    "q205_pca_power" ->
      s"""WITH ${sqlPcaChain("")}
         |SELECT cen.vec_id, CAST(sum(cen.c * v12.v) AS BIGINT) AS proj
         |FROM cen JOIN v12 ON cen.i = v12.i GROUP BY cen.vec_id"""
        .stripMargin,

    // the q205 chain fitted on the REFERENCE slice only, then projection
    // + integer binning of BOTH slices
    "q210_embedding_drift" ->
      s"""WITH ${sqlPcaChain(" WHERE vec_id % 5 <> 0")},
         |exa AS (SELECT vec_id, CAST(i AS INT) AS i,
         |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) *
         |      (SELECT sc FROM scq)) AS BIGINT) AS v
         |  FROM (SELECT vec_id, embedding, unnest(range(1, 65)) AS i
         |        FROM embeddings)),
         |cena AS (SELECT vec_id, exa.i AS i, exa.v - m.mv AS c
         |  FROM exa JOIN m USING (i)),
         |proj AS MATERIALIZED (SELECT cena.vec_id,
         |    cena.vec_id % 5 = 0 AS is_new,
         |    CAST(sum(cena.c * v12.v) AS BIGINT) AS proj
         |  FROM cena JOIN v12 ON cena.i = v12.i GROUP BY cena.vec_id),
         |bounds AS (SELECT min(proj) AS lo, max(proj) AS hi
         |  FROM proj WHERE NOT is_new),
         |binned AS (SELECT is_new, greatest(0, least(15,
         |    ((proj - lo) * 16) // (hi - lo + 1))) AS bin
         |  FROM proj, bounds),
         |cnts AS MATERIALIZED (SELECT bin,
         |    sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS n_ref,
         |    sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS n_new
         |  FROM binned GROUP BY bin),
         |tot AS (SELECT sum(n_ref) AS t_ref, sum(n_new) AS t_new FROM cnts)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(n_ref AS BIGINT) AS n_ref,
         |  CAST(n_new AS BIGINT) AS n_new,
         |  round(n_ref / CAST(t_ref AS DOUBLE), 6) AS ref_rate,
         |  round(n_new / CAST(t_new AS DOUBLE), 6) AS new_rate,
         |  round(abs(n_new / CAST(t_new AS DOUBLE) -
         |    n_ref / CAST(t_ref AS DOUBLE)), 6) AS drift
         |FROM cnts, tot""".stripMargin,

    // the ±1 matrix regenerates from md5 in SQL exactly as the Spark
    // side regenerates it from MessageDigest — same strings, same hash
    "q206_srp_fingerprint" ->
      s"""WITH $sqlSrpBits
         |SELECT vec_id,
         |  CAST(sum(CASE WHEN b < 32
         |    THEN bit * (CAST(1 AS BIGINT) << (31 - b)) ELSE 0 END)
         |    AS BIGINT) AS h1,
         |  CAST(sum(CASE WHEN b >= 32
         |    THEN bit * (CAST(1 AS BIGINT) << (63 - b)) ELSE 0 END)
         |    AS BIGINT) AS h2
         |FROM bits GROUP BY vec_id""".stripMargin,

    // hamming stays at the BIT level relationally (no bit_count needed):
    // 64 aligned bit rows per (query, candidate) pair sum their diffs
    "q209_srp_recall" ->
      s"""WITH exact AS (SELECT q_id, c_id FROM (
         |    ${oraclesAnnTopk}) WHERE rank <= 3),
         |$sqlSrpBits,
         |qb AS (SELECT vec_id AS q_id, b, bit FROM bits
         |  WHERE vec_id < 10),
         |ham AS (SELECT qb.q_id, c.vec_id AS c_id,
         |    CAST(sum(CASE WHEN qb.bit <> c.bit THEN 1 ELSE 0 END)
         |      AS BIGINT) AS h
         |  FROM qb JOIN bits c ON qb.b = c.b AND c.vec_id <> qb.q_id
         |  GROUP BY 1, 2),
         |approx AS (SELECT q_id, c_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY h, c_id) AS r FROM ham) WHERE r <= 3)
         |SELECT e.q_id, CAST(count(a.c_id) AS INT) AS n_hit,
         |  round(count(a.c_id) / 3.0, 6) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.q_id = a.q_id AND e.c_id = a.c_id
         |GROUP BY e.q_id""".stripMargin
  )

  /** Shared CTE chain for q206/q209: quantized vectors → exploded dims →
    * md5-derived ±1 signs → per-(vec, plane) bit. MATERIALIZED where
    * referenced twice. Every line is FLUSH-LEFT: this string interpolates
    * into stripMargin callers, and an indented line containing a '|'
    * (the md5 seed separator) would be re-stripped up to that '|'. */
  private lazy val sqlSrpBits: String =
    s"""q AS (SELECT vec_id, list_transform(embedding,
       |x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
       |FROM embeddings),
       |ex AS (SELECT vec_id, CAST(j AS INT) AS j, q[CAST(j AS INT)] AS v
       |FROM (SELECT vec_id, q, unnest(range(1, 65)) AS j FROM q)),
       |signs AS (SELECT bb.b AS b, jj.j AS j,
       |CASE WHEN substr(md5('srp|' || CAST(bb.b AS VARCHAR) || '|' ||
       |CAST(jj.j AS VARCHAR)), 1, 1) BETWEEN '0' AND '7'
       |THEN 1 ELSE -1 END AS sg
       |FROM (SELECT CAST(unnest(range(0, 64)) AS INT) AS b) bb
       |CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS INT) AS j) jj),
       |bits AS MATERIALIZED (SELECT vec_id, b,
       |CASE WHEN sum(sg * v) > 0 THEN 1 ELSE 0 END AS bit
       |FROM ex JOIN signs s ON ex.j = s.j + 1 GROUP BY vec_id, b)"""
      .stripMargin

  /** q31's oracle text, shared with q209 (a map self-reference at
    * initialization would be circular). */
  private lazy val sqlAnnTopk: String =
    s"""SELECT q_id, c_id, rank FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCos("q.embedding", "c.embedding")} DESC, c.vec_id) AS rank
       |  FROM embeddings q CROSS JOIN embeddings c
       |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id)
       |WHERE rank <= 5""".stripMargin

  private def oraclesAnnTopk: String = sqlAnnTopk

  /** DuckDB mirror of [[pcaLoadings]] as a CTE chain: the same integer
    * trajectory, the 12 power iterations unrolled as (w_k, s_k, v_k)
    * triples, fitted on `embeddings$where`. Ends with `cen` (the fitted
    * slice's centered values), `m` (means) and `v12` (loadings) in
    * scope for the caller's final SELECT. */
  private def sqlPcaChain(where: String): String = {
    // exact floor division via the pmod trick — `//` truncates in DuckDB,
    // but on the exact multiple it equals floor, same as Spark's `div`
    def fd(x: String, d: String) = s"($x - ((($x % $d) + $d) % $d)) // $d"
    // AS MATERIALIZED: each v_k references w_k twice and w_k references
    // v_{k-1} — inlined, the 12-step chain expands 2^12 copies of the
    // base scan (observed as an fd-exhaustion in DuckDB); materializing
    // pins each 64-row iterate to one evaluation
    // row-count-selected quantization (the pcaScale mirror): tier 1
    // (2^20) at gate SFs, tier 2 (2^14) past 2e6 fit rows — same CASE,
    // same threshold, so both engines switch together
    val sc = "(SELECT sc FROM scq)"
    val its = (1 to 12).map { k =>
      s"""w$k AS MATERIALIZED (SELECT c.i AS i, sum(c.cs * v.v) AS w
         |  FROM cells c JOIN v${k - 1} v ON c.j = v.i GROUP BY c.i),
         |s$k AS MATERIALIZED (
         |  SELECT max(abs(w)) // $sc + 1 AS dd FROM w$k),
         |v$k AS MATERIALIZED (
         |  SELECT i, ${fd("w", "dd")} AS v FROM w$k, s$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""scq AS MATERIALIZED (SELECT CASE WHEN count(*) <= 2000000
       |    THEN CAST(1048576 AS BIGINT) ELSE CAST(16384 AS BIGINT) END
       |    AS sc FROM embeddings$where),
       |ex AS (SELECT vec_id, CAST(i AS INT) AS i,
       |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * $sc)
       |      AS BIGINT) AS v
       |  FROM (SELECT vec_id, embedding, unnest(range(1, 65)) AS i
       |        FROM embeddings$where)),
       |m AS MATERIALIZED (SELECT i, ${fd("sum(v)", "count(*)")} AS mv
       |  FROM ex GROUP BY i),
       |cen AS (SELECT vec_id, ex.i AS i, ex.v - m.mv AS c
       |  FROM ex JOIN m USING (i)),
       |cells AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
       |    ${fd("sum(a.c * b.c)", sc)} AS cs
       |  FROM cen a JOIN cen b USING (vec_id) GROUP BY a.i, b.i),
       |v0 AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS i,
       |  $sc AS v),
       |$its""".stripMargin
  }

  /** DuckDB mirror of [[kmeansAssign]] (q91/q92 share it). */
  private lazy val sqlKmeans: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
      |  FROM embeddings),
      |c0 AS (SELECT CAST(vec_id AS INT) AS cluster, q AS cent
      |       FROM q WHERE vec_id < 8),
      |d1 AS (
      |  SELECT v.vec_id, v.q, c.cluster,
      |    list_reduce(list_transform(list_zip(v.q, c.cent),
      |      p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS dist2
      |  FROM q v CROSS JOIN c0 c),
      |a1 AS (
      |  SELECT vec_id, q, cluster FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist2, cluster) AS rn FROM d1) WHERE rn = 1),
      |u AS (
      |  SELECT cluster, pos,
      |    CAST((sum(v) - ((sum(v) % count(*)) + count(*)) % count(*))
      |      // count(*) AS BIGINT) AS cd
      |  FROM (SELECT cluster, unnest(q) AS v,
      |          generate_subscripts(q, 1) AS pos FROM a1)
      |  GROUP BY cluster, pos),
      |c1 AS (SELECT cluster, list(cd ORDER BY pos) AS cent
      |       FROM u GROUP BY cluster),
      |d2 AS (
      |  SELECT v.vec_id, c.cluster,
      |    list_reduce(list_transform(list_zip(v.q, c.cent),
      |      p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) AS dist2
      |  FROM q v CROSS JOIN c1 c)
      |SELECT vec_id, cluster, dist2 FROM (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id
      |    ORDER BY dist2, cluster) AS rn FROM d2) WHERE rn = 1""".stripMargin
}
