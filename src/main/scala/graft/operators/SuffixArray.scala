package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling.
  *
  * The ExactSubstr dedup of Lee et al. 2022 (arXiv:2107.06499) builds ONE
  * suffix array over the whole tokenized corpus and reads duplicated
  * spans off adjacent-suffix LCPs. The windowed q179/q181 family
  * approximates that signal without the array; this operator IS the
  * array, re-expressed for Spark: the classic prefix-doubling algorithm
  * (Manber–Myers 1990) as O(log run-length) declarative rounds. Each
  * round costs exactly two keyed exchanges over 24-byte
  * (doc_id, p, rank) triples — suffix TEXT never shuffles after the
  * seed round:
  *
  *   1. `lead(rank, h)` over a per-document window (keyed by doc_id,
  *      group size = document length) replaces the textbook
  *      rank-at-p+h self-join — no join, no second copy of the table;
  *   2. the (rank, rank@p+h) pairs are re-ranked IN PLACE by
  *      [[denseRankInPlace]]: range repartition (global order across
  *      partitions, equal keys never split), ONE partition-local
  *      sorted pass computing the pair-change flag + running sum
  *      (r16: this pass previously rode a Window over _pid, a second
  *      full-payload hash exchange), and numPartitions prefix
  *      offsets collected to the driver (a bounded artifact) — no
  *      distinct, no global window, no join-back.
  *
  * The seed round ranks 4-token slices (built in-row BEFORE the
  * position explode, so each exploded row carries 4 tokens, not the
  * whole document), starting the doubling at h=4 — two rounds cheaper
  * than single-token seeding.
  *
  * Scale notes (100 TB):
  *   - suffixes are TOKEN-level (the granularity the paper dedups at),
  *     so N = corpus token count, not char count;
  *   - every round's rank table is localCheckpointed: O(1) plan depth
  *     (the q196 discipline), and the checkpoint doubles as the stable
  *     snapshot the offsets pass and the next round both read;
  *   - convergence is detected by rank-class splitting: prefix-doubling
  *     classes only ever split, so an unchanged distinct-rank count is
  *     the fixpoint (positions still tied then have IDENTICAL suffixes
  *     to the end — exactly dense-rank semantics). Natural corpora
  *     converge in ~log2(longest repeated run) rounds;
  *   - nothing is ever corpus-pairwise and no step funnels through one
  *     partition.
  */
object SuffixArray {

  /** The session's configured shuffle parallelism — the cap for the
    * adaptive range-partition widths below. */
  private def df2parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Dense-rank `df` by `keys` without a single-partition window and
    * without a distinct+join-back round trip: range-repartition (equal
    * tuples land in one partition, partition index = global key order),
    * flag rows whose key differs from the previous row in the
    * partition-local sort, running-sum the flags, then add per-partition
    * prefix offsets (one ≤numShufflePartitions-sized collect). Returns
    * the ranked frame (localCheckpointed — both the offsets pass and the
    * caller read one materialized snapshot, so partition ids cannot
    * drift) and the total number of rank classes.
    */
  /** The pre-checkpoint flag plan of [[denseRankInPlace]] — exposed so
    * SuffixArraySpec can pin its per-round exchange count (1: the range
    * repartition; r16 removed the pid-window hash). The key-change flag
    * and its running sum are computed by ONE partition-local pass over
    * the range-sorted rows: the previous Window.partitionBy(_pid)
    * formulation re-shuffled the full payload by _pid (a hash exchange
    * that moved every byte a second time) and re-sorted it, only to
    * read each row's predecessor — which the sortWithinPartitions
    * order already provides. The pass is a mapPartitions (the q207
    * decode-pipeline class): sequential scan, O(1) state, no
    * corpus-sized structure, deterministic for a fixed partitioning —
    * and the eager localCheckpoint in [[denseRankInPlace]] pins that
    * partitioning before the offsets job reads _pid.
    *
    * Supported key types (r16 ADVICE): the per-row key comparison uses
    * java.util.Objects.equals on EXTERNAL row values — correct for
    * string/numeric keys (the only callers) and for array types (Seq
    * equality is element-wise), but NOT for BinaryType (Array[Byte]
    * compares by reference, so every row would open a new rank class). */
  private[graft] def flagPlan(df: DataFrame, keys: Seq[String],
      numParts: Int = 0): DataFrame = {
    val kcols = keys.map(col)
    val sorted = (if (numParts > 0) df.repartitionByRange(numParts, kcols: _*)
      else df.repartitionByRange(kcols: _*))
      .sortWithinPartitions(kcols: _*)
    val outSchema = sorted.schema
      .add("_pid", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("_run", org.apache.spark.sql.types.LongType, nullable = false)
    val ki = keys.map(sorted.schema.fieldIndex).toArray
    require(!ki.exists(i => sorted.schema(i).dataType ==
        org.apache.spark.sql.types.BinaryType),
      "flagPlan: BinaryType keys compare by reference (see scaladoc)")
    sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var run = 0L
      var prev: Array[Any] = null
      it.map { r =>
        val k = ki.map(i => r.get(i))
        val same = prev != null && {
          var i = 0
          var eq = true
          while (eq && i < k.length) {
            eq = java.util.Objects.equals(k(i), prev(i)); i += 1
          }
          eq
        }
        if (!same) { run += 1; prev = k }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ run)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Returns (ranked frame, rank-class count, row count) — the row count
    * rides the same per-partition agg, so the all-classes-singleton
    * early exit in [[tokenSuffixRanks]] costs no extra job. */
  private[graft] def denseRankInPlace(df: DataFrame, keys: Seq[String],
      out: String, numParts: Int = 0): (DataFrame, Long, Long) = {
    val flagged = flagPlan(df, keys, numParts).localCheckpoint(true)
    val perPart = flagged.groupBy("_pid")
      .agg(max("_run").as("n"), count(lit(1)).as("rows"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      perPart.map { case (pid, n, _) =>
        val o = pid -> acc; acc += n; o }.toMap
    }
    val total = perPart.map(_._2).sum
    val rows = perPart.map(_._3).sum
    val ranked = flagged
      .withColumn(out,
        col("_run") + element_at(typedLit(offsets), col("_pid")))
      .drop("_pid", "_run")
    (ranked, total, rows)
  }

  /** Token-level suffix ranks for a corpus: one row per (doc_id, p) with
    * `srank` = dense rank of the token suffix `toks[p..]` in the global
    * lexicographic order of ALL suffixes of ALL documents (suffixes never
    * cross document boundaries). Ties (srank shared by >1 position) are
    * positions whose remaining suffixes are IDENTICAL.
    *
    * `docs` must have `doc_id`; `tokens` is the token-array column.
    */
  def tokenSuffixRanks(docs: DataFrame, tokens: Column,
      seedWidth: Int = 8): DataFrame = {
    // the doubling can stop once h covers the longest suffix: every
    // comparison past that depth sees only the end-sentinel, so the
    // round cannot split a class (one cheap agg, saves the final no-op
    // round whenever repeats run long enough that classes still split
    // at h = maxLen/2)
    // empty-corpus guard: max over zero rows is null — rank an empty
    // seed frame (one cheap pass) instead of NPEing on getInt
    val mxRow = docs.agg(max(size(tokens)),
      sum(size(tokens).cast("long"))).head()
    val maxLen = if (mxRow.isNullAt(0)) 0L else mxRow.getInt(0).toLong
    val totalPos = if (mxRow.isNullAt(1)) 0L else mxRow.getLong(1)
    // Scale-ADAPTIVE rank parallelism (guide §2, the r16 CC lesson):
    // the explicit repartitionByRange inside denseRankInPlace is not
    // AQE-coalesced, so a constant partition count turns each tiny
    // round into block-fetch/launch overhead at bench scale while a
    // too-small constant would single-thread a real corpus. Derive the
    // width from the bytes actually in flight (~28 B/triple in the
    // doubling rounds, plus ~7 B/token of seed slice in the seed
    // round), targeting ~32 MB per range partition, capped at the
    // session's shuffle parallelism.
    val maxParts = df2parts(docs)
    def parts(rowBytes: Long): Int = math.max(1L, math.min(maxParts.toLong,
      totalPos * rowBytes / (32L << 20) + 1L)).toInt
    val seedParts = parts(28L + 7L * seedWidth)
    val rankParts = parts(28L)
    // seed: per-position seedWidth-token slices, built in-row before the
    // explode (the seed round's one range-sort compares seedWidth tokens
    // at once, so the doubling starts at h=seedWidth — each doubling of
    // the seed multiplies the seed-round payload but deletes a full
    // 3-exchange doubling round). The shipped production width is 32
    // (TextOps.suffixRanks): with the joined-string seed key below, the
    // r16 interleaved probe measured 16 → 4.46 s, 32 → 3.97 s,
    // 64 → 3.34 s min-of-3 at sf0.1 (maxLen≈128, so 32 leaves at most
    // two doubling rounds). 64 was rejected: its extra ~0.6 s here buys
    // a 2× seed-round payload, which at corpus scale is the dominant
    // byte term; width stays a parameter, re-measure per corpus.
    // The seed key is the slice JOINED with U+0000 rather than an
    // array<string>: NUL sorts below every byte that can occur inside a
    // UTF-8 token (the classic suffix-array sentinel), so unsigned
    // byte-wise comparison of the joined strings is order- and
    // equality-identical to element-wise comparison of the slices — and
    // the seed round's range-sort then compares ONE contiguous string
    // per row instead of walking 16 ArrayData elements, with roughly
    // half the shuffle payload (no per-element offsets/nulls). Assumes
    // tokens never contain U+0000, which split-on-space tokens of any
    // text corpus satisfy. Measured (SuffixProbe, sf0.1): 5.1–5.7 s →
    // see OPTIMIZATION_r16.md.
    val seeded = docs
      .select(col("doc_id"), tokens.as("_toks"))
      .select(col("doc_id"), posexplode(
        transform(col("_toks"),
          (_, i) => array_join(slice(col("_toks"), i + 1, lit(seedWidth)),
            "\u0000")))
        .as(Seq("_p0", "_k")))
      .select(col("doc_id"), (col("_p0") + 1).cast("long").as("p"),
        col("_k"))
    var (r, classes, rows) =
      denseRankInPlace(seeded, Seq("_k"), "rank", seedParts)
    r = r.select(col("doc_id"), col("p"), col("rank"))
    var prevClasses = -1L
    var h = seedWidth.toLong
    // each round extends the compared prefix from h to 2h tokens; stop
    // when no rank class split (the suffix-equivalence fixpoint) OR when
    // every class is already a singleton (classes == rows: the next
    // round provably cannot split anything — on natural corpora, where
    // all suffixes usually become distinct, this skips one full
    // 3-exchange dead round the fixpoint test alone would pay)
    while (classes != prevClasses && classes != rows && h < maxLen) {
      val wdoc = Window.partitionBy("doc_id").orderBy("p")
      val paired = r.select(col("doc_id"), col("p"),
        col("rank").as("_r1"),
        coalesce(lead("rank", h.toInt).over(wdoc), lit(0L)).as("_r2"))
      // _r2 = 0 marks a suffix that ends before p+h: sorts first, like
      // the shorter string in a prefix comparison
      val (ranked, n, _) = denseRankInPlace(paired, Seq("_r1", "_r2"), "rank", rankParts)
      r = ranked.select(col("doc_id"), col("p"), col("rank"))
      prevClasses = classes
      classes = n
      h *= 2
    }
    r.withColumnRenamed("rank", "srank")
  }
}
