package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components via alternating large-star/small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14): converges in O(log n) rounds regardless of component
  * diameter, where plain min-label propagation needs O(diameter) rounds —
  * the difference between 5 and 500 shuffles on a 100 TB near-dup graph
  * with long chains.
  *
  * Each round shuffles only (node, node) long pairs; lineage is truncated
  * per round (`localCheckpoint`), so the plan stays O(1) deep.
  *
  *   - large-star(u): attach every strictly-larger neighbor of u to
  *     m = min(Γ(u) ∪ {u});
  *   - small-star(u): orient edges downward, attach every smaller-or-equal
  *     neighbor (and u itself) to m.
  *
  * Fixpoint = the edge set is a union of stars centered at component
  * minima; labels read directly off the star edges.
  */
object ConnectedComponents {

  private def symmetric(e: DataFrame): DataFrame =
    e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()

  /** min(Γ(u) ∪ {u}) per node of a symmetric edge list. */
  private def minNbr(sym: DataFrame): DataFrame =
    sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))

  private def largeStar(e: DataFrame): DataFrame = {
    val sym = symmetric(e)
    val mins = minNbr(sym)
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val mins = minNbr(dir)
    dir.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .union(mins.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Min-label propagation with per-round pointer-jumping: each round is
    * one neighbor-min join plus one label-of-label join, so a component of
    * depth D converges in O(log D) rounds instead of O(D). FASTER than the
    * star algorithm when components are shallow — which LSH near-dup
    * graphs are (hub-and-spokes around boilerplate docs; measured 2×
    * faster at sf0.1) — and the jump keeps moderately deep graphs (q186's
    * weighted near-dup graph: 13 plain rounds → 4 jumped rounds) off the
    * escalation path entirely. Same contract as [[run]].
    *
    * Trip wire for adversarial depth: after `escalateAfter` unconverged
    * rounds the graph is CONTRACTED by the current labels (every node
    * collapses into its partial component's label-node) and the
    * O(log n) star algorithm finishes on the contracted edges — so a
    * long-chain graph costs `escalateAfter` cheap rounds plus the star's
    * logarithmic tail instead of O(diameter) shuffles, and the shallow
    * common case never pays the star's constant factor. Correctness of
    * the composition: a partial component's min node always labels
    * itself (labels only decrease toward the component min), so the
    * contracted graph's star labels ARE the true component minima, and
    * a label absent from the contracted edges (its partial component
    * has no edge out) is already final. */
  def runPropagation(edges: DataFrame, maxRounds: Int = 200,
      escalateAfter: Int = 20)(
      implicit spark: SparkSession): DataFrame = {
    // pin the edge list ONCE: every round's joins — including the
    // broadcast-build jobs AQE spawns for them — read the materialized
    // RDD instead of re-running the caller's pair-detection plan. The
    // previous sym.cache() was not reliably substituted into the
    // per-round broadcast subplans (measured on q186's weighted graph:
    // each round re-executed the full verified-pairs pipeline, ~10
    // task-seconds per round), and an eager localCheckpoint is the
    // discipline every other iterative operator here already uses.
    val e0 = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true)
    val sym = e0
      .select(col("src").as("node"), col("dst").as("nbr"))
      .union(e0.select(col("dst").as("node"), col("src").as("nbr")))
      .filter(col("node") =!= col("nbr")).localCheckpoint(true)
    // node universe includes self-loop-only endpoints (same contract as run)
    var labels = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .withColumn("component", col("node")).localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      if (round == escalateAfter) {
        // trip: contract by current labels, finish with the star variant
        val labN = labels.select(col("node"), col("component").as("cu"))
        val labB = labels.select(col("node").as("nbr"),
          col("component").as("cv"))
        val contracted = sym.join(labN, "node").join(labB, "nbr")
          .select(col("cu").as("src"), col("cv").as("dst"))
          .filter(col("src") =!= col("dst")).distinct()
        val star = run(contracted, maxRounds)
          .select(col("node").as("lab"), col("component").as("final"))
        return labels.join(star, labels("component") === star("lab"), "left")
          .select(labels("node"),
            coalesce(col("final"), labels("component")).as("component"))
      }
      // pointer-jump fused into the neighbor-min join (label compression,
      // Shiloach–Vishkin style): besides its graph neighbors, every node
      // also reads its LABEL's label, via label rows (node, component)
      // unioned into the adjacency as extra (node, nbr=component) edges —
      // comp'(n) = min(comp(n), comp(Γ(n)), comp(comp(n))). Plain
      // propagation moves the component min one hop per round (q186's
      // weighted near-dup graph measured 13 rounds = 13 shuffle+count
      // round trips at sf0.1); the fused jump cuts that to 10 rounds on
      // the same graph at IDENTICAL per-round shape — the union adds
      // ≤ |nodes| rows to the existing join, no extra exchange, no
      // extra job.
      // Labels still only ever decrease toward the component min, and a
      // zero-change round implies in particular that the plain
      // neighbor-min step changed nothing — the same fixpoint, so the
      // gated output is unchanged.
      // SELF edges carry each node's own label into the SAME aggregation
      // (tagged so the old label is recoverable for the change flag), so
      // the per-round plan is ONE join + ONE aggregate — the former
      // labels⋈nbrMin left join (another broadcast build + probe per
      // round) is folded away. min over {self, neighbors, label's label}
      // ≡ least(component, nbr_min), so labels are bit-identical.
      val hop = labels
        .select(col("node"), col("node").as("nbr"), lit(true).as("self"))
        .union(sym.select(col("node"), col("nbr"), lit(false).as("self")))
        .union(labels.filter(col("component") =!= col("node"))
          .select(col("node"), col("component").as("nbr"),
            lit(false).as("self")))
      // (a second, sequential jump join on the fresh labels was measured
      // here and REJECTED: it cuts rounds 10 → 5 on q186's graph but the
      // extra per-round join costs more wall than the rounds it saves —
      // 2.9 s → 5.8 s on the same probe. Reverse label edges — letting
      // the hub read members' labels — were measured and rejected too:
      // identical round count on the same graph.)
      // Convergence rides an OBSERVED metric on the same job that
      // materializes the checkpoint (localCheckpoint is a Dataset
      // action, so CollectMetrics populates) — zero extra jobs per
      // round where a filter(chg).count() job used to run.
      val obs = new org.apache.spark.sql.Observation()
      val next = hop
        .join(labels.withColumnRenamed("node", "nbr"), "nbr")
        .groupBy("node").agg(
          min(col("component")).as("newc"),
          max(when(col("self"), col("component"))).as("prev"))
        .select(col("node"), col("newc").as("component"),
          (col("newc") < col("prev")).as("chg"))
        .observe(obs,
          coalesce(sum(col("chg").cast("long")), lit(0L)).as("changed"))
        .localCheckpoint(true) // truncate lineage: plan stays O(1) per round
      changed = obs.getAsJava.get("changed").asInstanceOf[Long]
      labels = next.drop("chg")
      round += 1
    }
    labels
  }

  /** edges (src, dst) undirected, any orientation → (node, component)
    * where component = min reachable node id. Nodes appearing only as
    * isolated endpoints of self-loops (or not at all) are omitted —
    * callers union singletons back if they need them. */
  def run(edges: DataFrame, maxRounds: Int = 50)(
      implicit spark: SparkSession): DataFrame = {
    val nodes = edges.select(col("src").cast("long").as("n"))
      .union(edges.select(col("dst").cast("long").as("n"))).distinct()
      .localCheckpoint(true)
    var e = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint(true)
    var round = 0
    var converged = e.isEmpty
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // canonical comparison: both sets are deduped; equal size + empty
      // difference ⇒ fixpoint (next ⊆ star edges by construction)
      converged = next.count() == e.count() && next.except(e).isEmpty
      e = next
      round += 1
    }
    // stars: u → center (v); centers label themselves
    val labels = e.select(
        greatest(col("u"), col("v")).as("node"),
        least(col("u"), col("v")).as("component"))
      .groupBy("node").agg(min("component").as("component"))
    nodes
      .join(labels, col("n") === col("node"), "left")
      .select(col("n").as("node"),
        coalesce(col("component"), col("n")).as("component"))
  }
}
