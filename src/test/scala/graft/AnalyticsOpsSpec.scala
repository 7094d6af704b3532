package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.AnalyticsOps

/** Semantic pins for the event-analytics pack beyond the DuckDB hash gate:
  * the funnel must be monotone (a later stage can never out-count an
  * earlier one), the transition matrix must be row-stochastic, the exact
  * integer z²-test must agree with the plain double formulation away from
  * the boundary, and q151's distributed prefix-sum must equal the
  * single-window cumulative sum it replaces — on every partition count.
  */
class AnalyticsOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("q147: funnel counts are monotone non-increasing from stage 1 to 4") {
    val rows = AnalyticsOps.defs("q147_funnel")(spark, sf)
      .orderBy("stage_idx").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("signup", "view", "click", "purchase"))
    val ns = rows.map(_.getLong(2))
    ns.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"funnel not monotone: ${ns.mkString(",")}")
    }
    assert(ns.head > 0)
  }

  test("q148: offset-0 cell of each cohort counts the full cohort") {
    val rows = AnalyticsOps.defs("q148_retention_cohort")(spark, sf).collect()
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (cw, rs) =>
      val at0 = rs.find(_.getLong(1) == 0L)
      assert(at0.isDefined, s"cohort $cw missing offset 0")
      // every user is active in their own first week by definition, so no
      // later offset can exceed the offset-0 population
      val n0 = at0.get.getLong(2)
      rs.foreach(r => assert(r.getLong(2) <= n0,
        s"cohort $cw offset ${r.getLong(1)} out-counts offset 0"))
    }
  }

  test("q149: transition matrix is row-stochastic (each prev row sums to ~1)") {
    val rows = AnalyticsOps.defs("q149_event_transitions")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (prev, rs) =>
      val psum = rs.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 1e-4, s"row $prev sums to $psum")
    }
  }

  test("q150: exact integer z²-test matches the double 3-sigma rule") {
    val flagged = AnalyticsOps.defs("q150_value_anomalies")(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // recompute with plain double mean/stddev_pop; no sf0.001 value sits
    // within 1e-6 sigma of the boundary, so the sets must agree exactly
    val ev = graft.core.Tables.load(spark, sf, "events")
    val st = ev.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_pop("value").as("sd"))
    val dbl = ev.join(st, "event_type")
      .filter(abs(col("value") - col("mu")) > col("sd") * 3)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(flagged == dbl,
      s"exact-vs-double mismatch: ${(flagged diff dbl) ++ (dbl diff flagged)}")
  }

  test("q152: session stats are consistent with q17's session assignment") {
    val stats = AnalyticsOps.defs("q152_session_stats")(spark, sf).collect()
    // same gap rule as q17 → same number of (user, session) groups, and
    // the per-session event counts must sum back to the event count
    val q17 = graft.queries.Relational.defs("q17_sessionize")(spark, sf)
      .select("user_id", "session_id").distinct().count()
    assert(stats.length.toLong == q17)
    val total = graft.core.Tables.load(spark, sf, "events").count()
    assert(stats.map(_.getLong(2)).sum == total)
    // a single-event session has zero duration; none can be negative
    stats.foreach(r => assert(r.getLong(3) >= 0))
  }

  test("q153: gap-fill emits the full dense grid and preserves totals") {
    val rows = AnalyticsOps.defs("q153_timeseries_gapfill")(spark, sf).collect()
    val hours = rows.map(_.getLong(0)).distinct
    val types = rows.map(_.getString(1)).distinct
    assert(rows.length == hours.length * types.length, "grid not dense")
    assert(hours.max - hours.min + 1 == hours.length, "hour range has holes")
    val total = graft.core.Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(2)).sum == total)
    assert(rows.exists(_.getLong(2) == 0L), "no gap was actually filled")
  }

  test("q154: count-min estimates are always >= the exact count") {
    val rows = AnalyticsOps.defs("q154_countmin_topk")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS under-estimated ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}")
    }
  }

  test("q156: cube granularities are mutually consistent") {
    val rows = AnalyticsOps.defs("q156_cube_totals")(spark, sf).collect()
    val grand = rows.filter(_.getLong(3) == 3L)
    assert(grand.length == 1)
    val total = grand.head.getLong(2)
    // per-type (gid 1: wk aggregated away) and per-week (gid 2) slices
    // must each re-sum to the grand total, cells (gid 0) too
    Seq(0L, 1L, 2L).foreach { gid =>
      val s = rows.filter(_.getLong(3) == gid).map(_.getLong(2)).sum
      assert(s == total, s"gid $gid sums to $s != $total")
    }
  }

  test("q157: SCD2 intervals chain correctly per key") {
    val rows = graft.queries.CdcOps.defs("q157_scd2_history")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      // closed intervals are strictly positive-width; the version chain
      // never overlaps (valid_to <= next valid_from); at most ONE open
      // (live) version per key, and only in the final position
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3), s"user $uid: open interval not last")
          assert(a.getLong(3) > a.getLong(2), s"user $uid: empty interval")
          assert(a.getLong(3) <= b.getLong(2), s"user $uid: overlap")
        case _ =>
      }
      assert(sorted.count(_.isNullAt(3)) <= 1, s"user $uid: two live rows")
    }
  }

  test("q158: fuzzy match recovers the corrupted identity for nearly all " +
    "queries, and every reported match clears the threshold") {
    val rows = graft.queries.AnalyticsOps.defs("q158_fuzzy_match")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 400000L))
    val selfRate = rows.count(r => r.getLong(0) == r.getLong(1)).toDouble /
      rows.length
    assert(selfRate >= 0.9, s"self-match rate $selfRate")
  }

  test("q159: incremental merge equals full recompute for any split") {
    // the oracle already pins the 10% split; re-check with a different
    // delta fraction so the merge (not the split choice) is what's proven
    val ev = graft.core.Tables.load(spark, sf, "events").select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "error", lit(-1L)).otherwise(lit(1L))
        .as("sign"),
      round(col("value") * 100, 0).cast("long").as("cents"))
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("user_id")
      .agg(sum("sign").as("n"), sum(col("sign") * col("cents")).as("s"))
    val full = agg(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = agg(ev.filter(col("event_id") % 3 =!= 0))
    val delta = agg(ev.filter(col("event_id") % 3 === 0))
    val merged = base.join(delta.withColumnRenamed("n", "dn")
        .withColumnRenamed("s", "ds"), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == full)
  }

  test("q160: robust flags differ from 3-sigma where sigma is inflated") {
    val robust = graft.queries.AnalyticsOps
      .defs("q160_robust_anomalies")(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val sigma = graft.queries.AnalyticsOps
      .defs("q150_value_anomalies")(spark, sf)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // on a heavy-tailed value column MAD resists the outliers that
    // inflate sigma, so the robust rule flags a superset
    assert(robust.nonEmpty && sigma.nonEmpty)
    assert(sigma.subsetOf(robust),
      s"3-sigma flagged ids the robust rule missed: ${sigma diff robust}")
    assert(robust.size > sigma.size)
  }

  test("q161: bins are equi-depth (each decile within rounding of n/10) " +
    "and monotone in value") {
    val rows = graft.queries.AnalyticsOps
      .defs("q161_equidepth_bins")(spark, sf).collect()
    rows.groupBy(_.getString(1)).foreach { case (tpe, rs) =>
      val n = rs.length
      val byBin = rs.groupBy(_.getInt(3)).view.mapValues(_.length)
      assert(byBin.keys.min >= 1 && byBin.keys.max <= 10)
      // value-based binning puts ties in one bin, so a bin can deviate
      // from n/10 by at most the largest tie run; cents ties are rare in
      // this data — allow 3x slack rather than pin the tie structure
      byBin.foreach { case (b, c) =>
        assert(c <= math.max(3 * n / 10, 3), s"$tpe bin $b holds $c of $n")
      }
      // monotone: every value in bin b is <= every value in bin b+1
      val maxPerBin = rs.groupBy(_.getInt(3)).view
        .mapValues(_.map(_.getDouble(2)).max).toMap
      val minPerBin = rs.groupBy(_.getInt(3)).view
        .mapValues(_.map(_.getDouble(2)).min).toMap
      maxPerBin.keys.toSeq.sorted.sliding(2).foreach {
        case Seq(a, b) => assert(maxPerBin(a) <= minPerBin(b) + 1e-9)
        case _ =>
      }
    }
  }

  test("q162: correlation is in [-1, 1] and matches Spark's corr()") {
    val rows = graft.queries.AnalyticsOps
      .defs("q162_correlation")(spark, sf).collect()
    assert(rows.length == 5)
    val ev = graft.core.Tables.load(spark, sf, "events").select(
      col("event_type"),
      round(col("value") * 100, 0).cast("long").as("x"),
      expr("(ts div 3600000000000) % 24").as("y"))
    val ref = ev.groupBy("event_type").agg(corr("x", "y").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - ref(r.getString(0))) < 1e-4,
        s"${r.getString(0)}: $c vs corr() ${ref(r.getString(0))}")
    }
  }

  test("q163: native session_window agrees with the lag/cumsum shape") {
    val rows = graft.queries.AnalyticsOps
      .defs("q163_session_window")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getLong(3)).sum == total)
    // windows are well-formed and non-overlapping per user
    rows.groupBy(_.getLong(0)).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.foreach(r => assert(r.getLong(2) > r.getLong(1)))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
          s"user $uid sessions overlap")
        case _ =>
      }
    }
  }

  test("q164: A/B verdict matches the double z-test and the null split " +
    "is balanced") {
    val r = graft.queries.AnalyticsOps.defs("q164_ab_test")(spark, sf)
      .collect().head
    val (n1, x1, n2, x2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n1 > 0 && n2 > 0)
    // md5 parity split ≈ half/half
    assert(math.abs(n1 - n2).toDouble / (n1 + n2) < 0.25)
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val p = (x1 + x2).toDouble / (n1 + n2)
    val z2 = math.pow(p1 - p2, 2) / (p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(r.getBoolean(4) == (z2 > 3.8415),
      s"integer verdict ${r.getBoolean(4)} vs double z²=$z2")
  }

  test("q165: checksum is order- and partition-independent, and detects " +
    "a single-row change") {
    def sums(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = sums(graft.queries.AnalyticsOps
      .defs("q165_replica_checksum")(spark, sf))
    // replica simulation: same rows, different physical order/partitioning
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    val reordered = try sums(graft.queries.AnalyticsOps
      .defs("q165_replica_checksum")(spark, sf))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(reordered == base)
    // a corrupted replica (one value off by a cent) must change exactly
    // its partition's checksum — recompute over a mutated frame
    import org.apache.spark.sql.functions.{when => w}
    val ev = graft.core.Tables.load(spark, sf, "events")
      .withColumn("value",
        w(col("event_id") === 0, col("value") + 0.01)
          .otherwise(col("value")))
    val canon = concat_ws("|",
      col("event_id").cast("string"), col("user_id").cast("string"),
      col("event_type"), col("ts").cast("string"),
      round(col("value") * 100, 0).cast("long").cast("string"),
      col("props"))
    val corrupted = ev.select(col("event_type"),
        (conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
          % 1000000007L).as("h"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("h").as("c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val changed = base.keys.filter(k => base(k) != corrupted(k))
    assert(changed.size == 1, s"corruption touched $changed")
  }

  test("q166: A-priori invariant — every frequent pair's tokens are " +
    "individually frequent, support bars hold") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val nd = docs.count()
    val pairs = graft.queries.AnalyticsOps
      .defs("q166_frequent_pairs")(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonically ordered")
      assert(r.getLong(2) * 10 >= nd)
    }
    // anti-monotonicity: pair support <= each member's doc frequency
    val df = docs.select(explode(array_distinct(filter(
        split(col("text"), " "), x => x =!= ""))).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.foreach { r =>
      val s = r.getLong(2)
      assert(s <= df(r.getString(0)) && s <= df(r.getString(1)))
      assert(df(r.getString(0)) * 4 >= nd && df(r.getString(1)) * 4 >= nd)
    }
  }

  test("q151: distributed prefix-sum equals the single-window cumsum, " +
    "and is invariant to the partition count") {
    def run(parts: String): Map[Long, Long] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try AnalyticsOps.defs("q151_token_budget_select")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val dist = run("4")
    // oracle shape: one global-order window (fine at spec scale)
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val sc = graft.core.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("n_tok"),
        expr("n_distinct * 1000000 div n_tok").as("score"))
    val budget = sc.agg(sum("n_tok")).head.getLong(0) / 10
    val w = Window.orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = sc.withColumn("cum", sum("n_tok").over(w))
      .filter(col("cum") <= budget)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(dist == single)
    // partition-count invariance: the offsets mechanism, not luck
    assert(run("7") == dist)
    assert(run("1") == dist)
  }

  test("q168: reported fanouts equal brute-force per-key products and " +
      "form the true top-20") {
    val got = AnalyticsOps.defs("q168_skew_preflight")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // independent brute force through a different plan shape
    val ev = graft.core.Tables.load(spark, sf, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = ev.groupBy(_._1).map { case (u, rs) =>
      (u, rs.count(_._2 == "click").toLong,
        rs.count(_._2 == "purchase").toLong)
    }.filter(t => t._2 > 0 && t._3 > 0)
      .map(t => (t._1, t._2, t._3, t._2 * t._3)).toSeq
    val want = byUser.sortBy(t => (-t._4, t._1)).take(20)
    assert(got.toSeq == want)
  }

  test("q169: PMI rows obey support <= min(df) and the score recomputes " +
      "from the emitted sufficient statistics") {
    val nd = graft.core.Tables.load(spark, sf, "documents").count()
    // recompute each pair's df from the corpus, then its PMI
    val toks = filter(split(col("text"), " "), x => x =!= "")
    val df = graft.core.Tables.load(spark, sf, "documents")
      .select(explode(array_distinct(toks)).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = AnalyticsOps.defs("q169_pmi_collocations")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, sup, pmi) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(sup <= math.min(df(a), df(b)),
        s"support $sup exceeds min df for ($a,$b)")
      val want = BigDecimal(math.log(sup.toDouble * nd / (df(a) * df(b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - want) < 1e-9, s"pmi mismatch for ($a,$b)")
    }
  }

  test("q170: every doc anchors exactly once, never pairs with itself, " +
      "and the pairing is partition-count invariant") {
    def run(parts: String): Seq[(Long, Long)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try AnalyticsOps.defs("q170_negative_sampling")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val pairs = run("4")
    val n = graft.core.Tables.load(spark, sf, "documents").count()
    assert(pairs.length == n && pairs.map(_._1).distinct.length == n)
    pairs.foreach { case (doc, neg) =>
      assert(doc != neg, s"doc $doc paired with itself")
      assert(neg >= 0 && neg < n, s"neg $neg outside dense id space")
    }
    assert(run("1") == pairs && run("7") == pairs)
  }

  test("q196: distributed PageRank equals a single-threaded reference " +
    "fixpoint over the same integer formula") {
    // build the identical transition graph driver-side (tiny at sf0.001),
    // run the reference iteration in plain Scala longs, compare exactly —
    // a full re-derivation, not a plan identity
    val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val edges = graft.core.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(wu))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val ow = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
    val r0 = AnalyticsOps.PrMass / nodes.length
    var ranks = nodes.map(_ -> r0).toMap
    for (_ <- 1 to AnalyticsOps.PrIters) {
      val contrib = edges
        .map { case (s0, d, w) => d -> (ranks(s0) * w) / ow(s0) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      ranks = nodes.map(n0 =>
        n0 -> (r0 * 15 + 85 * contrib.getOrElse(n0, 0L)) / 100).toMap
    }
    val got = AnalyticsOps.defs("q196_pagerank")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ranks)
    // sanity: mass stays within the floor-loss envelope of the teleport sum
    val total = got.values.sum
    assert(total > AnalyticsOps.PrMass * 9 / 10 &&
      total <= AnalyticsOps.PrMass)
  }

  test("q198: TrustRank equals the single-threaded reference with " +
    "seed-concentrated teleport; non-seed trust is in-link-earned only") {
    val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val edges = graft.core.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(wu))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val ow = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
    val seeds = nodes.filter(AnalyticsOps.TrustSeeds.contains)
    val seedMass = AnalyticsOps.PrMass / math.max(seeds.length, 1)
    val tel = nodes.map(n0 =>
      n0 -> (if (seeds.contains(n0)) seedMass else 0L)).toMap
    var ranks = tel
    for (_ <- 1 to AnalyticsOps.PrIters) {
      val contrib = edges
        .map { case (s0, d, w) => d -> (ranks(s0) * w) / ow(s0) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      ranks = nodes.map(n0 =>
        n0 -> (15 * tel(n0) + 85 * contrib.getOrElse(n0, 0L)) / 100).toMap
    }
    val got = AnalyticsOps.defs("q198_trustrank")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ranks)
    // every node reachable from a seed earns nonzero trust; total mass
    // stays under the injected seed mass
    assert(got.values.sum <= AnalyticsOps.PrMass)
    seeds.foreach(s0 => assert(got(s0) > 0L))
  }
}
