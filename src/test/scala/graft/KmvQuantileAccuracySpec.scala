package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Estimator QUALITY gate for the grouped KMV quantiles (the r15 ask):
  * q221 hash-gates determinism — bottom-k-by-md5 is bit-identical in
  * both engines — but nothing asserted the estimates are any GOOD, so a
  * future k change could silently degrade them while every gate stayed
  * green. This compares the k=128 sample quantiles against the exact
  * per-lang quantiles at sf0.01 in RANK space, where the KMV guarantee
  * lives.
  *
  * Error bound (written down, the ask): a KMV bottom-k sample is a
  * uniform-without-replacement sample of the group (md5 is the uniform
  * order), so the p-quantile of the sample sits at group rank p ± ~
  * p(1-p)·n/√k. We assert the ROBUST form with k = 128 and margin 3.5σ:
  * |sample_rank − p·n| ≤ 3.5 · n · √(p(1−p)) / √k + 1 for every
  * (lang, p ∈ {50, 90, 99}) — on this corpus the measured max is well
  * inside (the +1 absorbs integer-rank rounding on tiny groups). A
  * value-space bound would be data-dependent (arbitrary gaps between
  * order statistics); rank space is the estimator's actual contract.
  */
class KmvQuantileAccuracySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("k=128 grouped sample quantiles land within the rank-space bound") {
    val sf = "/root/testdata/sf0.01"
    val est = graft.queries.PipelineOps
      .defs("q221_grouped_quantiles")(spark, sf)
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select(col("lang"), col("n_chars").cast("long").as("v"))
    // exact rank of each estimate within its full group: the count of
    // group values ≤ estimate (ties give the estimate its highest rank;
    // the bound's +1 absorbs the off-by-one this can introduce)
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n_group"))
    val ranks = est.join(docs, "lang")
      .groupBy("lang", "p", "value")
      .agg(sum(when(col("v") <= col("value"), 1L).otherwise(0L))
        .as("sample_rank"))
      .join(sizes, "lang")
    val k = 128.0
    val rows = ranks.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, p, n, rank) = (r.getString(0), r.getInt(1),
        r.getLong(r.fieldIndex("n_group")).toDouble,
        r.getLong(r.fieldIndex("sample_rank")).toDouble)
      val pf = p / 100.0
      val bound = 3.5 * n * math.sqrt(pf * (1 - pf)) / math.sqrt(k) + 1
      val err = math.abs(rank - pf * n)
      assert(err <= bound,
        s"lang=$lang p=$p: sample rank $rank vs target ${pf * n} " +
          s"(n=$n) exceeds the ±$bound rank bound")
    }
  }
}
