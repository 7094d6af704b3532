package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer over the driver-provided TESTDATA parquet dirs.
  *
  * All queries go through here so that, at cluster scale, the read path can be
  * swapped (bucketed tables, a metastore, Delta) without touching operators.
  * Filters/column pruning are left to Catalyst — callers `select`/`filter` on
  * the returned DataFrame and pushdown reaches the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default;
    // read it as epoch-nanos long (exact — no truncation) in ANY session,
    // including the driver-provided one.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Configuration applied to every session we control (Bench/tests).
    * The driver's Verify builds its own session; queries must not depend on
    * these being set — they are performance, not correctness, knobs.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark
  }
}
