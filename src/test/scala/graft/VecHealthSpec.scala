package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.VecHealth

/** Live embedding-drift monitor: zero drift on the reference itself, a
  * planted distribution shift fires, snapshots are partition-invariant,
  * and a degenerate empty batch reports full reference mass instead of
  * NaN. */
class VecHealthSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def vecs = graft.core.Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("reference vs itself = zero drift; a planted shift fires; " +
    "empty batch = total reference mass, no NaN") {
    val model = VecHealth.fit(vecs)
    val self = VecHealth.snapshot(model, vecs)
    assert(self.getLong(0) == vecs.count())
    assert(self.getDouble(1) == 0.0, s"self drift: $self")
    // encoder-rev simulation: every embedding shifted by +0.8 moves the
    // projection mass out of the reference bins
    val shifted = vecs.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(0.8f)).as("embedding"))
    val drift = VecHealth.snapshot(model, shifted)
    assert(drift.getDouble(1) > 0.3, s"shift drift: $drift")
    val empty = VecHealth.snapshot(model, vecs.filter(col("vec_id") < 0))
    assert(empty.getLong(0) == 0L)
    assert(empty.getDouble(1) == 0.5, s"empty drift: $empty") // ½·Σref = 0.5
  }

  test("snapshot is partition-invariant (integer projection + binning)") {
    val model = VecHealth.fit(vecs)
    val a = VecHealth.snapshot(model, vecs.repartition(2))
    val b = VecHealth.snapshot(model, vecs.repartition(8))
    assert(a == b)
  }
}
