package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.queries.QaOps

/** Semantic pins for the QA/decontamination pack beyond the DuckDB hash
  * gate: the synthesized eval leaks must be caught (the whole point of a
  * decontamination pass), organic overlap must stay below the drop bar,
  * and the eval split itself must never appear in the scrub report.
  */
class QaOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private val LeakOff = 200000000L

  test("q140: every synthesized leak is dropped at overlap 1.0; verdicts " +
    "track the threshold; eval docs never appear") {
    val rows = QaOps.defs("q140_decontamination")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (leaks, organic) = rows.partition(_.getLong(0) >= LeakOff)
    // every ≥6-token eval doc contributes a leak, and each one must be
    // flagged 'drop' with overlap_frac exactly 1.0 (its shingles are a
    // subset of the eval set by construction)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expectedLeaks = docs
      .filter("doc_id % 97 = 0 and " +
        "size(filter(split(text, ' '), x -> x != '')) >= 6")
      .count()
    assert(leaks.length == expectedLeaks)
    leaks.foreach { r =>
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-9, s"leak ${r.getLong(0)}")
      assert(r.getString(4) == "drop")
    }
    assert(organic.nonEmpty)
    organic.foreach { r =>
      // verdict is a pure function of the reported fraction (an organic
      // doc MAY cross the bar — near-copies of eval docs are exactly
      // what the scrub exists to catch — but never inconsistently), the
      // fraction is internally consistent with its numerator, and the
      // eval split itself (the docs being protected) is never scrubbed
      val frac = r.getLong(2).toDouble / r.getInt(1)
      assert(math.abs(r.getDouble(3) - frac) < 1e-6)
      assert(r.getString(4) == (if (frac >= 0.2) "drop" else "review"))
      assert(r.getLong(0) % 97 != 0, s"eval doc ${r.getLong(0)} in report")
    }
  }
}
