package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The per-query performance regression net (r7 verdict ask #1): the
  * committed BENCH_FULL.json must carry a DuckDB oracle time and a
  * spark/oracle ratio for EVERY oracle-gated query, and no query may be
  * both >2x its oracle AND >2s absolute (Bench.RatioGateMax /
  * RatioGateMinSparkS) unless enumerated in Bench.RatioExemptions with a
  * written justification.
  *
  * The artifact is produced by the pipeline in tools/bench_oracle.py's
  * docstring (DumpOracles -> bench_oracle.py -> Bench with
  * ORACLE_TIMES.json present). This spec recomputes the verdict from the
  * raw per-query numbers rather than trusting Bench's own violation list,
  * so a Bench bug can't silently pass the gate.
  */
class OracleRatioSpec extends AnyFunSuite {

  private lazy val root = {
    val p = Paths.get("BENCH_FULL.json")
    assert(Files.isRegularFile(p),
      "BENCH_FULL.json missing - run the bench_oracle.py pipeline")
    new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(p))
  }

  private def numMap(field: String): Map[String, Double] = {
    val node = root.get(field)
    assert(node != null,
      s"BENCH_FULL.json lacks '$field' - regenerate with ORACLE_TIMES.json " +
        "present (see tools/bench_oracle.py)")
    node.fields().asScala
      .filter(_.getValue.isNumber)
      .map(e => e.getKey -> e.getValue.asDouble()).toMap
  }

  test("BENCH_FULL carries an oracle time + ratio for every gated query") {
    val spark = numMap("queries")
    val oracle = numMap("oracle_s")
    val ratio = numMap("ratio")
    val gated = SparkEntry.oracleSql.keySet
    // every oracle-gated query must have been benched on both engines
    val missingSpark = gated -- spark.keySet
    assert(missingSpark.isEmpty, s"no spark timing for: $missingSpark")
    val missingOracle = gated -- oracle.keySet
    assert(missingOracle.isEmpty,
      s"no DuckDB oracle timing for: $missingOracle")
    val missingRatio = gated -- ratio.keySet
    assert(missingRatio.isEmpty, s"no ratio for: $missingRatio")
  }

  test("no query is both >2x its oracle and >2s absolute (unexempted)") {
    val spark = numMap("queries")
    val oracle = numMap("oracle_s")
    val bad = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap { k =>
      (spark.get(k), oracle.get(k)) match {
        case (Some(s), Some(o))
          if o > 0 && s / o > Bench.RatioGateMax &&
            s > Bench.RatioGateMinSparkS &&
            !Bench.RatioExemptions.contains(k) =>
          Some(f"$k: spark $s%.2fs vs oracle $o%.2fs (${s / o}%.1fx)")
        case _ => None
      }
    }
    assert(bad.isEmpty,
      "ratio gate violations (fix the plan or enumerate an exemption " +
        "with justification in Bench.RatioExemptions):\n" +
        bad.mkString("\n"))
  }

  test("exemptions stay honest: every exemption names a gated query") {
    val stale = Bench.RatioExemptions.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"exemptions for unknown queries: $stale")
  }
}
