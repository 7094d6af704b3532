package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsOps, CdcOps, CurationOps, FormatOps, PipelineOps, QaOps, Relational, SelectionOps, TextOps, TrainOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 mapped onto the
  * TESTDATA tables; each key has a DuckDB oracle in [[oracleSql]] unless the
  * operator is not SQL-expressible (then it gets a rows-only check and a
  * ScalaTest spec instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.defs("q14_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ TextOps.defs ++ VectorOps.defs ++ CdcOps.defs ++
      FormatOps.defs ++ PipelineOps.defs ++ CurationOps.defs ++
      SelectionOps.defs ++ TrainOps.defs ++ QaOps.defs ++ AnalyticsOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ VectorOps.oracles ++
      CdcOps.oracles ++ FormatOps.oracles ++ PipelineOps.oracles ++
      CurationOps.oracles ++ SelectionOps.oracles ++ TrainOps.oracles ++
      QaOps.oracles ++ AnalyticsOps.oracles
}
