package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{ChangeEvent, Op, TxnAssembly}
import graft.core.Tables

/** CDC-core operators exercised through the REAL transaction-assembly engine
  * (graft.cdc.TxnAssembly), with the `events` table adapted into a change
  * feed: user_id ≙ XID, event_id ≙ SCN, event_type ≙ opcode. The DuckDB
  * oracles restate the same semantics relationally, so the correctness gate
  * covers the stateful path — not just DataFrame built-ins.
  */
object CdcOps {
  type Q = (SparkSession, String) => DataFrame

  /** events parquet → Dataset[ChangeEvent] under an op-mapping. */
  private def adapt(s: SparkSession, dir: String, opExpr: String): Dataset[ChangeEvent] = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .selectExpr(
        "event_id AS scn", "0 AS subScn", "1L AS seq", "event_id AS offset",
        "1 AS thread", "CAST(user_id AS STRING) AS xid", opExpr + " AS op",
        "0L AS obj", "0L AS bdba", "0 AS slot", "'' AS fb",
        "CAST(NULL AS MAP<STRING,STRING>) AS before",
        "map('value', CAST(value AS STRING)) AS after",
        "CAST(NULL AS MAP<STRING,STRING>) AS suppBefore",
        "CAST(NULL AS MAP<STRING,STRING>) AS suppAfter",
        "CAST(NULL AS MAP<STRING,STRING>) AS attrs",
        "CAST(NULL AS STRING) AS ddlText")
      .as[ChangeEvent]
  }

  val defs: Map[String, Q] = Map(
    // T1/T2 transaction assembly: buffer per XID in scn order, flush at
    // commit (end-of-feed in batch replay), summarize DML mix per txn.
    "q08_txn_assembly" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val feed = adapt(s, dir,
        "CASE WHEN event_type IN ('signup','purchase') THEN 'INS' " +
          "WHEN event_type IN ('click','view') THEN 'UPD' ELSE 'DEL' END")
      TxnAssembly.assembleBatch(feed, TxnAssembly.Config(commitAtEnd = true))
        .toDF()
        .groupBy(col("xid").cast("long").as("user_id"))
        .agg(
          sum(when(col("op") === "c", 1L).otherwise(0L)).as("n_ins"),
          sum(when(col("op") === "u", 1L).otherwise(0L)).as("n_upd"),
          sum(when(col("op") === "d", 1L).otherwise(0L)).as("n_del"),
          min(col("scn")).as("first_scn"),
          max(col("scn")).as("last_scn"))
    }),

    // T3 partial rollback: each 'error' cancels the most recent surviving
    // op of its transaction (stack semantics, Transaction.cpp:73-197).
    // The oracle states the equivalent parenthesis-matching condition with
    // a running balance + suffix max.
    "q10_partial_rollback" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val feed = adapt(s, dir,
        "CASE WHEN event_type = 'error' THEN 'PARTIAL_ROLLBACK' ELSE 'INS' END")
      TxnAssembly.assembleBatch(feed, TxnAssembly.Config(commitAtEnd = true))
        .toDF()
        .select(col("scn").as("event_id"),
          col("xid").cast("long").as("user_id"))
    }),

    // T8 + F5 combined through the assembler: skip-XID list drops whole
    // transactions before any buffering.
    "q36_skip_xid_state" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val feed = adapt(s, dir, "'INS'")
      TxnAssembly.assembleBatch(feed,
          TxnAssembly.Config(commitAtEnd = true, skipXids = Set("3", "7")))
        .toDF()
        .groupBy(col("xid").cast("long").as("user_id"))
        .agg(count(lit(1)).as("n_msgs"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q08_txn_assembly" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type IN ('signup','purchase') THEN 1 ELSE 0 END) AS n_ins,
        |  sum(CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END) AS n_upd,
        |  sum(CASE WHEN event_type NOT IN ('signup','purchase','click','view') THEN 1 ELSE 0 END) AS n_del,
        |  min(event_id) AS first_scn, max(event_id) AS last_scn
        |FROM events GROUP BY user_id""".stripMargin,

    "q10_partial_rollback" ->
      """WITH b AS (
        |  SELECT event_id, user_id, event_type,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE -1 END) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
        |  FROM events),
        |m AS (
        |  SELECT *, max(bal) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS sufmax
        |  FROM b)
        |SELECT event_id, user_id FROM m
        |WHERE event_type <> 'error' AND (sufmax IS NULL OR sufmax <= bal)""".stripMargin,

    "q36_skip_xid_state" ->
      """SELECT user_id, count(*) AS n_msgs FROM events
        |WHERE user_id NOT IN (3, 7) GROUP BY user_id""".stripMargin
  )
}
