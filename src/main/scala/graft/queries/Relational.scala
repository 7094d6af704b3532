package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Relational operator pack: each entry maps one row of SURVEY.md §2 onto the
  * TESTDATA tables, with a DuckDB-equivalent oracle in [[oracles]].
  *
  * Parity rules (Spark result must hash-match the DuckDB result):
  *   - sums/averages go through DecimalType — exact, order-independent
  *     (double sums are order-dependent and would flake under shuffle);
  *   - raw column passthrough (no arithmetic) is always safe;
  *   - every aggregate/computed column is aliased identically on both sides.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Map[String, Q] = Map(
    // S4 batch scan + F3/F4 projection + predicate pushdown: the filter and
    // 3-column projection must reach the parquet reader (PushedFilters).
    "q01_scan_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_partkey", "l_quantity")
    }),

    // §2.6 metrics aggregation (DML in/out counters analog): partial
    // aggregation map-side, single shuffle on event_type.
    "q02_agg_counters" -> ((s, dir) => {
      t(s, dir, "events").groupBy("event_type").agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        // exact decimal accumulation (order-independent), double on the wire:
        // DECIMAL survives pandas/pyarrow readback differently in the two
        // engines, a correctly-rounded final double is identical in both
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // F1 table selection by anchored regex (Schema.cpp:502-530 semantics).
    "q03_filter_regex" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("source").rlike("^src1[0-9]$"))
        .select("doc_id", "source")
    }),

    // T8 skip-XID list: isin → translated to parquet-pushable NOT IN.
    "q05_skip_xid" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(!col("user_id").isin(3L, 7L))
        .select("event_id", "user_id")
    }),

    // J2 event ⋈ dictionary: broadcast hash join of the big fact stream to a
    // small dimension — dictionary lookups must never shuffle the fact side.
    "q06_dict_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy("p_brand").agg(
          count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
    }),

    // Multi-dim broadcast chain (customer ⋈ nation ⋈ region): both dims
    // broadcast; zero shuffles before the final aggregation.
    "q07_multi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_acctbal"))
    }),

    // P1 in-LWN ordering: deterministic per-key sequence numbers
    // (sort key scn/subScn ≙ ts/event_id — see Parser.h:46-60).
    "q09_order_within" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .select("event_id", "user_id", "rn")
    }),

    // 11.11 multi-row expansion analog: one row → N rows via explode
    // (Builder.cpp:714-803 emits one message per contained row).
    "q11_explode_multirow" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
    }),

    // F3 COLUMN_FORMAT::CHANGED analog: emit only rows whose value changed
    // vs the previous row of the same key (Builder.cpp:1467-1499 drops
    // unchanged columns; here rows, same lag-compare shape).
    "q12_changed_only" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .filter(col("prev_value").isNull || col("value") =!= col("prev_value"))
        .select("event_id", "user_id", "value")
    }),

    // TPC-H Q1 shape: the headline wide aggregation (bench workhorse).
    "q14_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus").agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q3 shape: selective fact join + grouped revenue.
    "q15_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate").agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast("double").as("revenue"))
    }),

    // §2.6 running metrics: cumulative per-key window aggregation.
    "q16_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
        .select("event_id", "user_id", "running_value")
    }),

    // T1 sessionization-by-gap: the time-window flavor of transaction
    // assembly (new session when >30 min idle).
    "q17_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (col("ts") - col("prev_ts")) > 1800000000000L, 1L) // 30 min in ns
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "user_id", "session_id")
    }),

    // J2-temporal / as-of semantics: each purchase joined to the most recent
    // prior signup of the same key (versioned-dictionary lookup shape).
    "q18_asof_lookup" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("last_signup_id",
          max(when(col("event_type") === "signup", col("event_id"))).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "last_signup_id")
    }),

    // Exact distinct (dedup primitive).
    "q19_distinct" -> ((s, dir) => {
      t(s, dir, "events").select("user_id", "event_type").distinct()
    }),

    // §2.6 set ops: anti-join (orders that produced no lineitems).
    "q20_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_custkey")
    }),

    // Top-k per group (rank ≤ 3 by value, deterministic tiebreak).
    "q21_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("event_type", "event_id", "value", "rk")
    }),

    // Skew-safe aggregation: two-phase salted groupBy — the 100 TB pattern
    // for heavy-hitter keys (5 event_types over 100k+ rows here; at scale a
    // hot key would overwhelm one reducer). Phase 1 aggregates (key, salt),
    // phase 2 merges salts; result is identical to the plain groupBy, which
    // is exactly what the oracle states.
    // §2.6 multi-level metrics rollup (the reference's counters report
    // totals, per-table, and per-(table,op) — Metrics.h:76-87): one
    // ROLLUP pass instead of three aggregations; partial aggregation
    // keeps it a single shuffle.
    "q61_counters_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("shard", pmod(col("user_id"), lit(10)))
        .rollup("event_type", "shard")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // §2.6 set ops: INTERSECT/EXCEPT between two selective part slices
    // (high-quantity vs high-discount lineitems). Both compile to
    // hash-aggregate + shuffle on the key only — no payload movement.
    "q60_set_ops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") > 49).select("l_partkey").distinct()
      val b = li.filter(col("l_discount") > 0.09).select("l_partkey").distinct()
      a.intersect(b).withColumn("tag", lit("both"))
        .unionByName(a.except(b).withColumn("tag", lit("a_only")))
    }),

    // Deterministic stratified sampling: per-stratum rate via a portable
    // md5 threshold — reproducible training-data curation with no RNG/seed
    // drift across engines or re-runs, and embarrassingly parallel (pure
    // per-row predicate, no shuffle, pushdown-friendly).
    "q47_stratified_sample" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(substring(md5(col("event_id").cast("string")), 1, 2) <
          when(col("event_type") === "click", "10")
            .when(col("event_type") === "view", "20")
            .otherwise("80"))
        .select("event_id", "event_type")
    }),

    // Z-order layout key (graft.operators.ZOrder): Morton-interleave
    // (o_custkey, order epoch-day) — the multi-dim clustering key whose
    // write-time sort makes parquet min/max skipping prune range scans on
    // EITHER dimension at 100 TB (see ZOrderSpec for the measured file-
    // pruning effect; this gate pins the key arithmetic bit-for-bit).
    // Pure per-row integer ops, codegen'd, zero exchange.
    "q107_zorder_key" -> ((s, dir) => {
      val days = datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), days.as("epoch_day"))
        .withColumn("zkey",
          graft.operators.ZOrder.interleave2(
            col("o_custkey"), col("epoch_day"), 21))
    }),

    "q44_salted_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pc"),
          sum(col("value").cast("decimal(18,2)")).as("ps"))
        .groupBy("event_type")
        .agg(sum(col("pc")).as("n_events"),
          sum(col("ps")).cast("double").as("sum_value"))
    }),

    // §2.6 range join without a range join: per-order market activity —
    // all lineitems (any order) shipped within the 7 days from its order
    // date. A naive interval join is a cross product, and even a day-bucket
    // equi-join emits |lineitem| × (orders/day × 7) intermediate rows — a
    // quadratic blowup as both sides grow over TPC-H's FIXED date range.
    // count/sum are decomposable, so the scale plan pre-aggregates the fact
    // side per day BELOW the join: `daily` is ≈2,400 rows at ANY scale
    // factor (one per distinct ship day), a genuinely bounded dimension
    // artifact that broadcasts safely. The exploded (order, day) side then
    // joins the broadcast and sums its ≤7 daily partials per order —
    // identical result, and lineitem itself never transits the join (only
    // its per-day partials, shrunk map-side by partial aggregation, do).
    "q135_interval_join" -> ((s, dir) => {
      val epoch = lit("1970-01-01").cast("date")
      val daily = t(s, dir, "lineitem")
        .groupBy(datediff(col("l_shipdate").cast("date"), epoch).cast("long")
          .as("day"))
        .agg(count(lit(1)).as("d_cnt"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).as("d_sum"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast("date"), epoch).cast("long")
            .as("d0"))
        .select(col("o_orderkey"),
          explode(sequence(col("d0"), col("d0") + 6)).as("day"))
        .join(broadcast(daily), "day")
        .groupBy("o_orderkey")
        .agg(sum(col("d_cnt")).as("n_ship"),
          sum(col("d_sum")).cast("double").as("sum_price"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05""".stripMargin,

    "q02_agg_counters" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q03_filter_regex" ->
      """SELECT doc_id, source FROM documents
        |WHERE regexp_matches(source, '^src1[0-9]$')""".stripMargin,

    "q05_skip_xid" ->
      "SELECT event_id, user_id FROM events WHERE user_id NOT IN (3, 7)",

    "q06_dict_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q07_multi_join" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q09_order_within" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |FROM events""".stripMargin,

    "q11_explode_multirow" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) WHERE token <> '' GROUP BY token""".stripMargin,

    "q12_changed_only" ->
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |  FROM events
        |) WHERE prev_value IS NULL OR value <> prev_value""".stripMargin,

    "q14_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q15_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS DECIMAL(28,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate""".stripMargin,

    "q16_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,

    "q17_sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM (
        |  SELECT event_id, user_id, ts,
    |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR epoch_ns(ts) -
        |         epoch_ns(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events)""".stripMargin,

    "q18_asof_lookup" ->
      """SELECT event_id, user_id, last_signup_id FROM (
        |  SELECT event_id, user_id, event_type,
        |    max(CASE WHEN event_type = 'signup' THEN event_id END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_id
        |  FROM events)
        |WHERE event_type = 'purchase'""".stripMargin,

    "q19_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "q20_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)""".stripMargin,

    "q21_topk_per_group" ->
      """SELECT event_type, event_id, value, rk FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |WHERE rk <= 3""".stripMargin,

    "q61_counters_rollup" ->
      """SELECT event_type, user_id % 10 AS shard, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY ROLLUP(event_type, user_id % 10)""".stripMargin,

    "q60_set_ops" ->
      """WITH a AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity > 49),
        |     b AS (SELECT DISTINCT l_partkey FROM lineitem WHERE l_discount > 0.09)
        |SELECT l_partkey, 'both' AS tag
        |FROM (SELECT l_partkey FROM a INTERSECT SELECT l_partkey FROM b)
        |UNION ALL
        |SELECT l_partkey, 'a_only' AS tag
        |FROM (SELECT l_partkey FROM a EXCEPT SELECT l_partkey FROM b)""".stripMargin,

    "q47_stratified_sample" ->
      """SELECT event_id, event_type FROM events
        |WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
        |  CASE event_type WHEN 'click' THEN '10'
        |                  WHEN 'view' THEN '20' ELSE '80' END""".stripMargin,

    // Morton interleave restated as a list_sum of shifted bits
    "q107_zorder_key" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_day
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, epoch_day,
        |  CAST(list_sum(list_transform(range(21), i ->
        |    ((o_custkey >> i) & 1) * (CAST(1 AS BIGINT) << (2*i)) +
        |    ((epoch_day >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))))
        |  AS BIGINT) AS zkey
        |FROM base""".stripMargin,

    // salted two-phase agg ≡ plain group-by (the salt is internal)
    "q44_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,

    // the bucketed equi-join restated as the naive interval join
    "q135_interval_join" ->
      """SELECT o.o_orderkey, CAST(count(*) AS BIGINT) AS n_ship,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders o JOIN lineitem l
        |  ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
        | AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + 6
        |GROUP BY 1""".stripMargin
  )
}
