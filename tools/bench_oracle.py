#!/usr/bin/env python3
"""Time every SparkEntry.oracleSql query in DuckDB — the denominator of the
per-query spark/oracle ratio artifact (BENCH_FULL.json "oracle_s"/"ratio").

The r7 verdict's #1 ask: "within 2x of the DuckDB oracle" was a prose claim
backed by one whole-set number; this makes it a per-query, regression-gated
artifact. Pipeline:

  sbt "runMain graft.DumpOracles /tmp/oracle_sql.json"
  python3 tools/bench_oracle.py /root/testdata/sf0.1 /tmp/oracle_sql.json \
      ORACLE_TIMES.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench"
      # Bench merges ORACLE_TIMES.json into BENCH_FULL.json as
      # {"oracle": {...}, "ratios": {...}} and counts violations
  sbt "testOnly graft.OracleRatioSpec"   # the regression net

Methodology mirrors graft.Bench: one warm-up-ish policy — run once, and
re-run taking the min when the first run is fast enough that scheduling
noise could flip a ratio verdict (<5s). DuckDB is configured with the same
32 threads the Spark side gets.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

RERUN_BELOW_S = 5.0


def main(sf_dir, oracle_json, out_json):
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_json) as f:
        oracles = json.load(f)
    times = {}
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            t0 = time.monotonic()
            con.sql(sql).fetchall()
            elapsed = time.monotonic() - t0
            if elapsed < RERUN_BELOW_S:
                t0 = time.monotonic()
                con.sql(sql).fetchall()
                elapsed = min(elapsed, time.monotonic() - t0)
            times[name] = round(elapsed, 4)
            print(f"{name}: {elapsed:.3f}s", flush=True)
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}", flush=True)
            times[name] = None
    with open(out_json, "w") as f:
        json.dump({"sf": sf_dir, "oracle_s": times}, f, indent=0,
                  sort_keys=True)
    total = sum(v for v in times.values() if v)
    print(f"\ntotal oracle: {total:.1f}s over {len(times)} queries")


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
