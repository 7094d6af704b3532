#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on the same parquet tables, executes each oracle_sql.json entry,
and compares against the Spark parquet dumps produced by graft.Verify:
columns sorted by name, rows sorted, values compared cell-by-cell.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if v is None:
        return "<null>"
    return str(v)


def fetch_sorted(con, sql):
    rel = con.sql(sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    data = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], data


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            ocols, orows = fetch_sorted(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            scols, srows = fetch_sorted(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_bad += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            print(f"  spark[0:2]={srows[:2]}\n  oracle[0:2]={orows[:2]}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} rows differ; first:")
            print(f"  spark : {diffs[0][0]}\n  oracle: {diffs[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(srows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
