#!/usr/bin/env python3
"""Local replica of the driver's correctness gate — STRICTER than round 1's.

Round-1 lesson: reading both sides through duckdb fetchall masked type-class
differences. A driver that goes through pandas renders DuckDB DECIMAL and
HUGEINT as float64 ("101951.0") while Spark's parquet DECIMAL reads back as
Decimal("101951.00") — hash mismatch despite equal values. So this replica
compares through pandas (oracle: rel.df(); spark: pandas.read_parquet) AND
flags any type-class difference (int vs float vs Decimal) as a failure.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


import numpy as np


def norm(v):
    # type-CLASS normalization: int32 == int64 ("5"), but Decimal('1.10')
    # vs float 1.1 differ ("1.10" vs "1.1") — matching what a driver that
    # hashes str(value) after pandas conversion sees
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return "nan" if math.isnan(v) else repr(float(v))
    if v is None or v is pd.NaT:
        return "<null>"
    return str(v)


def df_sorted(df):
    cols = sorted(df.columns)
    df = df[cols]
    data = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    return cols, data


def fetch_sorted(con, sql):
    return df_sorted(con.sql(sql).df())


def spark_sorted(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"{out_dir}/{name}/*.parquet")
    return df_sorted(pd.concat([pd.read_parquet(f) for f in files]))


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
            scols, srows = spark_sorted(out_dir, name)
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
