#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against the sf parquet tables,
loads the Spark-written parquet from <verifyOutDir>/<name>, sorts columns
by name and rows by all columns, and compares values.
"""
import json
import sys
import glob
import math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def values_match(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            duck_df = norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"SCHEMA   {name}: spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        # dtype-level report (informational)
        dt_mismatch = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                       for c in spark_df.columns
                       if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        bad = None
        for c in spark_df.columns:
            for i, (x, y) in enumerate(zip(spark_df[c], duck_df[c])):
                if not values_match(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            print(f"VALUES   {name}: col={bad[0]} row={bad[1]} "
                  f"spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            extra = f"  (dtype diff: {dt_mismatch})" if dt_mismatch else ""
            print(f"PASS     {name} ({len(spark_df)} rows){extra}")
            n_pass += 1
    # Spark outputs with no oracle entry would silently dodge the gate —
    # surface them and count them as skips so coverage gaps are visible.
    import os
    spark_outputs = {os.path.basename(d.rstrip("/"))
                     for d in glob.glob(f"{out_dir}/*/")}
    no_oracle = sorted(spark_outputs - set(oracles))
    for name in no_oracle:
        print(f"NO_ORACLE {name}: spark output has no oracle_sql entry")
        n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip; "
          f"{len(oracles)} oracles")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
