#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching oracle SQL
from oracle_sql.json in DuckDB over the same sf tables, then compares
(sorted columns, sorted rows, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, oracle_df):
    problems = []
    if list(spark_df.columns) != list(oracle_df.columns):
        problems.append(f"schema-names: spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    for c in spark_df.columns:
        a, b = spark_df[c], oracle_df[c]
        for i in range(len(a)):
            va, vb = a.iloc[i], b.iloc[i]
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if va != vb:
                    problems.append(f"value[{c}][{i}]: spark={va!r} oracle={vb!r}")
                    break
            elif str(va) != str(vb):
                problems.append(f"value[{c}][{i}]: spark={va!r} oracle={vb!r}")
                break
    return problems


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)

    results = {}
    result_dirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in sorted(glob.glob(f"{d}/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[name] = [f"read-spark-result: {e}"]
            continue
        if name not in oracle_sql:
            results[name] = ["(rows-only)" if len(spark_df) >= 0 else "empty"]
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).fetchdf()
        except Exception as e:
            results[name] = [f"oracle-sql-error: {e}"]
            continue
        try:
            results[name] = compare(name, normalize(spark_df), normalize(oracle_df))
        except Exception as e:
            results[name] = [f"compare-error: {e}"]

    n_ok = 0
    for name in sorted(results):
        probs = results[name]
        if not probs:
            print(f"  OK    {name}")
            n_ok += 1
        elif probs == ["(rows-only)"]:
            print(f"  ROWS  {name}")
            n_ok += 1
        else:
            print(f"  FAIL  {name}: {probs[0][:300]}")
    print(f"{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
