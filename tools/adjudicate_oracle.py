#!/usr/bin/env python3
"""Above-gate oracle adjudication: like check_oracle.py, but with a FRESH
DuckDB connection per query (a long-lived connection accumulates spill
temp across heavy LSH replays and can exhaust the disk at sf0.1) and a
per-query status table suitable for BENCH_NOTES.

Usage: adjudicate_oracle.py <sfDir> <verifyOutDir> [threads]
"""
import sys, os, json, glob
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"MISSING  {name}: no spark result dir", flush=True)
            n_bad += 1
            continue
        try:
            con = duckdb.connect()
            con.execute(f"PRAGMA threads={threads}")
            for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
                t = os.path.basename(p)[: -len(".parquet")]
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
            spark_df = canon(pd.read_parquet(res_dir))
            duck_df = canon(con.execute(sql).df())
            con.close()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}", flush=True)
            n_bad += 1
            continue
        if spark_df.shape != duck_df.shape or list(spark_df.columns) != list(duck_df.columns):
            print(f"SHAPE    {name}: spark {spark_df.shape} {list(spark_df.columns)} "
                  f"vs duck {duck_df.shape} {list(duck_df.columns)}", flush=True)
            n_bad += 1
            continue
        try:
            # same tolerance as the gate's check_oracle.py
            pd.testing.assert_frame_equal(
                spark_df, duck_df, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12)
            print(f"OK       {name}", flush=True)
            n_ok += 1
        except AssertionError as e:
            print(f"MISMATCH {name}: {str(e).splitlines()[0][:200]}", flush=True)
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
