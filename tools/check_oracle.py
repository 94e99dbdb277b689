#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each <name> dir in verifyOutDir (Spark parquet result) with an entry
in oracle_sql.json, run the SQL in DuckDB over the sfDir tables, sort
columns by name, sort rows, and hash-compare values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # normalize float-ish columns for stable hashing
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"MISSING  {name}: no spark result dir")
            n_bad += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(res_dir))
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        ok_shape = spark_df.shape == duck_df.shape
        ok_cols = list(spark_df.columns) == list(duck_df.columns)
        ok = ok_shape and ok_cols
        detail = ""
        if ok:
            try:
                pd.testing.assert_frame_equal(
                    spark_df, duck_df, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12)
            except AssertionError as e:
                ok = False
                detail = str(e).split("\n")[0]
        else:
            detail = f"shape {spark_df.shape} vs {duck_df.shape}; cols {list(spark_df.columns)} vs {list(duck_df.columns)}"
        print(f"{'OK      ' if ok else 'MISMATCH'} {name} {detail}")
        n_ok += ok
        n_bad += (not ok)
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
