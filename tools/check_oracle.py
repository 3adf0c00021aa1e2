#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row count / sorted-column value
hash against the Spark parquet dump in the verify out dir.
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import hashlib

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pq.read_table(glob.glob(f"{d}/*.parquet")[0]).to_pandas()
    if name not in oracle:
        print(f"{name:24s} rows-only: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(spark_df), canon(duck_df)
    status = []
    if list(a.columns) != list(b.columns):
        status.append(f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}")
    if len(a) != len(b):
        status.append(f"ROWS spark={len(a)} duck={len(b)}")
    if not status:
        # normalize dtypes for value compare
        for c in a.columns:
            if a[c].dtype != b[c].dtype:
                try:
                    a[c] = a[c].astype("int64"); b[c] = b[c].astype("int64")
                except Exception:
                    a[c] = a[c].astype(str); b[c] = b[c].astype(str)
        ha = hashlib.md5(pd.util.hash_pandas_object(a, index=False).values.tobytes()).hexdigest()
        hb = hashlib.md5(pd.util.hash_pandas_object(b, index=False).values.tobytes()).hexdigest()
        if ha != hb:
            diff = (a != b)
            ndiff = int(diff.any(axis=1).sum())
            status.append(f"HASH mismatch ({ndiff} differing rows)")
            idx = diff.any(axis=1)
            print(a[idx].head(3))
            print(b[idx].head(3))
    if status:
        fails += 1
        print(f"{name:24s} FAIL: {'; '.join(status)}")
    else:
        print(f"{name:24s} OK ({len(a)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
