#!/usr/bin/env python3
"""Mimic the driver's correctness gate: run each oracle SQL in DuckDB on the
sf parquet tables, compare to the Spark parquet output (sort columns by name,
sort rows, hash values)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import hashlib

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')" if os.path.isdir(p)
                    else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
# Verify emits each oracle under both key forms (bare name + name.parquet)
# so either driver lookup convention resolves; collapse to bare names here.
oracles = {k[:-len(".parquet")] if k.endswith(".parquet") else k: v
           for k, v in oracles.items()}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize float types
    for c in df.columns:
        if df[c].dtype.kind == 'f':
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()

fails = []
for name in sorted(oracles):
    sql = oracles[name]
    spark_path = os.path.join(out, name + ".parquet")
    try:
        dd = con.execute(sql).df()
        sp = duckdb.connect().execute(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        dd_c, sp_c = canon(dd), canon(sp)
        schema_ok = list(dd_c.columns) == list(sp_c.columns)
        rows_ok = len(dd_c) == len(sp_c)
        hash_ok = schema_ok and rows_ok and h(dd_c) == h(sp_c)
        status = "OK" if hash_ok else "MISMATCH"
        print(f"{name}: {status} rows(duck={len(dd_c)}, spark={len(sp_c)}) schema_ok={schema_ok} cols_duck={list(dd_c.columns)} cols_spark={list(sp_c.columns)}")
        if not hash_ok:
            fails.append(name)
            if schema_ok and rows_ok:
                # show first differing rows
                neq = (dd_c != sp_c) & ~(dd_c.isna() & sp_c.isna())
                mask = neq.any(axis=1)
                print("  first diffs (duck vs spark):")
                print(dd_c[mask].head(3))
                print(sp_c[mask].head(3))
    except Exception as e:
        fails.append(name)
        print(f"{name}: ERROR {e}")

print(f"\n{len(oracles)-len(fails)}/{len(oracles)} matched. Fails: {fails}")
