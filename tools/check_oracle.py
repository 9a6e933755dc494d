#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify at a given SF, then execute each oracle_sql.json entry in
DuckDB over the same parquet tables and compare (columns sorted by name,
rows sorted, values hashed)."""
import json, sys, subprocess, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

import duckdb, pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        duck_df = con.sql(oracle[name]).df()
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}"); fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1; continue
        mismatch = []
        for c in s.columns:
            a, b = s[c], d[c]
            if str(a.dtype) != str(b.dtype):
                mismatch.append(f"dtype[{c}]: {a.dtype} vs {b.dtype}")
                continue
            if a.dtype.kind == 'f':
                import numpy as np
                neq = ~(np.isclose(a, b, rtol=0, atol=1e-9) | (a.isna() & b.isna()))
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                mismatch.append(f"val[{c}] row{i}: spark={a[i]!r} duck={b[i]!r} ({int(neq.sum())} diffs)")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:3])); fail += 1
        else:
            print(f"ok   {name} ({len(s)} rows)"); ok += 1
    # rows-only queries (no oracle)
    import pathlib
    declared = set(oracle)
    for p in sorted(pathlib.Path(OUT).iterdir()):
        if p.is_dir() and p.name not in declared:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"rows-only {p.name}: {n} rows")
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

main()
