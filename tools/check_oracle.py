#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify at a given SF, then execute each oracle_sql.json entry in
DuckDB over the same parquet tables and compare (columns sorted by name,
rows sorted, values hashed)."""
import json, sys, subprocess, glob, os, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# --subset q51_exact_nn: queries whose engine side is a DOCUMENTED
# deterministic sample of the oracle's rows above a scale gate (e.g. q51's
# hash-sampled ground-truth queries over >4096 vectors): checked as
# spark ⊆ duck with a non-trivial row count instead of exact equality.
SUBSET = {}  # name -> key column
if "--subset" in sys.argv:
    for kv in sys.argv[sys.argv.index("--subset") + 1].split(","):
        n, k = kv.split("=")
        SUBSET[n] = k
JSON_OUT = None  # --json path: CORRECTNESS-style artifact
if "--json" in sys.argv:
    JSON_OUT = sys.argv[sys.argv.index("--json") + 1]
RESULTS = {}

import duckdb, pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # sort by NON-float columns first: positional compare at atol=1e-9 can
    # cross-pair rows if a float sort key differs below tolerance between
    # engines, emitting a FALSE FAIL; the rounding conventions make purely
    # float-keyed results rare, and float columns still tie-break last
    cols = list(df.columns)
    order = [c for c in cols if df[c].dtype.kind != 'f'] +             [c for c in cols if df[c].dtype.kind == 'f']
    df = df.sort_values(by=order).reset_index(drop=True)
    return df

def main():
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; Spark-written corpora
        # (e.g. the ScaleGen sf1 replica) are directories of part files
        pat = f"{SF}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        t0 = time.time()
        def record(status, rows, msg=""):
            RESULTS[name] = {"status": status, "rows": rows,
                             "oracle_sec": round(time.time() - t0, 2),
                             **({"err": msg} if msg else {})}
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1
            record("fail", -1, "no spark output"); continue
        # per-query isolation: one malformed result/oracle must not abort
        # the loop before JSON_OUT is written (the r9 crash-then-skip mode)
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files])
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}"); fail += 1
            record("err", -1, f"{type(e).__name__}: {e}"); continue
        if name in SUBSET:
            # engine side is a documented deterministic sample: restrict the
            # oracle to the sampled keys, then the usual exact compare
            key = SUBSET[name]
            if len(spark_df) == 0 or key not in spark_df.columns:
                print(f"FAIL {name}: empty/keyless subset result"); fail += 1
                record("fail", len(spark_df), "empty subset"); continue
            # minimum sampled fraction: accepting ANY non-empty result would
            # let a 99%-row-loss bug read ok_subset; the documented samples
            # keep well over 0.5% of the oracle's rows
            min_rows = max(1, int(0.005 * len(duck_df)))
            if len(spark_df) < min_rows:
                print(f"FAIL {name}: subset kept {len(spark_df)} rows, "
                      f"< {min_rows} (0.5% of {len(duck_df)} oracle rows)")
                fail += 1
                record("fail", len(spark_df), "subset below min fraction")
                continue
            duck_df = duck_df[duck_df[key].isin(spark_df[key].unique())]
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: cols spark={list(s.columns)} duck={list(d.columns)}"); fail += 1
            record("fail", len(s), "cols"); continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fail += 1
            record("fail", len(s), f"rows {len(s)} vs {len(d)}"); continue
        mismatch = []
        try:
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
        except Exception as e:
            print(f"ERR  {name}: compare threw {type(e).__name__}: {e}"); fail += 1
            record("err", len(s), f"compare: {type(e).__name__}: {e}"); continue
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:3])); fail += 1
            record("fail", len(s), "; ".join(mismatch[:3]))
        else:
            mode = "ok_subset" if name in SUBSET else "ok"
            print(f"{mode:9s}{name} ({len(s)} rows)"); ok += 1
            record(mode, len(s))
    # rows-only queries (no oracle)
    import pathlib
    declared = set(oracle)
    for p in sorted(pathlib.Path(OUT).iterdir()):
        if p.is_dir() and p.name not in declared:
            files = glob.glob(f"{p}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"rows-only {p.name}: {n} rows")
    print(f"\n{ok} ok, {fail} fail")
    if JSON_OUT:
        json.dump({"sf_dir": SF, "queries": RESULTS,
                   "ok": ok, "fail": fail,
                   "subset_checked": sorted(SUBSET)},
                  open(JSON_OUT, "w"), indent=1)
    sys.exit(1 if fail else 0)

main()
