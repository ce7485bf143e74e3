#!/usr/bin/env python3
"""Local parity harness mimicking the driver: run each oracle SQL in DuckDB
against the testdata tables, compare to the Spark result parquet."""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "NO SPARK OUTPUT")); continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"ERROR: {e}")); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"COLS got={list(got.columns)} exp={list(exp.columns)}")); continue
    if len(got) != len(exp):
        fails.append((name, f"ROWS got={len(got)} exp={len(exp)}")); continue
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    diffs = []
    for c in got.columns:
        a, b = gs[c], es[c]
        if a.dtype != b.dtype:
            diffs.append(f"dtype[{c}] {a.dtype} vs {b.dtype}")
        try:
            if a.dtype.kind == 'f':
                neq = ~(np.isclose(a, b, rtol=0, atol=0, equal_nan=True))
            else:
                neq = ~((a == b) | (a.isna() & b.isna()))
            if neq.any():
                i = neq.idxmax()
                diffs.append(f"val[{c}] row{i}: got={a[i]!r} exp={b[i]!r} ({int(neq.sum())} diffs)")
        except Exception as e:
            diffs.append(f"cmp[{c}] error {e}")
    if diffs:
        fails.append((name, "; ".join(diffs[:4])))
    else:
        passes.append((name, len(got)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, d in fails: print(f"FAIL {n}: {d}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
