#!/usr/bin/env python3
"""Local parity harness mimicking the driver: run each oracle SQL in DuckDB
against the testdata tables, compare to the Spark result parquet."""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# One FRESH bounded connection per oracle. A shared connection retains
# buffer-pool state across queries, and on large corpora (tmp/sf10:
# 10M-row events) a window oracle running after a heavy string_agg one
# dies with "Failed to allocate block ... (bad allocation)" while the box
# has >100 GiB free — per-query isolation (the same design as
# check_parity_each.py's per-query process) removes the cross-query
# state entirely. The memory_limit bound plus a spill temp_directory keep
# any single oracle inside a predictable footprint (DUCKDB_MEMLIMIT
# overrides the default 12GB).
import os, tempfile
def fresh_con(spill_dir):
    c = duckdb.connect()
    c.sql(f"SET memory_limit='{os.environ.get('DUCKDB_MEMLIMIT', '12GB')}'")
    # DuckDB 1.0's window/agg operators mis-account per-thread state at
    # high thread counts: at 32 threads on a 10M-row corpus they die with
    # "Failed to allocate block ... (bad allocation)" nondeterministically
    # while >100 GiB is free; the same query is reliable at ≤16 threads.
    c.sql(f"SET threads={os.environ.get('DUCKDB_THREADS', '16')}")
    c.sql(f"SET temp_directory='{spill_dir}'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        # TemporaryDirectory + try/finally close: spill dirs are removed
        # and the connection released on EVERY path (a full sf0.1 sweep
        # used to strand 150+ parity_spill_* dirs and leak connections on
        # oracle errors until process exit — ADVICE r15)
        with tempfile.TemporaryDirectory(prefix="parity_spill_") as spill:
            con = fresh_con(spill)
            try:
                got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
                exp = con.sql(sql).df()
            finally:
                con.close()
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
