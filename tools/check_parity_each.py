#!/usr/bin/env python3
"""Per-query parity driver: runs tools/check_parity.py one oracle at a
time (a filtered copy of oracle_sql.json in a scratch outdir sharing the
Spark result folders via symlink), with a per-query wall timeout, so one
DuckDB-heavy oracle cannot silently absorb the whole sweep. Driver-side
only, like check_parity.py."""
import json, os, subprocess, sys, tempfile

sf_dir, out_dir = sys.argv[1], sys.argv[2]
per_q_timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 120
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    scratch = tempfile.mkdtemp(prefix="parity_each_")
    json.dump({name: oracle[name]}, open(f"{scratch}/oracle_sql.json", "w"))
    src = f"{out_dir}/{name}"
    if os.path.isdir(src):
        os.symlink(os.path.abspath(src), f"{scratch}/{name}")
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "check_parity.py"),
             sf_dir, scratch],
            capture_output=True, text=True, timeout=per_q_timeout)
        out = p.stdout.strip().splitlines()
        verdict = next((l for l in out if l.startswith(("PASS", "FAIL"))), "NO-OUTPUT")
    except subprocess.TimeoutExpired:
        verdict = f"TIMEOUT >{per_q_timeout}s (DuckDB oracle recompute)"
    results[name] = verdict
    print(verdict if verdict.startswith(("PASS", "FAIL")) else f"SKIP {name}: {verdict}", flush=True)
n_pass = sum(1 for v in results.values() if v.startswith("PASS"))
n_fail = sum(1 for v in results.values() if v.startswith("FAIL"))
n_skip = len(results) - n_pass - n_fail
print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} oracle-timeout-skip")
