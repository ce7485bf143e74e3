#!/usr/bin/env python3
"""Per-query parity driver: runs tools/check_parity.py one oracle at a
time (a filtered copy of oracle_sql.json in a scratch outdir sharing the
Spark result folders via symlink), with a per-query wall timeout, so one
DuckDB-heavy oracle cannot silently absorb the whole sweep. A crashed
child (non-zero exit with no verdict line) is reported as CRASH with its
stderr head — never folded into the timeout-skip bucket. Driver-side
only, like check_parity.py."""
import json, os, shutil, subprocess, sys, tempfile

sf_dir, out_dir = sys.argv[1], sys.argv[2]
per_q_timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 120
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    scratch = tempfile.mkdtemp(prefix="parity_each_")
    try:
        json.dump({name: oracle[name]}, open(f"{scratch}/oracle_sql.json", "w"))
        src = f"{out_dir}/{name}"
        if os.path.isdir(src):
            os.symlink(os.path.abspath(src), f"{scratch}/{name}")
        try:
            p = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__), "check_parity.py"),
                 sf_dir, scratch],
                capture_output=True, text=True, timeout=per_q_timeout)
            out = p.stdout.strip().splitlines()
            verdict = next((l for l in out if l.startswith(("PASS", "FAIL"))), None)
            if verdict is None:
                err = (p.stderr or "").strip().splitlines()
                verdict = (f"CRASH {name}: exit={p.returncode} "
                           + " | ".join(err[-3:]) if err else
                           f"CRASH {name}: exit={p.returncode}, no output")
        except subprocess.TimeoutExpired:
            verdict = f"TIMEOUT {name}: >{per_q_timeout}s (DuckDB oracle recompute)"
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    results[name] = verdict
    print(verdict, flush=True)
n_pass = sum(1 for v in results.values() if v.startswith("PASS"))
n_fail = sum(1 for v in results.values() if v.startswith("FAIL"))
n_crash = sum(1 for v in results.values() if v.startswith("CRASH"))
n_to = len(results) - n_pass - n_fail - n_crash
print(f"\n{n_pass} pass / {n_fail} fail / {n_crash} crash / {n_to} oracle-timeout")
if n_fail or n_crash:
    sys.exit(1)
