#!/usr/bin/env python3
"""Per-query parity driver: runs tools/check_parity.py one oracle at a
time (a filtered copy of oracle_sql.json in a scratch outdir sharing the
Spark result folders via symlink), with a per-query wall timeout, so one
DuckDB-heavy oracle cannot silently absorb the whole sweep. A crashed
child (non-zero exit with no verdict line) is reported as CRASH with its
stderr head — never folded into the timeout-skip bucket. Driver-side
only, like check_parity.py.

Oracles that are DOCUMENTED DuckDB-infeasible at the sweep's scale are
excluded with `--skip=<name>:<reason>` (repeatable) — each prints a SKIP
line so the artifact itself names what was excluded and why, instead of
the skip list living in prose. Skips never gate; an UNDOCUMENTED timeout
(any non-skipped oracle hitting the gate) still exits 1."""
import json, os, shutil, subprocess, sys, tempfile

flags = [a for a in sys.argv[1:] if a.startswith("--")]
skips = {}
for f in [f for f in flags if f.startswith("--skip=")]:
    name, _, reason = f[len("--skip="):].partition(":")
    if not name or not reason:
        sys.exit(f"--skip needs <name>:<reason>, got: {f}")
    skips[name] = reason
unknown = [f for f in flags
           if f != "--allow-timeout" and not f.startswith("--skip=")]
if unknown:  # a swallowed typo'd flag silently wastes a ~28-min sweep
    sys.exit(f"unknown flag(s): {', '.join(unknown)} "
             "(supported: --allow-timeout, --skip=<name>:<reason>)")
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir, out_dir = argv[0], argv[1]
per_q_timeout = int(argv[2]) if len(argv) > 2 else 120
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
bad_skips = set(skips) - set(oracle)
if bad_skips:  # a typo'd skip name would silently skip NOTHING
    sys.exit(f"--skip names not in the oracle set: {', '.join(sorted(bad_skips))}")
results = {}
for name in sorted(oracle):
    if name in skips:
        verdict = f"SKIP {name}: {skips[name]}"
        results[name] = verdict
        print(verdict, flush=True)
        continue
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
            # a PASS line from a child that then exited non-zero (crash
            # after comparison) must not be trusted — returncode gates
            if verdict is not None and verdict.startswith("PASS") and p.returncode != 0:
                err = (p.stderr or "").strip().splitlines()
                verdict = (f"CRASH {name}: exit={p.returncode} after PASS line"
                           + (" | " + " | ".join(err[-3:]) if err else ""))
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
n_skip = sum(1 for v in results.values() if v.startswith("SKIP"))
n_to = len(results) - n_pass - n_fail - n_crash - n_skip
print(f"\n{n_pass} pass / {n_fail} fail / {n_crash} crash / "
      f"{n_to} oracle-timeout / {n_skip} documented-skip")
# timeouts gate too: a chronically-timing-out oracle must not silently
# drop out of the parity surface. --allow-timeout opts back in explicitly.
allow_to = "--allow-timeout" in sys.argv
if n_fail or n_crash or (n_to and not allow_to):
    if n_to and not allow_to:
        print(f"exit 1: {n_to} oracle timeout(s) — pass --allow-timeout "
              "to accept a reduced parity surface", file=sys.stderr)
    sys.exit(1)
