#!/usr/bin/env bash
# Pinned bench protocol — THE way to run graft benches (driver-side
# tooling only; encodes the collector + cache-state protocol so a run
# done from the README alone cannot silently diverge).
#
#   tools/run_bench.sh pair <sf_dir> <out.json>
#       sf0.1-class protocol run: G1 (the JVM default), 1 unmeasured
#       warm-up pass + 3 measured passes, corpus pre-touch ON (Bench
#       streams every byte of <sf_dir> before anything is timed — pins
#       the page-cache state that drifted r17's pairs ±9%).
#       Round-over-round comparisons use SAME-DAY pairs of these.
#
#   tools/run_bench.sh sf10 <sf_dir> <out.json>
#       scale soak: ZGC (SPARK_GRAFT_GC=zgc → -XX:+UseZGC) — G1's
#       stop-the-world waves on the 48g heap bill to adjacent entries
#       (BENCH_scale.md r17 G1/ZGC A/B); single measured pass, no
#       warm-up pass (one pass is ~30 min), pre-touch ON.
#
# The emitted JSON self-declares the protocol: `gc` records which
# collector actually ran, `pretouch` the bytes/seconds of the cache pin,
# `load` the foreign-CPU guard. Keep the box otherwise idle.
set -euo pipefail
mode=${1:?usage: $0 {pair|sf10} <sf_dir> <out.json>}; sf=$2; out=$3
case "$mode" in
  pair) gc="" passes=3 warmup=1 ;;
  sf10) gc="zgc" passes=1 warmup=0 ;;
  *) echo "usage: $0 {pair|sf10} <sf_dir> <out.json>" >&2; exit 2 ;;
esac
cd "$(dirname "$0")/.."
SPARK_GRAFT_GC="$gc" SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_BENCH_PASSES=$passes \
SPARK_GRAFT_BENCH_WARMUP=$warmup SPARK_GRAFT_BENCH_OUT="$out" \
sbt -batch "runMain graft.Bench"
