#!/usr/bin/env bash
# Round performance gate: run the official bench, then fail LOUDLY if any
# query regressed vs the previous round's driver snapshot (double
# threshold: >1.25x multiplicative AND >0.15 s absolute — the ambient-load
# noise filter documented in SCALING.md). Record the one-line disposition
# this prints into SCALING.md each round.
#
# Usage: dev/round_check.sh [prev_bench.json]   (default: newest BENCH_r*.json)
set -euo pipefail
cd "$(dirname "$0")/.."
PREV=${1:-$(ls BENCH_r*.json 2>/dev/null | sort | tail -1)}
[ -n "$PREV" ] || { echo "round_check: no previous BENCH_r*.json found" >&2; exit 2; }
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} sbt -batch "runMain graft.Bench"
python3 dev/bench_diff.py "$PREV" BENCH_LOCAL.json
echo "round_check: PASS — no per-query regression vs $PREV (>1.25x AND >0.15s)"
