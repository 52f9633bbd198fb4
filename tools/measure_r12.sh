#!/bin/bash
# Round-12 measurement orchestrator (same protocol as r11):
#  1. 10x ScaleStress for the round-12 heavy rows (the IVFADC-R rerank
#     and the profile audit), gated like the rest of the family;
#  2. the calm bench median refresh (now 112 queries incl. the two
#     rerank gates, cell balance, and the two approx-twin audits).
# The DuckDB baseline delta sweep (tools/baseline.py ->
# bench/baseline_duckdb_r12.json) is DuckDB-only and runs separately —
# never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r12 bash tools/measure_r12.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r12}"

HEAVY=a_knn_ivfpq_rerank,q_column_profile_audit

step() { # step <artifact> <cmd...>
  local art=$1; shift
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== $* -> $art"
  "$@"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r12_heavy.json \
    python3 tools/scalestresswhencalm.py r12_heavy 10 3 6 "$HEAVY"
  step bench/bench_median_r12.json \
    python3 tools/benchwhencalm.py r12 3 8
done
echo "[measure] done"
ls -la bench/ | grep -E 'r12'
