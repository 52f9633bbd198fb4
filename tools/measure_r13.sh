#!/bin/bash
# Round-13 measurement orchestrator (same protocol as r11/r12; r12's
# window never ran — turns expired — so this covers BOTH rounds' debt):
#  1. 10x ScaleStress for the r12+r13 heavy rows: the IVFADC-R rerank,
#     the profile audit, IVF-SQ8, and the band-bucket balance;
#  2. the calm bench median refresh (now 115 queries incl. the three
#     r13 rows and the two new recall-table arms).
# The DuckDB baseline delta sweep (tools/baseline.py ->
# bench/baseline_duckdb_r13.json) is DuckDB-only and runs separately —
# never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r13 bash tools/measure_r13.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r13}"

HEAVY=a_knn_ivfpq_rerank,q_column_profile_audit,a_knn_ivfsq,d_bucket_balance

step() { # step <artifact> <cmd...>
  local art=$1; shift
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== $* -> $art"
  "$@"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r13_heavy.json \
    python3 tools/scalestresswhencalm.py r13_heavy 10 3 6 "$HEAVY"
  step bench/bench_median_r13.json \
    python3 tools/benchwhencalm.py r13 3 8
done
echo "[measure] done"
ls -la bench/ | grep -E 'r13'
