#!/bin/bash
# Round-11 measurement orchestrator (the r10 protocol, new artifacts):
#  1. 10x ScaleStress for the round-10 heavy rows the verdict asked to
#     measure like the rest (IVFADC, semantic dedup under its
#     kCells-scales-with-corpus rule, containment pairs, the column
#     profiler over synthesized lineitem);
#  2. the calm bench median refresh (now 102 queries incl. a_ann_recall
#     and the 128-hash production-geometry LSH).
# The DuckDB baseline re-sweep (tools/baseline.py ->
# bench/baseline_duckdb_r11.json) is DuckDB-only and runs separately —
# never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r11 bash tools/measure_r11.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r11}"

# d_containment_pairs is excluded: its 10x synthetic workload is a
# df-cap construction artifact (~60x, not 10x) that OOM-killed a 96 GB
# heap on the first r11 attempt — see ScaleStress family notes.
HEAVY=a_knn_ivfpq,d_semantic_dedup,q_column_profile

step() { # step <artifact> <cmd...>
  local art=$1; shift
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== $* -> $art"
  "$@"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r11_heavy.json \
    python3 tools/scalestresswhencalm.py r11_heavy 10 3 6 "$HEAVY"
  step bench/bench_median_r11.json \
    python3 tools/benchwhencalm.py r11 3 8
done
echo "[measure] done"
ls -la bench/ | grep -E 'r11'
