#!/bin/bash
# Round-14 measurement orchestrator (protocol unchanged from r11-r13):
#  1. 25x ScaleStress for the round's two new/changed heavy rows —
#     d_semantic_dedup (kCells = 32*25 = 800: the broadcast-matrix
#     assignment path at a K where r11 measured the literal path on
#     the SAME workload, scalestress_r11_f25.json) and
#     a_kmeans_train_k256 (the new gated large-K row);
#  2. the calm bench median refresh (116 queries incl.
#     a_kmeans_train_k256).
# The DuckDB delta sweep (a_kmeans_train_k256 + the bucketized
# range-density rewrite) is DuckDB-only and runs separately — never
# concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r14 bash tools/measure_r14.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r14}"

HEAVY=d_semantic_dedup,a_kmeans_train_k256

step() { # step <artifact> <cmd...>
  local art=$1; shift
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== $* -> $art"
  "$@"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r14_f25.json \
    python3 tools/scalestresswhencalm.py r14_f25 25 3 6 "$HEAVY"
  step bench/bench_median_r14.json \
    python3 tools/benchwhencalm.py r14 3 8
done
echo "[measure] done"
ls -la bench/ | grep -E 'r14'
