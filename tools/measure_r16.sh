#!/bin/bash
# Round-16 measurement orchestrator (protocol unchanged from r11-r15):
#  1. 10x ScaleStress for the round's newly-enrolled rows — the
#     replicator family (r_compacted_merge, r_ingress_replay,
#     r_segment_assign_size: VERDICT r15 item 4 — the last family
#     with no measured scale curve);
#  2. RetrainPrice: full retrainIndex vs incremental compactIndex at
#     1x/10x corpus (VERDICT r15 item 5 — the cost model next to
#     retrainIfNeeded's drift signal). Runs right after a KEPT
#     scalestress artifact so it shares the calm window; per-rep
#     stderr lines are the audit trail.
#  3. the calm bench median refresh over the FULL 126-query surface
#     (folds this round's four new gated rows — a_knn_filtered,
#     a_knn_filtered_truth, a_knn_filtered_recall,
#     t_token_count_bpe_prod — into the official anchor);
#  4. the same-window frozen-r15-classes cross-anchor (one run of
#     r15's code in this window splits host-window drift from code
#     delta).
# The DuckDB delta sweep for the new oracles is DuckDB-only and runs
# separately — never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r16 bash tools/measure_r16.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r16}"

NEWROWS=r_compacted_merge,r_ingress_replay,r_segment_assign_size

step() { # step <artifact> <cmd...>
  local art=$1; shift
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== $* -> $art"
  "$@"
}

jopens() {
  local ADD=""
  for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
      java.nio java.util java.util.concurrent java.util.concurrent.atomic \
      sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"
  done
  echo "$ADD"
}

retrain_price() { # runs in the window a kept scalestress just proved calm
  local art=bench/retrain_price_r16.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/scalestress_r16_f10.json ]; then
    echo "[measure] retrain_price waits for a kept scalestress"; return 0; fi
  echo "[measure] ==== RetrainPrice 1x/10x -> $art"
  SPARK_GRAFT_CPUS=32 java $(jopens) -Xmx96g -cp \
    "$GRAFT_CLASSES_DIR:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.tools.RetrainPrice /root/testdata/sf0.1 10 3 \
    > "$art.tmp" 2> bench/retrain_price_r16.stderr.log \
    && grep '"metric":"retrain_price"' "$art.tmp" > "$art" && rm -f "$art.tmp"
  echo "[measure] retrain_price written"
}

anchor() { # one frozen-r15 Bench run right after a kept median
  local art=bench/bench_run_r16_r15code.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/bench_median_r16.json ]; then
    echo "[measure] anchor waits for a kept r16 median"; return 0; fi
  echo "[measure] ==== frozen-r15 cross-anchor -> $art"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$art" \
    java $(jopens) -Xmx96g -cp \
    "/root/repo/target/frozen_r15:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.Bench > /dev/null
  echo "[measure] anchor written"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r16_f10.json \
    python3 tools/scalestresswhencalm.py r16_f10 10 3 6 "$NEWROWS"
  retrain_price
  step bench/bench_median_r16.json \
    python3 tools/benchwhencalm.py r16 3 8
  anchor
done
echo "[measure] done"
ls -la bench/ | grep -E 'r16'
