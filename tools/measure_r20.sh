#!/bin/bash
# Round-20 measurement orchestrator (protocol unchanged from r11-r19):
#  1. the controlled same-window A/B for the two r19 perf-watch rows
#     (a_knn_opq 3.0x + x_frame_sample 1.55x on untouched code,
#     frozen_r18 vs frozen_r19 classes, with byte-identical-code
#     controls a_knn_pq / x_video_dedup — VERDICT r19 items 1 + 5);
#  2. 10x + 25x ScaleStress for the round's newly-gated rows
#     (t_quality_model, d_model_keeper);
#  3. the calm bench median over the FULL 149-query gated surface,
#     THREE keepers;
#  4. the same-window frozen-r19-classes cross-anchor.
# The FULL DuckDB re-sweep (r20 protocol: composites at most every
# other round, r19 used one) is DuckDB-only and runs separately —
# never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r20 bash tools/measure_r20.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r20}"

NEWROWS=t_quality_model,d_model_keeper

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

anchor() { # one frozen PRE-OPTIMIZATION Bench run right after a kept
  # median (the optimization round's cross-anchor: same window, the
  # classes the round inherited — code delta IS the optimization work)
  local art=bench/bench_run_r20_precode.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/bench_median_r20.json ]; then
    echo "[measure] anchor waits for a kept r20 median"; return 0; fi
  echo "[measure] ==== frozen pre-optimization cross-anchor -> $art"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_MEDIAN=/nonexistent SPARK_GRAFT_BENCH_OUT="$art" \
    java $(jopens) -Xmx96g -cp \
    "/root/repo/target/frozen_r20_pre:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.Bench > /dev/null
  echo "[measure] anchor written"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/ab_r20_opq.json \
    python3 tools/ab_r20.py 3
  step bench/scalestress_r20_f10.json \
    python3 tools/scalestresswhencalm.py r20_f10 10 3 6 "$NEWROWS"
  step bench/scalestress_r20_f25.json \
    python3 tools/scalestresswhencalm.py r20_f25 25 3 6 "$NEWROWS"
  step bench/bench_median_r20.json \
    python3 tools/benchwhencalm.py r20 3 10
  anchor
done
echo "[measure] done"
ls -la bench/ | grep -E 'r20'
