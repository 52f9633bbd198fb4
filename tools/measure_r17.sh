#!/bin/bash
# Round-17 measurement orchestrator (protocol unchanged from r11-r16):
#  1. 10x ScaleStress for the round's newly-enrolled rows — the four
#     scale-interesting new gated queries: escalated filtered kNN (the
#     per-query probe-depth claim), DCT pHash dedup (band join), BPE
#     token-id sequences (projection + explode; NOTE the rotated synth
#     copies defeat the trained merges, so their per-doc id count runs
#     near char-level — report the workload decomposition next to the
#     ratio), and maximal span stripping (per-doc islands window).
#  2. the calm bench median refresh over the FULL 133-query gated
#     surface (folds the round's seven new rows + the grown tuned
#     recall table into the official anchor);
#  3. the same-window frozen-r16-classes cross-anchor (one run of r16's
#     code in this window splits host-window drift from code delta on
#     the shared surface).
# The DuckDB delta sweep for the new oracles is DuckDB-only and runs
# separately — never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r17 bash tools/measure_r17.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r17}"

NEWROWS=a_knn_filtered_escalated,x_image_dedup_phash,t_tokenize_ids,d_span_strip_maximal,t_bpe_train,d_contamination_fuzzy,t_cms_heavy_hitters

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

anchor() { # one frozen-r16 Bench run right after a kept median
  local art=bench/bench_run_r17_r16code.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/bench_median_r17.json ]; then
    echo "[measure] anchor waits for a kept r17 median"; return 0; fi
  echo "[measure] ==== frozen-r16 cross-anchor -> $art"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$art" \
    java $(jopens) -Xmx96g -cp \
    "/root/repo/target/frozen_r16:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.Bench > /dev/null
  echo "[measure] anchor written"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r17_f10.json \
    python3 tools/scalestresswhencalm.py r17_f10 10 3 6 "$NEWROWS"
  step bench/bench_median_r17.json \
    python3 tools/benchwhencalm.py r17 3 8
  anchor
done
echo "[measure] done"
ls -la bench/ | grep -E 'r17'
