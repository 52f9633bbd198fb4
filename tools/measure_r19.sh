#!/bin/bash
# Round-19 measurement orchestrator (protocol unchanged from r11-r18):
#  1. the controlled same-window A/B for the r18 perf-watch row
#     (d_containment_pairs, frozen_r17 vs frozen_r18 classes —
#     VERDICT r18 item 3; d_ngram_jaccard rides as control);
#  2. 10x + 25x ScaleStress for the round's newly-gated rows
#     (a_knn_rp_ivf, a_knn_ivfpq_filtered_escalated,
#     t_tokenizer_fit_d50) + the t_cms_estimate 10x RE-measure the
#     r18 verdict flagged as noisy (What's-wrong #3);
#  3. the calm bench median over the FULL 147-query gated surface,
#     THREE keepers — this is the JL enrollment window (VERDICT r18
#     item 1: a_knn_rp / a_knn_rp_recall finally inside a gated
#     median, plus the three r19 rows);
#  4. the same-window frozen-r18-classes cross-anchor.
# BPE depth pricing (VERDICT item 6) already ran in its own window:
# bench/bpe_depth_price_r19.json (batched) +
# bench/bpe_depth_price_r19_seq.json (batchT=1 same-window arm).
# The DuckDB sweep for the three new rows is DuckDB-only and runs
# separately — never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r19 bash tools/measure_r19.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r19}"

NEWROWS=a_knn_rp_ivf,a_knn_ivfpq_filtered_escalated,t_tokenizer_fit_d50,t_cms_estimate

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

anchor() { # one frozen-r18 Bench run right after a kept median
  local art=bench/bench_run_r19_r18code.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/bench_median_r19.json ]; then
    echo "[measure] anchor waits for a kept r19 median"; return 0; fi
  echo "[measure] ==== frozen-r18 cross-anchor -> $art"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$art" \
    java $(jopens) -Xmx96g -cp \
    "/root/repo/target/frozen_r18:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.Bench > /dev/null
  echo "[measure] anchor written"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/ab_r19_containment.json \
    python3 tools/ab_r19.py 3
  step bench/scalestress_r19_f10.json \
    python3 tools/scalestresswhencalm.py r19_f10 10 3 6 "$NEWROWS"
  step bench/scalestress_r19_f25.json \
    python3 tools/scalestresswhencalm.py r19_f25 25 3 6 "$NEWROWS"
  step bench/bench_median_r19.json \
    python3 tools/benchwhencalm.py r19 3 10
  anchor
done
echo "[measure] done"
ls -la bench/ | grep -E 'r19'
