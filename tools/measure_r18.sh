#!/bin/bash
# Round-18 measurement orchestrator (protocol unchanged from r11-r17):
#  1. the controlled same-window A/B for the r17 perf-weak rows
#     (d_incremental_dedup pair + t_token_count_bpe pair, frozen_r16
#     vs frozen_r17 classes — VERDICT r17 item 2);
#  2. 10x ScaleStress for the round's newly-gated rows: the IVF-leg
#     hybrid fusion and the pure-sketch CMS serving path;
#  3. distributed-BPE depth pricing at the production table shape
#     (100/500/2000 merges on sf0.1 — VERDICT r17 item 4);
#  4. the calm bench median refresh over the FULL 141-query gated
#     surface, THREE keepers (r17 shipped a 1-keeper median —
#     VERDICT r17 item 6/3-keeper protocol);
#  5. the same-window frozen-r17-classes cross-anchor.
# The FULL DuckDB re-sweep (item 6's other half) is DuckDB-only and
# runs separately — never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r18 bash tools/measure_r18.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r18}"

NEWROWS=a_hybrid_search_ivf,t_cms_estimate,a_knn_rp,a_knn_rp_recall,t_tokenizer_fit

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

bpeprice() {
  local art=bench/bpe_depth_price_r18.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== BPE depth pricing -> $art"
  java $(jopens) -Xmx96g -cp \
    "$GRAFT_CLASSES_DIR:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.tools.BpeDepthPrice /root/testdata/sf0.1 100,500,2000 \
    2> bench/bpe_depth_price_r18.stderr.log | tail -1 > "$art"
  echo "[measure] bpe pricing written"
}

anchor() { # one frozen-r17 Bench run right after a kept median
  local art=bench/bench_run_r18_r17code.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/bench_median_r18.json ]; then
    echo "[measure] anchor waits for a kept r18 median"; return 0; fi
  echo "[measure] ==== frozen-r17 cross-anchor -> $art"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$art" \
    java $(jopens) -Xmx96g -cp \
    "/root/repo/target/frozen_r17:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.Bench > /dev/null
  echo "[measure] anchor written"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/ab_r18_incdedup.json \
    python3 tools/ab_r18.py 3
  step bench/scalestress_r18_f10.json \
    python3 tools/scalestresswhencalm.py r18_f10 10 3 6 "$NEWROWS"
  bpeprice
  step bench/bench_median_r18.json \
    python3 tools/benchwhencalm.py r18 3 10
  anchor
done
echo "[measure] done"
ls -la bench/ | grep -E 'r18'
