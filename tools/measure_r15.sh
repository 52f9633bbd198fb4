#!/bin/bash
# Round-15 measurement orchestrator (protocol unchanged from r11-r14):
#  1. 10x ScaleStress for the round's two newly-enrolled rows —
#     d_bloom_dedup (log2m-scaled runner: m ∝ corpus holds ~bits/key)
#     and t_token_count_bpe (the tokenizer-cost projection control);
#  2. the calm bench median refresh over the FULL 122-query surface
#     (folds the three r14 post-sweep rows plus this round's three
#     new gated rows into the official anchor — VERDICT r14 item 3);
#  3. the same-window frozen-r14-classes cross-anchor (one run of
#     r14's code in this window splits host-window drift from code
#     delta, the r14 technique).
# The DuckDB delta sweep for the new/changed oracles is DuckDB-only
# and runs separately — never concurrently with these JVM windows.
#
# Usage: GRAFT_CLASSES_DIR=/root/repo/target/frozen_r15 bash tools/measure_r15.sh
set -u
cd /root/repo
export GRAFT_CLASSES_DIR="${GRAFT_CLASSES_DIR:-/root/repo/target/frozen_r15}"

NEWROWS=d_bloom_dedup,t_token_count_bpe

step() { # step <artifact> <cmd...>
  local art=$1; shift
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  echo "[measure] ==== $* -> $art"
  "$@"
}

anchor() { # one frozen-r14 Bench run right after a kept median
  local art=bench/bench_run_r15_r14code.json
  if [ -e "$art" ]; then echo "[measure] SKIP $art (exists)"; return 0; fi
  if [ ! -e bench/bench_median_r15.json ]; then
    echo "[measure] anchor waits for a kept r15 median"; return 0; fi
  echo "[measure] ==== frozen-r14 cross-anchor -> $art"
  local ADD=""
  for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
      java.nio java.util java.util.concurrent java.util.concurrent.atomic \
      sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
    ADD="$ADD --add-opens java.base/$p=ALL-UNNAMED"
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$art" \
    java $ADD -Xmx96g -cp \
    "/root/repo/target/frozen_r14:$(ls /opt/spark/jars/*.jar | tr '\n' ':')" \
    graft.Bench > /dev/null
  echo "[measure] anchor written"
}

for pass in 1 2; do
  echo "[measure] ======== pass $pass ========"
  step bench/scalestress_r15_f10.json \
    python3 tools/scalestresswhencalm.py r15_f10 10 3 6 "$NEWROWS"
  step bench/bench_median_r15.json \
    python3 tools/benchwhencalm.py r15 3 8
  anchor
done
echo "[measure] done"
ls -la bench/ | grep -E 'r15'
