#!/usr/bin/env python3
"""Round-12 DuckDB baseline DELTA sweep: medians-of-3 for only the
queries whose oracle SQL is new or changed this round (the two rerank
gates, cell balance, the two audits, and the re-armed recall-tuned
table). Reuses tools/baseline.py --one children; merge with the r11
full-surface sweep for cross-round comparisons.

Usage: python3 tools/baseline_delta_r12.py [sfdir] [out.json]
"""
import json, subprocess, sys, time, os

HERE = os.path.dirname(os.path.abspath(__file__))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench/baseline_duckdb_r12_delta.json"
NAMES = ["a_knn_pq_rerank", "a_knn_ivfpq_rerank", "a_cell_balance",
         "q_value_quantiles_audit", "q_column_profile_audit",
         "a_ann_recall_tuned"]
RUNS, TIMEOUT = 3, 600

results = {}
for name in NAMES:
    times = []
    for _ in range(RUNS):
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "baseline.py"),
                 "--one", SF, name],
                capture_output=True, text=True, timeout=TIMEOUT)
            if r.returncode != 0:
                print(f"fail {name}: {r.stderr[-300:]}"); times = None; break
            times.append(json.loads(r.stdout)["sec"])
        except subprocess.TimeoutExpired:
            print(f"timeout {name} (> {TIMEOUT}s)"); times = None; break
    results[name] = -1.0 if times is None else sorted(times)[len(times) // 2]
    print(f"{name}: {results[name]:.3f}s", flush=True)
with open(OUT, "w") as f:
    json.dump({"sf": SF, "runs": RUNS, "median_sec": results}, f, indent=1)
print(f"wrote {OUT}")
