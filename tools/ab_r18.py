#!/usr/bin/env python3
"""Controlled same-window A/B for the r17 perf-weak rows (VERDICT r17
item 2): `d_incremental_dedup` / `d_incremental_dedup_indexed` ran
3.2-4.5x slower under r17 classes than under frozen r16 classes in the
r17 window, and `t_token_count_bpe`/`_prod` 1.8-2.1x — but none of the
four got the controlled A/B that cleared `d_dedup_clusters` in r16.

Method (the d_dedup_clusters method): interleave one OneBench JVM per
arm (frozen_r16 vs frozen_r17 classes), REPS passes, every JVM
individually canary-gated, all inside one measurement session so both
arms share whatever window the host gives us. OneBench warms the
session (d_contamination) and runs the query list twice; the warm
second pass is the measurement. Medians per (arm, query) + the
r17/r16 ratio -> bench/ab_r18_incdedup.json.

Reading the result: ratio ~1 on every query = the r17-window numbers
were host drift (case closed, like d_dedup_clusters); ratio >> 1
reproduced here = a real r17 code regression -> bisect the r17 commits
against these queries.

Usage: python3 tools/ab_r18.py [reps]
"""
import glob, json, os, re, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

QUERIES = ("d_incremental_dedup,d_incremental_dedup_indexed,"
           "t_token_count_bpe,t_token_count_bpe_prod")
ARMS = {"r16": "target/frozen_r16", "r17": "target/frozen_r17"}
STRICT_CANARY = 0.03
OUT = "/root/repo/bench/ab_r18_incdedup.json"
RUN_RE = re.compile(r"(\S+) run(\d+): ([\d.]+)")


def wait_calm(max_waits=10):
    for _ in range(max_waits):
        c = calmbench.canary()
        if c < STRICT_CANARY:
            return c
        print(f"[ab] canary {c:.3f}s throttled; waiting", flush=True)
        time.sleep(120)
    raise SystemExit("[ab] no calm window")


def run_arm(classes_dir):
    cp = classes_dir + ":" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    r = subprocess.run(
        ["java"] + calmbench.ADD_OPENS + ["-Xmx96g", "-cp", cp,
         "graft.tools.OneBench", QUERIES, calmbench.SF],
        capture_output=True, text=True, env=env, timeout=1800)
    if r.returncode != 0:
        raise SystemExit(f"[ab] arm failed: {r.stderr[-500:]}")
    warm = {}
    for m in (RUN_RE.match(l.strip()) for l in r.stdout.splitlines()):
        if m and m.group(2) == "2":
            warm[m.group(1)] = float(m.group(3))
    return warm


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = {arm: {} for arm in ARMS}
    canaries = []
    for i in range(reps):
        for arm, classes in ARMS.items():  # interleaved within each pass
            canaries.append(wait_calm())
            res = run_arm(classes)
            for q, s in res.items():
                runs[arm].setdefault(q, []).append(s)
            print(f"[ab] pass {i + 1} {arm}: " + " ".join(
                f"{q}={s:.2f}" for q, s in sorted(res.items())), flush=True)
    med = {arm: {q: round(statistics.median(xs), 3)
                 for q, xs in qs.items()} for arm, qs in runs.items()}
    ratio = {q: round(med["r17"][q] / med["r16"][q], 3)
             for q in med["r16"] if q in med["r17"]}
    art = {"metric": "ab_incremental_dedup", "reps": reps,
           "queries": QUERIES.split(","), "canaries": canaries,
           "median": med, "per_rep": runs, "ratio_r17_over_r16": ratio}
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"medians": med, "ratio": ratio}))


if __name__ == "__main__":
    main()
