#!/usr/bin/env python3
"""Controlled same-window A/B for the r19 perf-watch rows (VERDICT r19
item 1 + item 5): `a_knn_opq` read 3.0x slower on the r19 gated
medians than on r18's (2.10 -> 6.34 s) with NO code change to its
chain, and `x_frame_sample` drifted 1.55x on equally untouched code.
This is the interleaved canary-gated A/B (the ab_r18/ab_r19 method)
that either pins both to host/window with numbers or confirms a real
regression to bisect.

Arms: frozen_r18 vs frozen_r19 — the two code states whose gated
medians diverged. Controls ride along: `a_knn_pq` (same PQ machinery
minus the OPQ permutation; byte-identical code in both arms) and
`x_video_dedup` (same multimodal decode machinery) measure the two
families' in-window noise floors, the r19 lesson being that a control
on IDENTICAL code can read 2x in a rough window.

Method: interleave one OneBench JVM per arm, REPS passes, every JVM
individually canary-gated, all inside one measurement session so both
arms share whatever window the host gives us. OneBench warms the
session (d_contamination) and runs the query list twice; the warm
second pass is the measurement. Medians per (arm, query) + the
r19/r18 ratio -> bench/ab_r20_opq.json.

Usage: python3 tools/ab_r20.py [reps]
"""
import glob, json, os, re, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

QUERIES = "a_knn_opq,a_knn_pq,x_frame_sample,x_video_dedup"
ARMS = {"r18": "target/frozen_r18", "r19": "target/frozen_r19"}
STRICT_CANARY = 0.03
OUT = "/root/repo/bench/ab_r20_opq.json"
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
    ratio = {q: round(med["r19"][q] / med["r18"][q], 3)
             for q in med["r18"] if q in med["r19"]}
    art = {"metric": "ab_opq_framesample", "reps": reps,
           "queries": QUERIES.split(","), "canaries": canaries,
           "median": med, "per_rep": runs, "ratio_r19_over_r18": ratio}
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[ab] written {OUT}: ratios {ratio}", flush=True)


if __name__ == "__main__":
    main()
