#!/usr/bin/env python3
"""Controlled same-window A/B for the r18 perf-watch row (VERDICT r18
item 3 / What's-wrong #1): `d_containment_pairs` ran 1.31x slower
under r18 code than under frozen r17 code in the r18 window — the one
row whose same-window code delta exceeded the noise band. This is the
interleaved canary-gated A/B (the ab_r18_incdedup method) that either
pins it to noise with numbers or confirms a real regression to bisect.

Arms: frozen_r17 vs frozen_r18 — the two code states whose same-window
delta the r18 verdict measured at 1.31x (the operator is unchanged at
HEAD, so settling r17-vs-r18 settles the question). `d_ngram_jaccard`
rides along as a control — it shares the PPJoin prefix machinery and
the r18 heavy-hitter threshold constant (commit 66027c3) that the
verdict flagged as the suspect change.

Method: interleave one OneBench JVM per arm, REPS passes, every JVM
individually canary-gated, all inside one measurement session so both
arms share whatever window the host gives us. OneBench warms the
session (d_contamination) and runs the query list twice; the warm
second pass is the measurement. Medians per (arm, query) + the
r18/r17 ratio -> bench/ab_r19_containment.json.

Usage: python3 tools/ab_r19.py [reps]
"""
import glob, json, os, re, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

QUERIES = "d_containment_pairs,d_ngram_jaccard"
ARMS = {"r17": "target/frozen_r17", "r18": "target/frozen_r18"}
STRICT_CANARY = 0.03
OUT = "/root/repo/bench/ab_r19_containment.json"
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
    ratio = {q: round(med["r18"][q] / med["r17"][q], 3)
             for q in med["r17"] if q in med["r18"]}
    art = {"metric": "ab_containment_pairs", "reps": reps,
           "queries": QUERIES.split(","), "canaries": canaries,
           "median": med, "per_rep": runs, "ratio_r18_over_r17": ratio}
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[ab] written {OUT}: ratios {ratio}", flush=True)


if __name__ == "__main__":
    main()
