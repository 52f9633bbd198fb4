#!/usr/bin/env python3
"""Interleaved canary-gated A/B for the round-21 OPTIMIZATION work.

Arms: target/frozen_r21_pre (the classes as this optimization round
inherited them — the round-20 end state) vs target/frozen_r21_post
(a snapshot of the live optimized classes, frozen so a concurrent sbt
compile can never swap class files under a running JVM). One OneBench
JVM per arm per pass, interleaved inside one measurement session,
each JVM canary-gated — the ab_r18..r20 protocol unchanged, except
BOTH passes are recorded: run1 (cold, the honest number for rows
whose results are session-memoized) and run2 (warm).

Usage: python3 tools/ab_r21.py [reps] [out] [queries_csv]
"""
import glob, json, os, re, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

QUERIES_DEFAULT = ",".join([
    # single-materialization of the decode passes
    "x_image_dedup_phash", "x_image_dedup", "x_video_dedup",
    # min_by/max_by hash aggregate
    "q_resample_hourly",
    # per-column overlapped distinct jobs (order: profile pays the build)
    "q_column_profile", "q_column_profile_audit",
    # overlapped tuned legs (cold run1 is the honest read; legs memoized)
    "a_ann_recall", "a_ann_recall_sampled", "a_ann_recall_tuned",
    # untouched control
    "q1_pricing_summary",
])
ARMS = {"pre": "target/frozen_r21_pre", "post": "target/frozen_r21_post"}
STRICT_CANARY = 0.03
RUN_RE = re.compile(r"(\S+) run(\d+): ([\d.]+)")


def wait_calm(max_waits=12):
    for _ in range(max_waits):
        c = calmbench.canary()
        if c < STRICT_CANARY:
            return c
        print(f"[ab] canary {c:.3f}s throttled; waiting", flush=True)
        time.sleep(120)
    raise SystemExit("[ab] no calm window")


def run_arm(classes_dir, queries):
    cp = classes_dir + ":" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    r = subprocess.run(
        ["java"] + calmbench.ADD_OPENS + ["-Xmx96g", "-cp", cp,
         "graft.tools.OneBench", queries, calmbench.SF],
        capture_output=True, text=True, env=env, timeout=1800)
    if r.returncode != 0:
        raise SystemExit(f"[ab] arm failed: {r.stderr[-2000:]}")
    cold, warm = {}, {}
    for m in (RUN_RE.match(l.strip()) for l in r.stdout.splitlines()):
        if m:
            (cold if m.group(2) == "1" else warm)[m.group(1)] = float(m.group(3))
    return cold, warm


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench/ab_r21.json"
    queries = sys.argv[3] if len(sys.argv) > 3 else QUERIES_DEFAULT
    runs = {arm: {"cold": {}, "warm": {}} for arm in ARMS}
    canaries = []
    for i in range(reps):
        for arm, classes in ARMS.items():  # interleaved within each pass
            canaries.append(wait_calm())
            cold, warm = run_arm(classes, queries)
            for tag, d in (("cold", cold), ("warm", warm)):
                for q, v in d.items():
                    runs[arm][tag].setdefault(q, []).append(v)
            print(f"[ab] pass {i+1} {arm}: cold_total="
                  f"{sum(cold.values()):.1f} warm_total={sum(warm.values()):.1f}",
                  flush=True)
    med = {arm: {tag: {q: statistics.median(v) for q, v in d.items()}
                 for tag, d in tags.items()}
           for arm, tags in runs.items()}
    table = {}
    for q in med["pre"]["cold"]:
        table[q] = {
            "pre_cold": med["pre"]["cold"][q],
            "post_cold": med["post"]["cold"].get(q),
            "pre_warm": med["pre"]["warm"].get(q),
            "post_warm": med["post"]["warm"].get(q),
        }
        if table[q]["post_cold"] is not None:
            table[q]["ratio_cold"] = round(
                table[q]["post_cold"] / table[q]["pre_cold"], 3)
    doc = {"queries": table, "runs": runs, "canaries": canaries,
           "reps": reps, "sf": calmbench.SF}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for q, r in table.items():
        print(f"{q:32s} cold {r['pre_cold']:7.2f} -> {r['post_cold']:7.2f}"
              f"  ({r.get('ratio_cold','')})  warm {r['pre_warm']:6.2f} ->"
              f" {r['post_warm']:6.2f}")
    print(f"[ab] wrote {out}")


if __name__ == "__main__":
    main()
