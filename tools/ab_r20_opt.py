#!/usr/bin/env python3
"""Interleaved canary-gated A/B for the round-20 OPTIMIZATION work.

Arms: target/frozen_r20_pre (the classes as the optimization round
inherited them — r19 code + the round-20 build items) vs the live
target/scala-2.13/classes (the optimized code). One OneBench JVM per
arm per pass, interleaved inside one measurement session, each JVM
canary-gated, warm second pass is the measurement — the ab_r18/r19/r20
protocol unchanged.

Rows: the queries whose chains the optimization touched —
multimodal single-modality synthesis pruning, the cluster-label cache,
the prod-signature cache, the ppjoin prefix cache, the T21 weights
memo. q1_pricing_summary rides along as the UNTOUCHED control (its
chain is byte-identical in both arms) to read the window's noise
floor.

Usage: python3 tools/ab_r20_opt.py [reps] [out]
"""
import glob, json, os, re, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

QUERIES = ",".join([
    # multimodal filter-before-synthesis
    "x_resize", "x_audio_resample", "x_frame_sample",
    "x_image_dedup", "x_video_dedup",
    # cluster-label cache consumers (order matters: first pays the build)
    "d_dedup_clusters", "d_dedup_report", "d_quality_keeper",
    "d_model_keeper", "p_cluster_split", "p_curation_audit",
    # prod-signature share + ppjoin prefix cache + T21 memo
    "d_bucket_balance", "d_minhash_lsh_prod", "d_ngram_jaccard",
    "t_quality_model",
    # profiler shared exact-distinct pass
    "q_column_profile", "q_column_profile_audit",
    # recall-harness leg memo (sampled reuses recall's six legs)
    "a_ann_recall", "a_ann_recall_sampled",
    # untouched control
    "q1_pricing_summary",
])
ARMS = {"pre": "target/frozen_r20_pre", "post": "target/frozen_r20_post"}
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
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench/ab_r20_opt.json"
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
    ratio = {q: round(med["post"][q] / med["pre"][q], 3)
             for q in med["pre"] if q in med["post"]}
    art = {"metric": "ab_r20_optimization", "reps": reps,
           "queries": QUERIES.split(","), "canaries": canaries,
           "median": med, "per_rep": runs, "ratio_post_over_pre": ratio}
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(f"[ab] written {out}: ratios {ratio}", flush=True)


if __name__ == "__main__":
    main()
