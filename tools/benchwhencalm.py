#!/usr/bin/env python3
"""Adaptive calm-window bench recorder (calmbench + a JVM pre-probe).

The DuckDB canary is necessary but NOT sufficient: this host's
throttle hits the 32-thread JVM while single-connection DuckDB stays
fast, so canary-clean windows have produced 4x-slow bench runs. This
wrapper gates each run on BOTH:

1. the DuckDB canary (stricter than calmbench: < STRICT_CANARY), and
2. a short timed JVM probe (graft.ScaleStress factor=1 reps=1 over
   sf0.1, wall-clamped): the probe's warm pass must hit calm medians
   for d_dedup_clusters / a_kmeans_train_iter10, or the window is
   declared throttled without burning a full bench run.

Only runs whose TOTAL lands under MAX_SANE_TOTAL are kept; a slow
total means the throttle arrived mid-run. Keepers may therefore come
from different calm stretches of the same session — each is
individually canary+probe+total gated, which is stronger than
calmbench's single entry gate.

Usage: python3 tools/benchwhencalm.py [tag] [keepers] [max_attempts]
"""
import glob, json, os, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

STRICT_CANARY = 0.03
PROBE_TIMEOUT = 300          # calm probe ~95 s (+ the untimed warmup pass
                             # ScaleStress now runs per scale); 4x-slow
                             # would still blow this
PROBE_DEDUP_MAX = 16.0       # calm warm median ~8-12 s
PROBE_KMEANS_MAX = 9.0       # calm warm median ~5-7 s
MAX_SANE_TOTAL = 460.0       # r20: surface grows to 149 gated queries
OLD_MAX_SANE_TOTAL_R19 = 430.0  # r19 note kept: the surface was then 147
                             # (+a_hybrid_search_ivf ~3 s calm — lexical
                             # leg + trained-IVF leg both already amortized
                             # by the centroid memo; +t_cms_estimate ~1 s:
                             # one sketch build + a candidate projection;
                             # +a_knn_rp ~1 s: one projected scan + a
                             # request-scale rerank; +a_knn_rp_recall
                             # ~2 s: two rp arms + the shared truth memo;
                             # +t_tokenizer_fit ~1 s: one BPE projection
                             # + a lang-cardinality groupBy);
                             # ~+8 calm seconds, ample slack under 400.
                             # r17 note kept: the surface was then 136
                             # gated queries (+7 new rows incl. the
                             # tokenize-ids pair, pHash, sampled recall,
                             # OPQ, escalated filtered kNN; tuned recall
                             # gained a method; late r17: +t_cms_sketch
                             # +t_cms_heavy_hitters +d_contamination_fuzzy,
                             # ~6 calm seconds) — ~+36 calm seconds total
OLD_MAX_SANE_TOTAL_R16 = 360.0  # r16 note kept: the surface was then 126
                             # queries (r15's 122 + a_knn_filtered ~2 s
                             # + a_knn_filtered_truth ~1 s +
                             # a_knn_filtered_recall ~15-25 s: two
                             # filtered brute truths at RecallK + 4 IVF
                             # filtered runs + t_token_count_bpe_prod
                             # ~2 s under the 2000-merge table)
OLD_MAX_SANE_TOTAL = 320.0   # r15 note kept: the surface was then 122
                             # queries (r14's 119 + r_store_dead_events
                             # ~1 s + t_token_count_bpe ~2 s +
                             # p_pack_sequences_bpe ~3 s), while the
                             # recall-pair ground-truth memo gives back
                             # several seconds — calm full-surface total
                             # expected ~255-285 s on an r14-class
                             # window; 320 still catches the 2-3x
                             # throttle swings this gate exists for.
                             # r14 note kept for the audit trail:
                             # (was 300.0) r14 recalibration: two r14 attempts with
                             # CALM canaries AND calm probes (4.4-6.4 s
                             # kmeans probe) benched 243/254 s — within 4%
                             # of each other, nothing like the 2-3x
                             # throttle swings this gate exists for; a
                             # same-window frozen-r13-classes anchor ran
                             # 251.4 s (the code behind r13's 193.7 s), so
                             # the shift is the HOST WINDOW (1.30x slower
                             # day), not the code. Calm 116-query surface
                             # ~245-260 s; the three queries added after
                             # the r14 sweep (d_semantic_dedup_k256 ~4.9 s
                             # cold, t_dsir_select ~2.5 s, d_span_strip
                             # ~3.0 s) put the full 119-query surface near
                             # ~255-270 s on an r14-class window.
COOLDOWN = 240
SF = calmbench.SF
OUT = calmbench.OUT


def jvm_probe():
    cp = os.environ.get("GRAFT_CLASSES_DIR",  # frozen snapshot: sbt compile swaps
        "/root/repo/target/scala-2.13/classes") + ":" + ":".join(  # class files under a live probe
        
        glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    try:
        r = subprocess.run(
            ["java"] + calmbench.ADD_OPENS + ["-Xmx96g", "-cp", cp,
             "graft.ScaleStress", SF, "1", "1",
             "a_kmeans_train_iter10,d_dedup_clusters"],
            capture_output=True, text=True, env=env, timeout=PROBE_TIMEOUT)
    except subprocess.TimeoutExpired:
        return None, "probe wall-clamp exceeded"
    line = [l for l in r.stdout.splitlines() if l.startswith('{"metric"')]
    if r.returncode != 0 or not line:
        return None, f"probe failed: {r.stderr[-500:]}"
    warm = json.loads(line[-1])["scaled_sec"]
    ok = (warm["d_dedup_clusters"] < PROBE_DEDUP_MAX
          and warm["a_kmeans_train_iter10"] < PROBE_KMEANS_MAX)
    return ok, warm


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    want = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    max_attempts = int(sys.argv[3]) if len(sys.argv) > 3 else 14
    keepers = []
    for attempt in range(1, max_attempts + 1):
        c = calmbench.canary()
        print(f"[benchwhencalm] attempt {attempt}: canary {c:.3f}s", flush=True)
        if c >= STRICT_CANARY:
            print(f"[benchwhencalm] canary throttled; cooling {COOLDOWN}s", flush=True)
            time.sleep(COOLDOWN)
            continue
        ok, info = jvm_probe()
        print(f"[benchwhencalm] jvm probe: {'CALM' if ok else 'THROTTLED'} {info}",
              flush=True)
        if not ok:
            time.sleep(COOLDOWN)
            continue
        t0 = time.time()
        res = calmbench.run_bench()
        res["canary_sec"] = c
        total = res["value"]
        print(f"[benchwhencalm] bench total {total:.1f}s (wall {time.time()-t0:.0f}s)",
              flush=True)
        if total > MAX_SANE_TOTAL:
            print(f"[benchwhencalm] DISCARD (> {MAX_SANE_TOTAL}s: throttle mid-run)",
                  flush=True)
            time.sleep(COOLDOWN)
            continue
        keepers.append(res)
        path = f"{OUT}/bench_run_{tag}_{len(keepers)}.json"
        json.dump(res, open(path, "w"))
        print(f"[benchwhencalm] KEEP {len(keepers)}/{want} -> {path}", flush=True)
        if len(keepers) >= want:
            break
        time.sleep(COOLDOWN)
    if not keepers:
        print("[benchwhencalm] no clean runs recorded")
        sys.exit(1)
    med = {
        "metric": "total", "unit": "sec", "sf": SF, "runs": len(keepers),
        "value": statistics.median(r["value"] for r in keepers),
        "canaries": [r["canary_sec"] for r in keepers],
        "queries": {
            q: statistics.median(r["queries"][q] for r in keepers)
            for q in keepers[0]["queries"]
        },
    }
    json.dump(med, open(f"{OUT}/bench_median_{tag}.json", "w"), indent=1)
    print(f"[benchwhencalm] median total {med['value']:.1f}s over "
          f"{len(keepers)} clean runs -> {OUT}/bench_median_{tag}.json", flush=True)


if __name__ == "__main__":
    main()
