#!/usr/bin/env python3
"""Core-scaling probe at 10x data (r20 VERDICT item 9).

The driver's c8-vs-c32 bench comparison reads ~1.0 on every heavy row
because sf0.1 rows are dominated by per-query fixed overhead and the
32-core run fragments tiny inputs into more, smaller tasks. This probe
reuses the ScaleStress harness at factor 10 — where per-row work is
big enough for parallelism to matter — and runs the SAME rows at 32
and at 8 cores (SPARK_GRAFT_CPUS; master and shuffle.partitions follow
it), interleaved in one canary-gated window. Reported number per row:
sec@8c / sec@32c on the 10x medians — materially above 1 wherever the
plans' parallelism claims are real.

Usage: python3 tools/corescale_r21.py [out] [rows_csv] [passes]
"""
import glob, json, os, statistics, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench

ROWS = ",".join([
    "a_kmeans_train_iter10", "a_knn_ivfpq_rerank", "a_knn_ivfsq",
    "d_bucket_balance", "d_simhash", "d_span_strip",
    "q_column_profile", "t_dsir_select", "t_quality_model",
    "p_pack_sequences",
])
STRICT_CANARY = 0.03
FACTOR = 10
REPS = 2


def wait_calm(max_waits=12):
    for _ in range(max_waits):
        c = calmbench.canary()
        if c < STRICT_CANARY:
            return c
        print(f"[corescale] canary {c:.3f}s throttled; waiting", flush=True)
        time.sleep(120)
    raise SystemExit("[corescale] no calm window")


def run(cpus, rows):
    cp = os.environ.get("GRAFT_CLASSES_DIR",
        "/root/repo/target/scala-2.13/classes") + ":" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(
        ["java"] + calmbench.ADD_OPENS + ["-Xmx96g", "-cp", cp,
         "graft.ScaleStress", calmbench.SF, str(FACTOR), str(REPS), rows],
        capture_output=True, text=True, env=env, timeout=3600)
    line = [l for l in r.stdout.splitlines()
            if l.startswith('{"metric":"scalestress"')]
    if r.returncode != 0 or not line:
        raise SystemExit(f"[corescale] run failed: {r.stderr[-2000:]}")
    return json.loads(line[-1])


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench/corescale_r21.json"
    rows = sys.argv[2] if len(sys.argv) > 2 else ROWS
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cpu_pair = [int(x) for x in (sys.argv[4].split(",") if len(sys.argv) > 4
                                 else ["32", "8"])]
    hi, lo = cpu_pair[0], cpu_pair[1]
    acc = {hi: [], lo: []}
    canaries = []
    for i in range(passes):
        for cpus in (hi, lo):
            canaries.append(wait_calm())
            d = run(cpus, rows)
            acc[cpus].append(d)
            print(f"[corescale] pass {i+1} c{cpus}: scaled_total="
                  f"{d['scaled_total']}", flush=True)
    def med(cpus, key, q):
        return statistics.median(d[key][q] for d in acc[cpus])
    qs = list(acc[hi][0]["scaled_sec"].keys())
    table = {}
    for q in qs:
        shi = med(hi, "scaled_sec", q)
        slo = med(lo, "scaled_sec", q)
        table[q] = {f"c{hi}_10x_sec": shi, f"c{lo}_10x_sec": slo,
                    f"c{lo}_over_c{hi}": round(slo / shi, 3) if shi else None,
                    f"c{hi}_1x_sec": med(hi, "base_sec", q),
                    f"c{lo}_1x_sec": med(lo, "base_sec", q)}
    doc = {"factor": FACTOR, "reps": REPS, "passes": passes,
           "cpus": [hi, lo], "canaries": canaries, "queries": table,
           "raw": {str(k): v for k, v in acc.items()}}
    with open(out, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    for q, r in table.items():
        print(f"{q:28s} 10x c{hi} {r[f'c{hi}_10x_sec']:7.2f}  c{lo} "
              f"{r[f'c{lo}_10x_sec']:7.2f}  ratio {r[f'c{lo}_over_c{hi}']}")
    print(f"[corescale] wrote {out}")


if __name__ == "__main__":
    main()
