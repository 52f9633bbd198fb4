#!/usr/bin/env python3
"""Calm-window recorder for the 10x ScaleStress run (VERDICT r07 item 2).

Same gates as benchwhencalm (strict DuckDB canary + timed 1x JVM
probe), plus an intra-run stability check: ScaleStress prints per-rep
timings to stderr, and a throttle wide enough to corrupt a reported
median shows up as median/min > 2x for some significant query (calm
reps differ only by JIT drift, well under 2x). Unstable runs are
discarded; single-rep spikes leave the median honest and pass.

Usage: python3 tools/scalestresswhencalm.py [tag] [factor] [reps] [max_attempts] [subset]
`subset` (optional) is a comma-separated query list passed through to
graft.ScaleStress, so separate families can be recorded as separate
gated artifacts. Writes bench/scalestress_<tag>.json (the harness's
own JSON line plus the per-rep audit trail).
"""
import glob, json, os, re, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import calmbench, benchwhencalm

# The artifact reports per-query MEDIANS of the reps, so the gate tests
# the median's integrity, not the worst rep: median/min <= 2 means at
# most one of 3 reps spiked (calm JIT drift is well under 2x), leaving
# the reported median honest. A throttle window wide enough to corrupt
# the median must hit >=2 reps, which pushes median/min past the bound.
# (r08-r10 discard audits show the old max/min gate rejecting runs for
# single-rep spikes — e.g. kmeans [26.4, 5.1, 5.9] — whose medians were
# fine, which is why three rounds produced zero artifacts.)
MAX_MED_SWING = 2.0
# Swings on queries whose slowest rep is under this floor are scheduler
# noise (a 0.5s-vs-2.9s blip), not evidence of host throttle: a throttle
# window distorting a multi-minute run always shows in the >=5s queries.
SIG_FLOOR_SEC = 5.0
STRESS_TIMEOUT = 3600
COOLDOWN = 240

REP_RE = re.compile(r"\[scalestress\] (\S+) rep (\d+): (.*)")


def run_stress(factor, reps, subset=None):
    cp = os.environ.get("GRAFT_CLASSES_DIR",  # frozen snapshot: sbt compile swaps
        "/root/repo/target/scala-2.13/classes") + ":" + ":".join(  # class files under a live probe
        
        glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_CPUS="32")
    args = ["graft.ScaleStress", calmbench.SF, str(factor), str(reps)]
    if subset:
        args.append(subset)
    try:
        r = subprocess.run(
            ["java"] + calmbench.ADD_OPENS + ["-Xmx96g", "-cp", cp] + args,
            capture_output=True, text=True, env=env, timeout=STRESS_TIMEOUT)
    except subprocess.TimeoutExpired:
        return None, None, "wall-clamp exceeded (throttle)"
    line = [l for l in r.stdout.splitlines() if l.startswith('{"metric"')]
    if r.returncode != 0 or not line:
        return None, None, f"failed: {r.stderr[-500:]}"
    per_rep = {}  # (tag, query) -> [sec per rep]
    for m in (REP_RE.match(l.strip()) for l in r.stderr.splitlines()):
        if not m:
            continue
        for qv in m.group(3).split():
            q, v = qv.split("=")
            per_rep.setdefault((m.group(1), q), []).append(float(v))
    res = json.loads(line[-1])
    # memory-pressure audit: executor page-allocation retries at 10x
    # would mean the per-partition working set no longer fits — record
    # the count so the artifact itself says whether the run was clean
    res["mem_warnings"] = sum(
        1 for l in r.stderr.splitlines()
        if "TaskMemoryManager" in l or "Failed to allocate a page" in l)
    return res, per_rep, None


def stable(per_rep):
    worst = ("", 1.0)
    for (tag, q), xs in per_rep.items():
        if max(xs) < SIG_FLOOR_SEC:
            continue
        med = sorted(xs)[len(xs) // 2]
        swing = med / max(min(xs), 1e-9)
        if swing > worst[1]:
            worst = (f"{tag}/{q} reps={['%.1f' % x for x in xs]}", swing)
    return worst[1] <= MAX_MED_SWING, worst


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    max_attempts = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    subset = sys.argv[5] if len(sys.argv) > 5 else None
    for attempt in range(1, max_attempts + 1):
        c = calmbench.canary()
        print(f"[stresswhencalm] attempt {attempt}: canary {c:.3f}s", flush=True)
        if c >= benchwhencalm.STRICT_CANARY:
            print(f"[stresswhencalm] canary throttled; cooling {COOLDOWN}s",
                  flush=True)
            time.sleep(COOLDOWN)
            continue
        ok, info = benchwhencalm.jvm_probe()
        print(f"[stresswhencalm] jvm probe: {'CALM' if ok else 'THROTTLED'} {info}",
              flush=True)
        if not ok:
            time.sleep(COOLDOWN)
            continue
        t0 = time.time()
        res, per_rep, err = run_stress(factor, reps, subset)
        if err:
            print(f"[stresswhencalm] DISCARD: {err}", flush=True)
            time.sleep(COOLDOWN)
            continue
        is_stable, worst = stable(per_rep)
        print(f"[stresswhencalm] run done in {time.time()-t0:.0f}s; "
              f"worst rep swing {worst[1]:.2f}x ({worst[0]})", flush=True)
        res["canary_sec"] = c
        res["per_rep"] = {f"{t}/{q}": xs for (t, q), xs in sorted(per_rep.items())}
        if not is_stable:
            # keep the audit trail: a discarded run's per-rep data still
            # documents WHICH rep the throttle hit (typically one ~100 s
            # spike in an otherwise calm run) — evidence, not artifact
            res["gated"] = False
            res["worst_swing"] = worst[1]
            with open(f"{calmbench.OUT}/scalestress_{tag}_discards.jsonl", "a") as f:
                f.write(json.dumps(res) + "\n")
            print(f"[stresswhencalm] DISCARD (median swing > {MAX_MED_SWING}x: "
                  f"throttle mid-run); per-rep audit appended", flush=True)
            time.sleep(COOLDOWN)
            continue
        path = f"{calmbench.OUT}/scalestress_{tag}.json"
        json.dump(res, open(path, "w"), indent=1)
        print(f"[stresswhencalm] KEEP -> {path}", flush=True)
        return
    print("[stresswhencalm] no clean run recorded")
    sys.exit(1)


if __name__ == "__main__":
    main()
