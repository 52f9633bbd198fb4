#!/usr/bin/env python3
"""Record the DuckDB single-node baseline for BASELINE.md.

For every SparkEntry.oracleSql query, runs the SQL in DuckDB over the
sf0.1 parquet tables N times (default 3) and records the median
wall-time. Each query runs in a subprocess so a runaway query can be
timed out without killing the sweep.

Usage: python3 tools/baseline.py [sfdir] [out.json] [query ...]
  With query names: a DELTA sweep over just those queries (new or
  changed since the last full sweep) — merge the medians into the
  prior full artifact when recording.
Child: python3 tools/baseline.py --one <sfdir> <name> (internal)
"""
import json, subprocess, sys, time, os

SF = "/root/testdata/sf0.1"
ORACLE = "/root/repo/target/verify_out/oracle_sql.json"
RUNS = 3
TIMEOUT = 300  # seconds per single run

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(sf, name):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    sql = json.load(open(ORACLE))[name]
    t0 = time.time()
    con.execute(sql).fetchall()
    print(json.dumps({"sec": time.time() - t0}))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else SF
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/baseline_duckdb.json"
    oracle = json.load(open(ORACLE))
    subset = sys.argv[3:]
    if subset:
        missing = [q for q in subset if q not in oracle]
        if missing:
            sys.exit(f"unknown queries: {missing}")
        oracle = {q: oracle[q] for q in subset}
    results = {}
    for name in sorted(oracle):
        times = []
        for _ in range(RUNS):
            try:
                r = subprocess.run(
                    [sys.executable, __file__, "--one", sf, name],
                    capture_output=True, text=True, timeout=TIMEOUT)
                if r.returncode != 0:
                    print(f"fail {name}: {r.stderr[-200:]}"); times = None; break
                times.append(json.loads(r.stdout)["sec"])
            except subprocess.TimeoutExpired:
                print(f"timeout {name} (> {TIMEOUT}s)"); times = None; break
        if times is None:
            results[name] = -1.0
        else:
            results[name] = sorted(times)[len(times) // 2]
        print(f"{name}: {results[name]:.3f}s")
    with open(out, "w") as f:
        json.dump({"sf": sf, "runs": RUNS, "median_sec": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3])
    else:
        main()
