#!/usr/bin/env python3
"""Honest second DuckDB number for q_range_ship_density (BASELINE).

The recorded baseline runs the NAIVE theta join (the SQL a user would
write; >300 s at sf0.1 — a timeout row). Graft's gated plan is the
bucketized rewrite (day-count aggregation + 3 candidate epochs per
order + own-shipment correction). This script times DuckDB running
THAT SAME rewrite, so BASELINE can show both numbers: engine-vs-engine
on the naive form AND plan-for-plan on the rewrite.

Protocol mirrors tools/baseline.py: each timed run in a subprocess,
300 s timeout, median of 3. Before timing, the rewrite is checked
row-identical to the recorded naive oracle at sf0.01.

Usage: python3 tools/range_density_rewrite.py [sfdir] [out.json]
Child: --one <sfdir> (internal)
"""
import json, subprocess, sys, time

SF = "/root/testdata/sf0.1"
CHECK_SF = "/root/testdata/sf0.01"
ORACLE = "/root/repo/target/verify_out/oracle_sql.json"
RUNS = 3
TIMEOUT = 300

REWRITE = """
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         (epoch_us(o_orderdate) // 1000000)::BIGINT AS o_epoch
  FROM orders
), l AS (
  SELECT l_orderkey, (epoch_us(l_shipdate) // 1000000)::BIGINT AS l_epoch
  FROM lineitem
), dc AS (
  SELECT l_epoch, count(*)::BIGINT AS n_ship FROM l GROUP BY l_epoch
), cand AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         o.o_epoch + off.d AS cand_epoch, o.o_epoch
  FROM o, (VALUES (-86400), (0), (86400)) off(d)
), nearby AS (
  SELECT o_orderkey, o_orderpriority,
         sum(coalesce(n_ship, 0))::BIGINT AS total_nearby
  FROM cand LEFT JOIN dc ON dc.l_epoch = cand.cand_epoch
  GROUP BY o_orderkey, o_orderpriority
), own AS (
  SELECT o.o_orderkey AS own_key, count(*)::BIGINT AS own_nearby
  FROM o JOIN l ON l.l_orderkey = o.o_orderkey
              AND abs(l.l_epoch - o.o_epoch) <= 86400
  GROUP BY o.o_orderkey
)
SELECT o_orderpriority,
       sum(total_nearby - coalesce(own_nearby, 0))::BIGINT AS nearby_shipments,
       sum(CASE WHEN total_nearby - coalesce(own_nearby, 0) > 0
                THEN 1 ELSE 0 END)::BIGINT AS n_orders
FROM nearby LEFT JOIN own ON o_orderkey = own_key
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

TABLES = ["orders", "lineitem"]


def connect(sf):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def run_one(sf):
    con = connect(sf)
    t0 = time.time()
    con.execute(REWRITE).fetchall()
    print(json.dumps({"sec": time.time() - t0}))


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else SF
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/repo/bench/range_density_rewrite_r14.json"
    # correctness first: the rewrite must reproduce the recorded naive
    # oracle exactly (sf0.01, where the naive form finishes in seconds)
    naive_sql = json.load(open(ORACLE))["q_range_ship_density"]
    con = connect(CHECK_SF)
    naive = con.execute(naive_sql).fetchall()
    rewrite = con.execute(REWRITE).fetchall()
    if naive != rewrite:
        sys.exit(f"rewrite != naive oracle at {CHECK_SF}:\n{naive}\nvs\n{rewrite}")
    print(f"[rewrite] equality vs naive oracle at {CHECK_SF}: OK ({len(naive)} rows)")
    times = []
    for i in range(RUNS):
        try:
            r = subprocess.run([sys.executable, __file__, "--one", sf],
                               capture_output=True, text=True, timeout=TIMEOUT)
            if r.returncode != 0:
                sys.exit(f"run failed: {r.stderr[-300:]}")
            sec = json.loads(r.stdout)["sec"]
            times.append(sec)
            print(f"[rewrite] run {i + 1}: {sec:.2f} s")
        except subprocess.TimeoutExpired:
            sys.exit(f"timeout (> {TIMEOUT}s)")
    med = sorted(times)[len(times) // 2]
    art = {"query": "q_range_ship_density", "form": "bucketized_rewrite",
           "sf": sf, "runs": times, "median_sec": round(med, 3),
           "equality_checked_at": CHECK_SF,
           "note": "DuckDB running graft's bucketized plan (day-count agg + "
                   "3 candidate epochs + own correction); the recorded "
                   "baseline row is the naive theta join (>300 s timeout)."}
    json.dump(art, open(out, "w"), indent=1)
    print(f"[rewrite] median {med:.2f} s -> {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
