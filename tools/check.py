#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (Spark) on a scale-factor dir, then replays every
oracle SQL in DuckDB over the same parquet tables and diffs the
results: schema (column names/arity), row count, and exact values
after sorting columns by name and rows by value.

Usage: python3 tools/check.py [sfdir] [query ...]
"""
import json, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
OUT = "/root/repo/target/verify_out"
CP = "/root/repo/target/scala-2.13/classes:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))

ADD_OPENS = []
for p in ["java.lang", "java.lang.invoke", "java.lang.reflect", "java.io", "java.net",
          "java.nio", "java.util", "java.util.concurrent", "java.util.concurrent.atomic",
          "sun.nio.ch", "sun.nio.cs", "sun.security.action", "sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]

def run_verify():
    # wipe stale outputs: a query that now fails must not "pass" by
    # diffing a previous run's parquet against the oracle. With an
    # explicit query subset, wipe (and re-dump) just those queries.
    import shutil
    if ONLY:
        for name in ONLY:
            shutil.rmtree(f"{OUT}/{name}", ignore_errors=True)
    else:
        shutil.rmtree(OUT, ignore_errors=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx8g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", CP, "graft.Verify", SF, OUT] + \
        ([",".join(sorted(ONLY))] if ONLY else [])
    r = subprocess.run(cmd, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  !", line[:300])
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode)
        print(r.stderr[-4000:])
        sys.exit(1)

def main():
    run_verify()
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if ONLY and name not in ONLY:
            continue
        sql = oracle[name]
        spark_dir = f"{OUT}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_bad += 1; continue
        sdf = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        oc, sc = sorted(odf.columns), sorted(sdf.columns)
        if oc != sc:
            print(f"FAIL {name}: columns oracle={oc} spark={sc}"); n_bad += 1; continue
        o = odf[oc].sort_values(oc).reset_index(drop=True)
        s = sdf[sc].sort_values(sc).reset_index(drop=True)
        if len(o) != len(s):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}"); n_bad += 1; continue
        # normalize dtypes for compare (int32 vs int64 etc.)
        mism = []
        for c in oc:
            ov, sv = o[c].tolist(), s[c].tolist()
            if ov != sv:
                bad = next(i for i in range(len(ov)) if ov[i] != sv[i])
                mism.append((c, bad, ov[bad], sv[bad]))
        if mism:
            c, i, ov, sv = mism[0]
            print(f"FAIL {name}: col={c} row={i} oracle={ov!r} spark={sv!r} (+{len(mism)-1} more cols)")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(o)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

main()
