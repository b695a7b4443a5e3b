#!/usr/bin/env python3
"""Per-query oracle compare with a wall-clock timeout — the sf1 harness.

check.py runs every oracle in one process; at deep-scale fixtures a
single DuckDB oracle can legitimately blow up (quadratic verification
CTEs, the r6 k-core CTE-inlining temp-disk lesson), and one runaway
query must not sink the whole sweep. This wrapper runs each compare in
a child process under `timeout_s` and reports PASS / FAIL / TIMEOUT
per query plus each side's wall seconds.

Usage: check_each.py <verify_out_dir> <sf_dir> [timeout_s=900] [names...]
NOT part of the engine — dev tooling only, like check.py.
"""
import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import check  # noqa: E402  (canon + the driver-mimic rendering rules)


def run_one(outdir, sfdir, name):
    import duckdb
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        sql = json.load(f)[name]
    qdir = os.path.join(outdir, name)
    if not glob.glob(os.path.join(qdir, "*.parquet")):
        print(f"FAIL {name}: no spark output")
        return 1
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver fixtures are single parquet FILES; GenScale fixtures are
        # Spark-written DIRECTORIES of part files — accept both
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    t0 = time.time()
    spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        return 1
    dt = time.time() - t0
    sc, sr = check.canon(spark_df)
    dc, dr = check.canon(duck_df)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}")
        return 1
    if sr != dr:
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                break
        return 1
    print(f"PASS {name} ({len(sr)} rows, oracle {dt:.1f}s)")
    return 0


def main():
    if sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], sys.argv[3], sys.argv[4]))
    outdir, sfdir = sys.argv[1], sys.argv[2]
    tmo = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    names = sys.argv[4:] or sorted(
        json.load(open(os.path.join(outdir, "oracle_sql.json"))))
    n_pass = n_fail = n_tmo = 0
    for n in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", outdir, sfdir, n],
                timeout=tmo)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {n} after {tmo}s")
            n_tmo += 1
            continue
        n_pass += ok
        n_fail += not ok
        sys.stdout.flush()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_tmo} timeout "
          f"(per-query timeout {tmo}s)")
    sys.exit(1 if (n_fail or n_tmo) else 0)


if __name__ == "__main__":
    main()
