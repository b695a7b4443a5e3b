#!/usr/bin/env python3
"""Per-query oracle compare with a wall-clock timeout — the sf1 harness.

check.py runs every oracle in one process; at deep-scale fixtures a
single DuckDB oracle can legitimately blow up (quadratic verification
CTEs, the r6 k-core CTE-inlining temp-disk lesson), and one runaway
query must not sink the whole sweep. This wrapper runs each compare in
a child process under `timeout_s` and reports PASS / FAIL / TIMEOUT per
query plus the oracle's wall seconds. The compare itself IS
check.compare_one — one implementation, no drift from the t2 mimic.

Usage: check_each.py <verify_out_dir> <sf_dir> [timeout_s=900] [names...]
NOT part of the engine — dev tooling only, like check.py.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import check  # noqa: E402  (views + canon + the one compare impl)


def run_one(outdir, sfdir, name):
    import duckdb
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        sql = json.load(f)[name]
    con = duckdb.connect()
    check.make_views(con, sfdir)
    return 0 if check.compare_one(con, outdir, name, sql, timing=True) else 1


def main():
    if sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], sys.argv[3], sys.argv[4]))
    outdir, sfdir = sys.argv[1], sys.argv[2]
    tmo = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    names = sys.argv[4:] or sorted(
        json.load(open(os.path.join(outdir, "oracle_sql.json"))))
    n_pass = n_fail = n_tmo = 0
    for n in names:
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
