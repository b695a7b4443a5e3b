#!/usr/bin/env python3
"""Dev-only local correctness check (mimics the driver's t2 gate).

Runs DuckDB on each SparkEntry.oracleSql entry and compares to the parquet
the Scala Verify main dumped. Columns are sorted by name before comparison
(same as the driver), values hashed after a stable string rendering.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
NOT part of the engine — the Scala library has no Python dependency.
"""
import json, math, sys, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def make_views(con, sfdir):
    for t in TABLES:
        # driver fixtures are single parquet FILES; GenScale fixtures are
        # Spark-written DIRECTORIES of part files — accept both
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


def canon(df):
    df = df[sorted(df.columns)]
    def render(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = [tuple(render(v) for v in row) for row in df.itertuples(index=False)]
    return list(df.columns), rows


def compare_one(con, outdir, name, sql, timing=False):
    """One t2-gate compare: Spark parquet dump vs the DuckDB oracle.
    Prints PASS/FAIL with the first differing row; returns True on pass.
    The single compare implementation — check_each.py reuses it, so the
    two harnesses cannot drift."""
    qdir = os.path.join(outdir, name)
    if not glob.glob(os.path.join(qdir, "*.parquet")):
        print(f"FAIL {name}: no spark output")
        return False
    try:
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        t0 = time.time()  # oracle-only wall: the Spark read is not billed
        duck_df = con.sql(sql).df()
        oracle_s = time.time() - t0
    except Exception as e:
        print(f"FAIL {name}: {e}")
        return False
    sc, sr = canon(spark_df)
    dc, dr = canon(duck_df)
    if sc != dc:
        print(f"FAIL {name}: columns spark={sc} duck={dc}")
        return False
    if sr != dr:
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:
                print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                break
        else:
            if len(sr) != len(dr):
                print(f"  row-count mismatch; spark head={sr[:2]} duck head={dr[:2]}")
        return False
    suffix = f", oracle {oracle_s:.1f}s" if timing else ""
    print(f"PASS {name} ({len(sr)} rows{suffix})")
    return True


def main(outdir, sfdir):
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    make_views(con, sfdir)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if compare_one(con, outdir, name, oracles[name]):
            n_pass += 1
        else:
            n_fail += 1
    # queries without oracle: rows-only check
    for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir) or name in oracles:
            continue
        try:
            n = con.sql(f"SELECT COUNT(*) FROM '{qdir}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n}")
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
