#!/usr/bin/env python3
"""Dev-only local correctness check (mimics the driver's t2 gate).

Runs DuckDB on each SparkEntry.oracleSql entry and compares to the parquet
the Scala Verify main dumped. Columns are sorted by name before comparison
(same as the driver), values hashed after a stable string rendering.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
NOT part of the engine — the Scala library has no Python dependency.
"""
import json, math, sys, glob, os
import duckdb


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


def main(outdir, sfdir):
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        qdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, sr = canon(spark_df)
        dc, dr = canon(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1
        elif sr != dr:
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                if len(sr) != len(dr):
                    print(f"  row-count mismatch; spark head={sr[:2]} duck head={dr[:2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)"); n_pass += 1
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
