#!/usr/bin/env python3
"""Per-query scaling-exponent audit (r13 verdict directive #4).

Fits t ~ c * n^alpha per bench entry across the fixture ladder and
flags entries whose alpha exceeds a threshold — the quantitative form
of "would this plan survive 100x?". n is the fixture's TOTAL row count
across the ten harness tables (a single size axis; per-query table
subsets would be more precise but the flag threshold absorbs that).

Input: one or more per-fixture bench detail JSONs (the
`{"metric":"detail",...,"queries":{...},"sf":...}` line Bench prints),
each paired with its fixture dir for the row census. Entries timed
under the small-t floor at EVERY point are skipped (fixed JVM/plan
overhead dominates; an exponent fit over noise flags nothing real).

Usage:
  scaling_audit.py out.md detail1.json=sfdir1 detail2.json=sfdir2 ...
NOT part of the engine — dev tooling only, like check.py.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ALPHA_FLAG = 1.3   # flag superlinear growth beyond log-factor slack
T_FLOOR = 0.25     # s; points below at every fixture -> unfittable noise
T_FIT_MIN = 0.05   # s; individual points below this are dropped


def census(sfdir):
    con = duckdb.connect()
    n = 0
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        n += con.sql(f"SELECT COUNT(*) FROM '{p}'").fetchone()[0]
    return n


def fit_alpha(points):
    """Least-squares slope of log t on log n."""
    xs = [math.log(n) for n, _ in points]
    ys = [math.log(t) for _, t in points]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    sxx = sum((x - mx) ** 2 for x in xs)
    if sxx == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx


def main():
    out_md, pairs = sys.argv[1], sys.argv[2:]
    series = []  # (sfdir, n_rows, {query: t})
    for pair in pairs:
        detail, sfdir = pair.split("=", 1)
        with open(detail) as f:
            d = json.load(f)
        series.append((sfdir, census(sfdir), d["queries"]))
    series.sort(key=lambda s: s[1])
    names = sorted(set().union(*[set(q) for _, _, q in series]))
    rows = []
    for name in names:
        pts = [(n, q[name]) for _, n, q in series
               if name in q and q[name] >= T_FIT_MIN]
        if len(pts) < 3 or max(t for _, t in pts) < T_FLOOR:
            continue
        a = fit_alpha(pts)
        if a is None:
            continue
        # top-segment exponent: the global fit is diluted by the flat
        # fixed-overhead small-SF points; the largest ladder step is the
        # signal for "would the NEXT 10x survive"
        (n0, t0), (n1, t1) = pts[-2], pts[-1]
        a_top = (math.log(t1 / t0) / math.log(n1 / n0)
                 if t0 > 0 and n1 > n0 else None)
        rows.append((max(a, a_top if a_top is not None else a),
                     name, a, a_top, pts))
    rows.sort(key=lambda r: (-r[0], r[1]))
    flagged = [r for r in rows if r[0] > ALPHA_FLAG]
    with open(out_md, "w") as f:
        f.write("# Scaling-exponent audit (t ~ c*n^alpha)\n\n")
        f.write(f"Fixtures: {', '.join(f'{s[0]} (n={s[1]:,})' for s in series)}\n\n")
        f.write(f"{len(rows)} fittable entries; flag threshold "
                f"max(alpha_fit, alpha_top_segment) > {ALPHA_FLAG}; "
                f"{len(flagged)} flagged.\n\n")
        f.write("| alpha_fit | alpha_top | entry | t per fixture (s) |\n"
                "|---|---|---|---|\n")
        for mx, name, a, a_top, pts in rows[:40]:
            ts = " / ".join(f"{t:.2f}" for _, t in pts)
            mark = " **FLAG**" if mx > ALPHA_FLAG else ""
            at = f"{a_top:.2f}" if a_top is not None else "-"
            f.write(f"| {a:.2f} | {at}{mark} | {name} | {ts} |\n")
    print(f"wrote {out_md}: {len(rows)} fitted, {len(flagged)} flagged "
          f"(max(alpha) > {ALPHA_FLAG})")
    for mx, name, a, a_top, _ in flagged:
        at = f"{a_top:.2f}" if a_top is not None else "-"
        print(f"  FLAG {name}: alpha_fit={a:.2f} alpha_top={at}")


if __name__ == "__main__":
    main()
