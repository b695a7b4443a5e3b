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
  scaling_audit.py [--strict] out.md detail1.json=sfdir1 ... \
      [--skew detailS.json=sfdirS ...]

Positional pairs form the UNIFORM fit ladder. `--skew` pairs are NOT
fitted (a skewed fixture at ~the same n as a uniform one would corrupt
the log-log slope); instead each skew point is compared against the
nearest-n uniform point: when the row counts differ enough (>=1.5x)
the implied segment exponent is computed and flagged on the same
ALPHA_FLAG threshold, otherwise the plain time ratio is flagged above
SKEW_RATIO_FLAG — a skew-robust plan (salting, hot-bucket caps, AQE)
should not blow up on the same row count just because keys are Zipfian.

Exit code: 0 normally; with --strict, 1 when any entry is flagged
(matching gen_registry_index.py --check so preflight can gate on it).
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
SKEW_RATIO_FLAG = 3.0  # same-n skew fixture slowdown beyond this flags


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


def load_pairs(pairs):
    series = []  # (sfdir, n_rows, {query: t})
    for pair in pairs:
        detail, sfdir = pair.split("=", 1)
        with open(detail) as f:
            d = json.load(f)
        series.append((sfdir, census(sfdir), d["queries"]))
    return series


def main():
    argv = list(sys.argv[1:])
    strict = "--strict" in argv
    if strict:
        argv.remove("--strict")
    skew_pairs = []
    while "--skew" in argv:
        i = argv.index("--skew")
        skew_pairs.append(argv[i + 1])
        del argv[i:i + 2]
    out_md, pairs = argv[0], argv[1:]
    series = load_pairs(pairs)
    series.sort(key=lambda s: s[1])
    skew_series = load_pairs(skew_pairs)
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

    # Skew screen: each skew fixture's per-entry time vs the nearest-n
    # UNIFORM point. Far apart in n (>=1.5x) -> implied segment exponent
    # on ALPHA_FLAG; same n -> plain slowdown ratio on SKEW_RATIO_FLAG.
    skew_rows = []  # (flag, name, sfdir, t_skew, t_near, metric_str)
    for sfdir, n_s, qs in skew_series:
        near = min(series, key=lambda s: abs(math.log(s[1] / n_s)))
        n_u, qu = near[1], near[2]
        for name, t_s in qs.items():
            t_u = qu.get(name)
            if t_u is None or t_s < T_FIT_MIN or t_u < T_FIT_MIN \
                    or max(t_s, t_u) < T_FLOOR:
                continue
            if max(n_s, n_u) / min(n_s, n_u) >= 1.5:
                a = math.log(t_s / t_u) / math.log(n_s / n_u)
                skew_rows.append((a > ALPHA_FLAG, name, sfdir, t_s, t_u,
                                  f"alpha_seg={a:.2f}"))
            else:
                r = t_s / t_u
                skew_rows.append((r > SKEW_RATIO_FLAG, name, sfdir, t_s,
                                  t_u, f"ratio={r:.2f}"))
    skew_flagged = [r for r in skew_rows if r[0]]
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
        if skew_rows:
            f.write(f"\n## Skew fixtures (not fitted; vs nearest-n "
                    f"uniform point)\n\n{len(skew_rows)} compared; "
                    f"{len(skew_flagged)} flagged (alpha_seg > "
                    f"{ALPHA_FLAG} or same-n ratio > {SKEW_RATIO_FLAG})."
                    f"\n\n| entry | skew fixture | t_skew | t_uniform |"
                    " metric |\n|---|---|---|---|---|\n")
            worst = sorted(skew_rows,
                           key=lambda r: (not r[0], -(r[3] / r[4])))
            for fl, name, sfdir, t_s, t_u, m in worst[:40]:
                mark = " **FLAG**" if fl else ""
                f.write(f"| {name} | {sfdir} | {t_s:.2f} | {t_u:.2f} "
                        f"| {m}{mark} |\n")
    print(f"wrote {out_md}: {len(rows)} fitted, {len(flagged)} flagged "
          f"(max(alpha) > {ALPHA_FLAG}); {len(skew_rows)} skew points, "
          f"{len(skew_flagged)} flagged")
    for mx, name, a, a_top, _ in flagged:
        at = f"{a_top:.2f}" if a_top is not None else "-"
        print(f"  FLAG {name}: alpha_fit={a:.2f} alpha_top={at}")
    for _, name, sfdir, t_s, t_u, m in skew_flagged:
        print(f"  FLAG(skew) {name} @ {sfdir}: {m} "
              f"(t={t_s:.2f}s vs {t_u:.2f}s uniform)")
    return 1 if strict and (flagged or skew_flagged) else 0


if __name__ == "__main__":
    sys.exit(main())
