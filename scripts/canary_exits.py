#!/usr/bin/env python3
"""DuckDB exit-conversion drift canary — dev tooling, NOT part of the engine.

The oracle contract encodes ENGINE-SPECIFIC conversion behavior: the r12
audit measured that DuckDB v1.0.0's direct DECIMAL(38,6)->DOUBLE cast
double-rounds ~25% of values whose scaled magnitude sits in 2^53..2^60,
while CAST(CAST(x AS VARCHAR) AS DOUBLE) is correctly rounded every time
(a string->double parse is a single correctly-rounded conversion). Eight
oracles exit via VARCHAR and several more via cents-BIGINT because of
exactly this behavior.

If a future DuckDB upgrade FIXES the decimal->double double-rounding (or
breaks the VARCHAR path), hash flips in the sweep would look like engine
bugs. This canary re-runs the r12 isolation experiment deterministically
so an oracle-engine upgrade is detected as a canary diff, not a mystery:

  - 20,000 seeded u-unit integers in [2^53, 2^60) as DECIMAL(38,6)
  - reference = the correctly rounded double of u/10^6
    (Python float(Fraction(...)) is correctly rounded by definition)
  - PINNED: direct-cast mismatch count for this seed under v1.0.0
  - HARD INVARIANT: via-VARCHAR mismatches == 0 (the hardened exits
    depend on it at any DuckDB version)

Exit 0 = behavior matches the pin. Exit 1 = drift (message says which
conversion moved, so BASELINE.md and the pinned count can be re-baselined
deliberately).

Usage: python3 scripts/canary_exits.py
"""
import sys
import random
from fractions import Fraction

import duckdb

PINNED_VERSION = "v1.0.0"
# Direct decimal->double mismatches for SEED/N/range under v1.0.0,
# measured once and pinned (the ~25% double-rounding rate).
PINNED_DIRECT_MISMATCHES = 4993  # calibrated under v1.0.0 (25.0%)
SEED = 20260816
N = 20_000
LO, HI = 2 ** 53, 2 ** 60


def main():
    rng = random.Random(SEED)
    us = [rng.randrange(LO, HI) for _ in range(N)]
    con = duckdb.connect()
    version = con.execute("select version()").fetchone()[0]

    con.execute("create table t(u BIGINT, d DECIMAL(38,6))")
    con.executemany(
        "insert into t values (?, CAST(? AS DECIMAL(38,6)))",
        [(u, f"{u // 10**6}.{u % 10**6:06d}") for u in us])
    rows = con.execute(
        "select u, CAST(d AS DOUBLE), CAST(CAST(d AS VARCHAR) AS DOUBLE) "
        "from t order by rowid").fetchall()

    direct_bad = via_bad = 0
    for u, direct, via in rows:
        ref = float(Fraction(u, 10 ** 6))  # correctly rounded
        if direct != ref:
            direct_bad += 1
        if via != ref:
            via_bad += 1

    print(f"duckdb={version} (pinned {PINNED_VERSION})")
    print(f"direct decimal->double mismatches: {direct_bad}/{N} "
          f"(pinned {PINNED_DIRECT_MISMATCHES})")
    print(f"via-VARCHAR mismatches:            {via_bad}/{N} (invariant 0)")

    drift = []
    if via_bad != 0:
        drift.append(
            f"via-VARCHAR exit no longer correctly rounded ({via_bad} "
            f"mismatches) — the eight hardened VARCHAR exits are UNSAFE")
    if PINNED_DIRECT_MISMATCHES is not None \
            and direct_bad != PINNED_DIRECT_MISMATCHES:
        drift.append(
            f"direct decimal->double behavior moved "
            f"({direct_bad} vs pinned {PINNED_DIRECT_MISMATCHES}) — an "
            f"oracle-engine upgrade changed conversion; re-baseline "
            f"deliberately (BASELINE.md pin + this script)")
    if version != PINNED_VERSION:
        drift.append(
            f"DuckDB version {version} != pinned {PINNED_VERSION} — "
            f"re-run sweeps before trusting hashes")

    if drift:
        for d in drift:
            print(f"DRIFT: {d}", file=sys.stderr)
        return 1
    print("OK: oracle-engine conversion behavior matches the r12 pin")
    return 0


if __name__ == "__main__":
    sys.exit(main())
