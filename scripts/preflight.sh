#!/usr/bin/env bash
# End-of-round snapshot gate.
#
# Round 4 ended with an uncompilable tree (a paren error landed right at
# snapshot time), so the round's bench never ran (BENCH_r04 rc=1) even
# though the fix was one character. A snapshot of a broken build is worse
# than no snapshot: every downstream artifact of the round (bench,
# correctness, judge verdict) silently degrades to "could not run".
#
# Run this before ANY end-of-round commit; it exits nonzero unless both
# main and test sources compile. Deliberately does NOT run the full test
# suite or verify sweep — those are quality gates with their own cadence;
# this is the cheap never-snapshot-a-broken-tree floor (~30 s warm).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile < /dev/null
echo "preflight OK: main + test sources compile"
