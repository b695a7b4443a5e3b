#!/usr/bin/env python3
"""Closing-bench narrative generator + gate (r14 verdict directive #2).

Round 14 shipped three quality gates but no final-tree bench statement,
and a 31% total regression went unrecorded in PERF.md. This script makes
the closing narrative mechanical:

  # print the section to paste into PERF.md
  closing_bench.py NEW_DETAIL.json PREV_DETAIL.json

  # gate: verify PERF.md actually cites the fresh total and names
  # every >1.5x mover (exit 1 otherwise) — wired into preflight --closing
  closing_bench.py NEW_DETAIL.json PREV_DETAIL.json --check PERF.md

A "mover" is any entry whose median changed by more than MOVER_RATIO in
either direction AND whose larger time clears T_FLOOR (sub-0.25 s entries
swing on scheduler noise; naming them would bury the signal). The total
is the sum of successful (>= 0) medians. The check accepts the total
cited anywhere in PERF.md to 0.1 s, formatted like "283.4 s".

NOT part of the engine — dev tooling only, like check.py.
"""
import json
import sys

MOVER_RATIO = 1.5
T_FLOOR = 0.25


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main():
    argv = list(sys.argv[1:])
    check_md = None
    if "--check" in argv:
        i = argv.index("--check")
        check_md = argv[i + 1]
        del argv[i:i + 2]
    new, prev = load(argv[0]), load(argv[1])
    total_new = sum(new.values())
    total_prev = sum(prev.values())
    movers = []
    for name, t in new.items():
        t0 = prev.get(name)
        if t0 is None or max(t, t0) < T_FLOOR or min(t, t0) <= 0:
            continue
        r = t / t0
        if r > MOVER_RATIO or r < 1.0 / MOVER_RATIO:
            movers.append((r, name, t0, t))
    movers.sort(key=lambda m: -abs(__import__("math").log(m[0])))
    added = sorted(set(new) - set(prev))
    removed = sorted(set(prev) - set(new))

    if check_md is None:
        print(f"## Closing bench\n\nclosing bench total: {total_new:.1f} s "
              f"over {len(new)} entries (prev {total_prev:.1f} s, "
              f"{total_new / total_prev:.2f}x)" if total_prev else
              f"closing bench total: {total_new:.1f} s ({len(new)} entries)")
        if movers:
            print(f"\n{len(movers)} movers beyond {MOVER_RATIO}x "
                  f"(>= {T_FLOOR} s):\n")
            print("| entry | prev s | now s | ratio | cause |")
            print("|---|---|---|---|---|")
            for r, name, t0, t in movers:
                print(f"| {name} | {t0:.2f} | {t:.2f} | {r:.2f}x | TODO |")
        else:
            print(f"\nNo movers beyond {MOVER_RATIO}x at >= {T_FLOOR} s.")
        if added:
            print(f"\nNew entries: {', '.join(added)}")
        if removed:
            print(f"\nRemoved entries: {', '.join(removed)}")
        return 0

    md = open(check_md).read()
    missing = []
    if f"{total_new:.1f} s" not in md:
        missing.append(f"fresh closing total '{total_new:.1f} s'")
    for r, name, t0, t in movers:
        if name not in md:
            missing.append(f"mover '{name}' ({r:.2f}x)")
    if missing:
        print(f"closing-bench gate FAILED: {check_md} does not cite:")
        for m in missing:
            print(f"  - {m}")
        print("run closing_bench.py without --check to print the section, "
              "attribute each mover, and paste it into PERF.md")
        return 1
    print(f"closing-bench gate OK: total {total_new:.1f} s and "
          f"{len(movers)} mover(s) all cited in {check_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
