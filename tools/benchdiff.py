#!/usr/bin/env python3
"""Driver-vs-local bench forensics (VERDICT r14 next #7).

Usage: python3 tools/benchdiff.py <base_bench_full.json> <other_bench_full.json>
       [ratio_flag=1.5] [floor_sec=0.3]

Compares the per-key `queries` maps of two Bench dumps and flags every key
whose time moved more than `ratio_flag`x in either direction, ignoring keys
under `floor_sec` on BOTH sides (sub-300 ms numbers are scheduler noise at
local[32]). Exit code 0 always — this is an adjudication aid, not a gate:
a flagged key means "A/B this locally before blaming the plan", because the
r13→r14 history shows driver-host contention producing 2x deltas on keys
whose code did not change (VERDICT r14: scan_project at 2.62 s for a
column-pruned TopN).

Protocol (DECISIONS.md): when a round's driver BENCH flags a key vs the
prior round, run Bench locally twice, diff both local runs against the
driver file with this tool, and record the verdict — [plan] if the local
runs reproduce the delta, [host] if they don't.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d.get("queries", {}), d.get("value"), d.get("n_queries")


def main():
    base_p, other_p = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    base, bt, bn = load(base_p)
    other, ot, on = load(other_p)
    print(f"base : {base_p}  total={bt}s n={bn}")
    print(f"other: {other_p}  total={ot}s n={on}")
    only_b = sorted(set(base) - set(other))
    only_o = sorted(set(other) - set(base))
    if only_b:
        print(f"only in base ({len(only_b)}): {', '.join(only_b[:10])}")
    if only_o:
        print(f"only in other ({len(only_o)}): {', '.join(only_o[:10])}")
    flagged = []
    for k in sorted(set(base) & set(other)):
        a, b = base[k], other[k]
        if a < floor and b < floor:
            continue
        r = b / a if a > 0 else float("inf")
        if r > ratio or r < 1 / ratio:
            flagged.append((k, a, b, r))
    flagged.sort(key=lambda t: max(t[3], 1 / t[3]), reverse=True)
    if not flagged:
        print(f"no key moved >{ratio}x (floor {floor}s) — within host noise")
    else:
        print(f"{len(flagged)} keys moved >{ratio}x (floor {floor}s):")
        print(f"{'key':38} {'base':>8} {'other':>8} {'ratio':>7}")
        for k, a, b, r in flagged:
            print(f"{k:38} {a:8.3f} {b:8.3f} {r:7.2f}x")


if __name__ == "__main__":
    main()
