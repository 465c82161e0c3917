#!/usr/bin/env python3
"""Per-decade scaling ratios from two BENCH_LOCAL*.json pass records.

Usage: scale_ratios.py BENCH_LOCAL.json BENCH_LOCAL_sf1.json [threshold]

Each file is one JSON line {"metric":"passes","queries":{name:[t1,t2,t3]}}.
Prints queries whose min-of-passes ratio exceeds `threshold` (default 3.0),
sorted by ratio desc, plus suite totals — the per-decade superlinearity
report BENCHNOTES tables are built from.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.readline())
    return {k: min(v) for k, v in d["queries"].items()}, d.get("total")


def main():
    a, ta = load(sys.argv[1])
    b, tb = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    common = sorted(set(a) & set(b))
    rows = [(b[q] / a[q] if a[q] > 0 else float("inf"), q, a[q], b[q]) for q in common]
    rows.sort(reverse=True)
    suite_a = sum(a[q] for q in common)
    suite_b = sum(b[q] for q in common)
    print(f"common queries: {len(common)}; suite min-sum {suite_a:.1f} -> "
          f"{suite_b:.1f} s = {suite_b / suite_a:.2f}x")
    only_a = set(a) - set(b)
    only_b = set(b) - set(a)
    if only_a:
        print(f"only in {sys.argv[1]}: {sorted(only_a)}")
    if only_b:
        print(f"only in {sys.argv[2]}: {sorted(only_b)}")
    print(f"\nqueries with ratio > {thr}x:")
    for r, q, x, y in rows:
        if r > thr:
            print(f"  {q}: {x:.2f} -> {y:.2f} s  ({r:.1f}x)")
    print("\ntop-10 slowest at target:")
    for q in sorted(common, key=lambda q: -b[q])[:10]:
        print(f"  {q}: {b[q]:.2f} s (from {a[q]:.2f}, "
              f"{b[q] / a[q] if a[q] else 0:.1f}x)")


if __name__ == "__main__":
    main()
