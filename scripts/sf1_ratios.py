#!/usr/bin/env python
"""Compare per-query steady-state times between two bench JSON files
(default: a fresh sf0.1 run vs the sf1 rehearsal) and print a markdown
table of scaling ratios, flagging anything super-linear (> the
flag threshold; data is 10x, so linear ≈ 10, with fixed-overhead
queries far below).

Usage: python scripts/sf1_ratios.py BENCH_sf01.json BENCH_sf1_raw.json [flag_ratio]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_path, sf1_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    base = json.load(open(base_path))["queries"]
    sf1 = json.load(open(sf1_path))["queries"]
    rows = []
    for name in sorted(set(base) & set(sf1)):
        b, s = base[name], sf1[name]
        rows.append((name, b, s, s / b if b > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name, b, s, r in rows:
        mark = " **⚠**" if r > flag else ""
        print(f"| {name} | {b:.2f} | {s:.2f} | {r:.1f}x{mark} |")
    tot_b = sum(r[1] for r in rows)
    tot_s = sum(r[2] for r in rows)
    print(f"| **total** | {tot_b:.1f} | {tot_s:.1f} | {tot_s / tot_b:.1f}x |")
    flagged = [r for r in rows if r[3] > flag]
    print(f"\n{len(flagged)} queries above {flag}x (linear = 10x for 10x data)")


if __name__ == "__main__":
    main()
