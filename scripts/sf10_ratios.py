#!/usr/bin/env python
"""Render SCALE_r10.md from the sf10 top-20 audit (round-9 verdict task
2: a second measured decade of scale evidence). Per query: same-session
sf1 base vs sf10 run, ratio (linear = 10x; flag > 15x — looser than the
sf1 sweep's 12x because sf10 runs are single-pass and the 100-replica
corpus maximizes dedup pair stress), plus the __rows_sf10__ output
contracts for the pair families where the TRUE RESULT grows with
replication.

Usage: python scripts/sf10_ratios.py BENCH_sf10_top20_r10.jsonl SCALE_r10.md
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG = 15.0


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    try:
        pins = json.load(open(os.path.join(HERE, "SCALE_BUDGET.json"))).get(
            "__rows_sf10__", {}
        )
    except FileNotFoundError:
        pins = {}
    recs = []
    errors = []
    with open(src) as fh:
        for line in fh:
            if not line.strip():
                continue
            r = json.loads(line)
            if "error" in r:
                errors.append((r["query"], r["error"]))
            else:
                recs.append(r)
    recs.sort(key=lambda r: -(r["warm"] / r["base"] if r["base"] else 0))
    lines = [
        "# Scale audit, second decade: top-20 absolute queries at sf1 vs sf10 (10x data)",
        "",
        "Protocol: single sf10 run per query (each >5 s — noise share small; "
        "JVM warm, data cold) vs SAME-SESSION sf1 base (min of 2). Dataset: "
        "`.tmp/sf10` = 100-way FK-consistent replication of sf0.1 "
        "(scripts/make_sf10.py) — the dedup/ANN corpus is maximally "
        "duplicated, the stress the mega-bucket caps exist for. Linear = "
        f"10x; flag > {FLAG:g}x. `rows` = sf10 output rows; a flagged pair-"
        "family query whose rows match its `__rows_sf10__` pin in "
        "SCALE_BUDGET.json is `growth✓` (sanctioned output growth). "
        "Contention caveat: entries marked `steal!` overlapped foreground "
        "work (steal_warm or steal_base > 3%) and were re-measured where "
        "flagged.",
        "",
        "| query | sf1 s | sf10 s | ratio | rows (sf10) | note |",
        "|---|---|---|---|---|---|",
    ]
    flags = []
    for r in recs:
        ratio = r["warm"] / r["base"] if r["base"] else float("inf")
        note = ""
        nrows = r.get("rows")
        if ratio > FLAG:
            pin = pins.get(r["query"])
            if pin is not None and nrows is not None and abs(nrows - pin) <= pin * 0.15:
                note = "FLAG growth✓"
            else:
                note = "**FLAG**"
                flags.append(r["query"])
        if max(r.get("steal_warm", 0), r.get("steal_base", 0)) > 3.0:
            note = (note + " steal!").strip()
        lines.append(
            f"| {r['query']} | {r['base']:.2f} | {r['warm']:.2f} | "
            f"{ratio:.1f}x | {f'{nrows:,}' if nrows is not None else ''} | {note} |"
        )
    if errors:
        lines += ["", "## Errors", ""]
        lines += [f"- {q}: {e}" for q, e in errors]
    lines += [
        "",
        f"Flagged (unsanctioned super-linear): "
        f"{', '.join(flags) if flags else 'none'}.",
        "",
    ]
    with open(dst, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {dst}: {len(recs)} rows, {len(flags)} flags, {len(errors)} errors")


if __name__ == "__main__":
    main()
