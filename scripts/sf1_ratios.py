#!/usr/bin/env python
"""Render the round's SCALE markdown from the sf1 audit: per-query
sf0.1 (steady, from BENCH_full_local.json) vs sf1 (warm, from the
sf1_audit JSONL) with scaling ratios, flagging anything super-linear
(data is 10x, so linear ≈ 10x with fixed-overhead queries far below).
Output-growth watchlist queries carry their sf1 result row count so
"output growth, not plan" claims have numbers attached.

Usage: python scripts/sf1_ratios.py BENCH_sf1_full_rN.jsonl SCALE_rN.md [flag_ratio]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf1_path, out_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    try:
        fallback = json.load(open(os.path.join(HERE, "BENCH_full_local.json")))[
            "queries"
        ]
    except FileNotFoundError:
        fallback = {}
    try:
        rows_pins = json.load(open(os.path.join(HERE, "SCALE_BUDGET.json"))).get(
            "__rows_sf1__", {}
        )
    except FileNotFoundError:
        rows_pins = {}
    sf1: dict[str, dict] = {}
    with open(sf1_path) as fh:
        for line in fh:
            if line.strip():
                rec = json.loads(line)
                sf1[rec["query"]] = rec
    rows, errors = [], []
    for name in sorted(sf1):
        rec = sf1[name]
        if "error" in rec:
            errors.append((name, rec["error"]))
            continue
        b = rec.get("base") or fallback.get(name)
        if not b:
            continue
        s = rec["warm"]
        rows.append((name, b, s, s / b if b > 0 else float("inf"), rec.get("rows")))
    rows.sort(key=lambda r: -r[3])
    lines = [
        "# Scale audit: full catalog at sf0.1 vs sf1 (10x data)",
        "",
        f"sf0.1 base: SAME-SESSION `base` from the sweep record "
        f"(BENCH_full_local.json only for legacy lines); sf1: warm run of 2 "
        f"({os.path.basename(sf1_path)}). Linear = 10x; flag > {flag:g}x. "
        "`rows` = sf1 result rows for the output-growth watchlist "
        "(LSH pair families where the true result, not the plan, grows "
        "super-linearly on the replicated corpus). A flagged query whose "
        "rows match its `__rows_sf1__` pin in SCALE_BUDGET.json is marked "
        "`growth✓` — sanctioned output growth, no adjudication needed.",
        "",
        "| query | sf0.1 s | sf1 s | ratio | rows (sf1) |",
        "|---|---|---|---|---|",
    ]

    def _sanctioned(name: str, nrows) -> bool:
        pin = rows_pins.get(name)
        return (
            pin is not None
            and nrows is not None
            and abs(nrows - pin) <= pin * 0.15
        )

    for name, b, s, r, nrows in rows:
        mark = ""
        if r > flag:
            mark = " growth✓" if _sanctioned(name, nrows) else " **⚠**"
        rtxt = f"{nrows:,}" if nrows is not None else ""
        lines.append(f"| {name} | {b:.2f} | {s:.2f} | {r:.1f}x{mark} | {rtxt} |")
    tot_b = sum(r[1] for r in rows)
    tot_s = sum(r[2] for r in rows)
    lines.append(f"| **total** | {tot_b:.1f} | {tot_s:.1f} | {tot_s / tot_b:.1f}x | |")
    flagged = [
        r for r in rows if r[3] > flag and not _sanctioned(r[0], r[4])
    ]
    growth = [r for r in rows if r[3] > flag and _sanctioned(r[0], r[4])]
    lines.append("")
    lines.append(
        f"{len(flagged)} queries above {flag:g}x needing adjudication "
        f"({', '.join(r[0] for r in flagged) or 'none'}); "
        f"{len(growth)} sanctioned by row-count contract "
        f"({', '.join(r[0] for r in growth) or 'none'})."
    )
    if errors:
        lines.append("")
        lines.append("Errors: " + "; ".join(f"{n}: {e}" for n, e in errors))
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: total {tot_s / tot_b:.1f}x, {len(flagged)} flagged")


if __name__ == "__main__":
    main()
