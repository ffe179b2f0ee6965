#!/usr/bin/env python
"""Regenerate SCALE_BUDGET.json (the sf0.1->sf1 ratio pins gated by
tests/test_scale_budget.py) from the current BENCH_full_local.json and
a sweep artifact. Run deliberately after an intentional scale-profile
change, like scripts/plan_snapshot.py for plan shapes.

Usage: python scripts/update_scale_budget.py BENCH_sf1_full_rN.jsonl
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sweep = sys.argv[1]
    try:
        fallback = json.load(open(os.path.join(HERE, "BENCH_full_local.json")))[
            "queries"
        ]
    except FileNotFoundError:
        fallback = {}
    budget: dict[str, float | None] = {}
    rows_pins: dict[str, int] = {}
    with open(sweep) as fh:
        for line in fh:
            if line.strip():
                rec = json.loads(line)
                if "warm" not in rec:
                    continue
                # same-session base beats the mutable cross-session
                # artifact (tests/test_scale_budget.py rationale)
                b = rec.get("base") or fallback.get(rec["query"])
                budget[rec["query"]] = round(rec["warm"] / b, 2) if b else None
                if "rows" in rec:
                    rows_pins[rec["query"]] = rec["rows"]
    if rows_pins:
        budget["__rows_sf1__"] = rows_pins  # type: ignore[assignment]
    out = os.path.join(HERE, "SCALE_BUDGET.json")
    json.dump(budget, open(out, "w"), indent=1, sort_keys=True)
    print(f"wrote {out} ({len(budget)} pins, {len(rows_pins)} row contracts)")


if __name__ == "__main__":
    main()
