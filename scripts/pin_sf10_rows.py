#!/usr/bin/env python
"""Fold a round's sf10 audit rows into SCALE_BUDGET.json's
``__rows_sf10__`` contracts (round-10 verdict task 5: extend the output
pins to the cluster-loop family). Existing pins are kept unless the new
sweep re-measured the query; ratio pins are untouched (those belong to
the sf1 sweep via update_scale_budget.py).

Usage: python scripts/pin_sf10_rows.py BENCH_sf10_r11.jsonl
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sweep = sys.argv[1]
    path = os.path.join(HERE, "SCALE_BUDGET.json")
    budget = json.load(open(path))
    pins = budget.setdefault("__rows_sf10__", {})
    added = 0
    with open(sweep) as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = json.loads(line)
            if "rows" in rec and rec.get("rows") is not None:
                pins[rec["query"]] = rec["rows"]
                added += 1
    json.dump(budget, open(path, "w"), indent=1, sort_keys=True)
    print(f"wrote {path}: {added} sf10 row pins updated ({len(pins)} total)")


if __name__ == "__main__":
    main()
