#!/usr/bin/env python
"""Snapshot the physical-plan shape of every catalog query into
PLAN_BUDGET.json: per query, the number of Exchange operators, whether a
BroadcastNestedLoopJoin / CartesianProduct appears, and the number of
global Sort operators. tests/test_plan_budget.py compares fresh plans
against this file and fails when a plan silently GAINS a shuffle or a
nested-loop join — the plan-discipline analog of a golden test, catching
regressions from conf drift, Spark upgrades, or operator edits.

Plans are built (not executed) at sf0.001 — explain-only, seconds for
the whole catalog. Regenerate deliberately after an intentional plan
change: python scripts/plan_snapshot.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_BUDGET.json")
SF_DIR = "/root/testdata/sf0.001"


def plan_shape(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    # "Exchange" alone matches BOTH ShuffleExchange ("Exchange
    # hashpartitioning(...)") and BroadcastExchange — a broadcast-join →
    # shuffle-join swap would keep the combined count equal and slip the
    # budget. Count them separately: only shuffle growth is a regression;
    # broadcast exchanges are tracked for visibility.
    broadcasts = p.count("BroadcastExchange")
    return {
        "shuffle_exchanges": p.count("Exchange") - broadcasts,
        "broadcast_exchanges": broadcasts,
        "bnlj": "BroadcastNestedLoopJoin" in p,
        "cartesian": "CartesianProduct" in p,
        "sorts": p.count("Sort "),
    }


def main() -> None:
    spark = get_spark("plan-snapshot")
    queries = entrymod.queries()
    shapes: dict[str, dict] = {}
    for name in sorted(queries):
        try:
            shapes[name] = plan_shape(queries[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            shapes[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, shapes[name], flush=True)
    with open(OUT, "w") as fh:
        json.dump(shapes, fh, indent=1, sort_keys=True)
    print(f"wrote {OUT} ({len(shapes)} queries)")


if __name__ == "__main__":
    main()
