"""Plan-shape regression budget: every catalog query's physical plan is
pinned in PLAN_BUDGET.json (exchange count, nested-loop/cartesian
presence, sort count). A query whose fresh plan GAINS an exchange, a
BroadcastNestedLoopJoin, or a CartesianProduct relative to its budget
fails here — the plan-discipline analog of a golden test, catching
silent shuffle regressions from conf drift, Spark upgrades, or operator
edits long before they show up as bench time.

The existing BroadcastNestedLoopJoin entries are the documented
1-row-broadcast stats crossJoins (VERDICT r04 anti-pattern sweep) — the
budget pins them; it does not bless new ones. Improvements (fewer
exchanges) pass; regenerate the budget deliberately with
scripts/plan_snapshot.py after an intentional plan change.
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entrymod

BUDGET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_BUDGET.json"
)


def _shape(df) -> dict:
    p = df._jdf.queryExecution().executedPlan().toString()
    # Shuffle and broadcast exchanges are budgeted separately: "Exchange"
    # alone matches both ("BroadcastExchange" contains the substring), so
    # a broadcast-join → shuffle-join swap would keep a combined count
    # equal and slip through, while a benign new broadcast would be
    # misreported as a shuffle regression.
    broadcasts = p.count("BroadcastExchange")
    return {
        "shuffle_exchanges": p.count("Exchange") - broadcasts,
        "broadcast_exchanges": broadcasts,
        "bnlj": "BroadcastNestedLoopJoin" in p,
        "cartesian": "CartesianProduct" in p,
        "sorts": p.count("Sort "),
    }


def test_no_plan_gains_shuffles_or_nested_loops(spark):
    budget = json.load(open(BUDGET_PATH))
    queries = entrymod.queries()
    missing = sorted(set(queries) - set(budget))
    assert not missing, (
        f"queries missing from PLAN_BUDGET.json: {missing} — run "
        "scripts/plan_snapshot.py to extend the budget"
    )
    sf_dir = "/root/testdata/sf0.001"
    problems = []
    for name in sorted(queries):
        b = budget[name]
        if "error" in b:
            continue
        try:
            s = _shape(queries[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: plan build failed: {e}")
            continue
        if s["shuffle_exchanges"] > b["shuffle_exchanges"]:
            problems.append(
                f"{name}: shuffle exchanges {b['shuffle_exchanges']} -> "
                f"{s['shuffle_exchanges']} (shuffle regression)"
            )
        if s["bnlj"] and not b["bnlj"]:
            problems.append(f"{name}: plan gained a BroadcastNestedLoopJoin")
        if s["cartesian"] and not b["cartesian"]:
            problems.append(f"{name}: plan gained a CartesianProduct")
    assert not problems, "\n".join(problems)


def test_budget_has_no_error_entries():
    budget = json.load(open(BUDGET_PATH))
    errs = {k: v for k, v in budget.items() if "error" in v}
    assert not errs, f"PLAN_BUDGET.json contains error entries: {errs}"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
