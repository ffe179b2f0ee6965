"""Scale-ratio regression budget: each catalog query's sf0.1 -> sf1
steady-time ratio is pinned in SCALE_BUDGET.json (from the round-5
full-catalog sweep). When a CURRENT round's sweep artifacts exist
(BENCH_full_local.json + the newest BENCH_sf1_full_r*.jsonl, produced
by scripts/round_artifacts.sh), any query whose fresh ratio exceeds its
pinned ratio by more than 1.5x fails here — turning the scale audit
from a report into a gate (round-5 VERDICT task 7). New queries absent
from the budget are reported, not failed; refresh deliberately with:
  python -c "see scripts/round_artifacts.sh" then regenerate via
  scripts/update_scale_budget.py
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = os.path.join(ROOT, "SCALE_BUDGET.json")
SLACK = 1.5
# Below this sf0.1 time, ratios are timer noise (session floors), not
# plan shape — a 0.05 s query doubling to 0.1 s is not a regression.
MIN_BASE_SEC = 0.3


def _latest_sweep() -> str | None:
    paths = glob.glob(os.path.join(ROOT, "BENCH_sf1_full_r*.jsonl"))
    if not paths:
        return None
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def test_no_query_scales_worse_than_budget():
    sweep = _latest_sweep()
    if sweep is None:
        pytest.skip("no BENCH_sf1_full_r*.jsonl sweep artifact present")
    base = json.load(open(os.path.join(ROOT, "BENCH_full_local.json")))["queries"]
    budget = json.load(open(BUDGET))
    fresh: dict[str, float] = {}
    with open(sweep) as fh:
        for line in fh:
            if line.strip():
                rec = json.loads(line)
                if "warm" in rec:
                    fresh[rec["query"]] = rec["warm"]
    problems, unpinned = [], []
    for name, s in sorted(fresh.items()):
        b = base.get(name)
        if not b or b < MIN_BASE_SEC:
            continue
        ratio = s / b
        pinned = budget.get(name)
        if pinned is None:
            unpinned.append(f"{name} ({ratio:.1f}x)")
            continue
        if ratio > pinned * SLACK:
            problems.append(
                f"{name}: sf1 ratio {ratio:.1f}x > budget {pinned:.1f}x * {SLACK}"
            )
    assert not problems, "\n".join(problems)
    if unpinned:
        print(f"unpinned (new) queries: {', '.join(unpinned)}")


def test_budget_covers_known_watch_items():
    budget = json.load(open(BUDGET))
    for name in (
        "q33_dedup_jaccard_verify",
        "q81_split_contamination",
        "q99_dedup_incremental",
        "q106_unigram_lm_quality",
    ):
        assert name in budget and budget[name] is not None
