"""Scale-ratio regression budget: each catalog query's sf0.1 -> sf1
steady-time ratio is pinned in SCALE_BUDGET.json (from the round-5
full-catalog sweep, refreshed per round). When a CURRENT round's sweep
artifact exists (the newest BENCH_sf1_full_r*.jsonl, produced by
scripts/round_artifacts.sh), any query whose fresh ratio exceeds its
pinned ratio by more than 1.5x fails here — turning the scale audit
from a report into a gate (round-5 VERDICT task 7).

Base-time source (round-8 hardening): the ratio denominator is the
SAME-SESSION ``base`` field the sweep records per query (sf0.1, timed in
the same JVM/load-window as the sf1 run). Only for pre-r9 sweep lines
that lack ``base`` does the gate fall back to the mutable
BENCH_full_local.json — the round-8 false-fail mode, where the driver's
post-round bench overwrite of that file flipped 8 phantom "regressions"
(e.g. q27's base dropping 1.47->0.55 s between sessions inflated its
ratio 3.7x -> "9.8x").

Output-growth contract: SCALE_BUDGET.json carries an ``__rows_sf1__``
section pinning the expected sf1 RESULT row count for the pair-family
queries (LSH/SimHash dedup) whose super-linear time is true output
growth on the replicated corpus. The gate checks measured rows against
the pin, separating "output grew as pinned" (fine) from "plan
regressed" (fail) without manual adjudication.

New queries absent from the budget are reported, not failed; refresh
deliberately via scripts/update_scale_budget.py after an intentional
scale-profile change.
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
ROWS_SLACK = 0.15  # pinned sf1 row counts may drift ±15% (testdata regen)
# Below this sf0.1 time, ratios are timer noise (session floors), not
# plan shape — a 0.05 s query doubling to 0.1 s is not a regression.
MIN_BASE_SEC = 0.3


def _latest_sweep() -> str | None:
    paths = glob.glob(os.path.join(ROOT, "BENCH_sf1_full_r*.jsonl"))
    if not paths:
        return None
    return max(paths, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))


def _load_sweep(path: str) -> dict[str, dict]:
    recs: dict[str, dict] = {}
    with open(path) as fh:
        for line in fh:
            if line.strip():
                rec = json.loads(line)
                if "warm" in rec:
                    recs[rec["query"]] = rec
    return recs


def _fresh_ratios(
    sweep_recs: dict[str, dict], fallback_base: dict[str, float]
) -> dict[str, tuple[float, str]]:
    """(ratio, base_source) per query. Same-session ``base`` wins; the
    mutable cross-session artifact is only a legacy fallback."""
    out: dict[str, tuple[float, str]] = {}
    for name, rec in sweep_recs.items():
        if "base" in rec:
            b, src = rec["base"], "same-session"
        else:
            b, src = fallback_base.get(name), "artifact"
        if b and b >= MIN_BASE_SEC:
            out[name] = (rec["warm"] / b, src)
    return out


def test_no_query_scales_worse_than_budget():
    sweep = _latest_sweep()
    if sweep is None:
        pytest.skip("no BENCH_sf1_full_r*.jsonl sweep artifact present")
    try:
        fallback = json.load(open(os.path.join(ROOT, "BENCH_full_local.json")))[
            "queries"
        ]
    except FileNotFoundError:
        fallback = {}
    budget = json.load(open(BUDGET))
    recs = _load_sweep(sweep)
    if not any("base" in r for r in recs.values()):
        # A wholly pre-r9 sweep can only be ratioed against the MUTABLE
        # cross-session artifact — the exact false-fail mode this gate
        # was hardened against (r8: the driver's post-round bench
        # overwrite flipped 8 phantom regressions). Skip rather than
        # grade against an unstable denominator; the next sweep
        # (scripts/sf1_audit.py) records same-session bases and re-arms.
        pytest.skip(
            f"{os.path.basename(sweep)} is a legacy sweep without "
            "same-session base times; gate re-arms on the next sweep"
        )
    ratios = _fresh_ratios(recs, fallback)
    problems, unpinned = [], []
    for name, (ratio, src) in sorted(ratios.items()):
        pinned = budget.get(name)
        if pinned is None:
            unpinned.append(f"{name} ({ratio:.1f}x)")
            continue
        if not isinstance(pinned, (int, float)):
            continue  # metadata sections like __rows_sf1__
        if ratio > pinned * SLACK:
            problems.append(
                f"{name}: sf1 ratio {ratio:.1f}x ({src} base) "
                f"> budget {pinned:.1f}x * {SLACK}"
            )
    assert not problems, "\n".join(problems)
    if unpinned:
        print(f"unpinned (new) queries: {', '.join(unpinned)}")


def test_output_growth_matches_pinned_rows():
    """Pair-family queries: sf1 result rows must match the pinned
    contract — growth beyond the pin means the plan (or the dedup
    semantics) changed, not just the corpus."""
    sweep = _latest_sweep()
    if sweep is None:
        pytest.skip("no sweep artifact present")
    budget = json.load(open(BUDGET))
    pins = budget.get("__rows_sf1__") or {}
    if not pins:
        pytest.skip("no __rows_sf1__ pins in SCALE_BUDGET.json")
    recs = _load_sweep(sweep)
    problems = []
    for name, expected in sorted(pins.items()):
        rec = recs.get(name)
        if rec is None or "rows" not in rec:
            continue  # older sweep without the watch row — report-only
        got = rec["rows"]
        if abs(got - expected) > expected * ROWS_SLACK:
            problems.append(
                f"{name}: sf1 rows {got:,} vs pinned {expected:,} "
                f"(±{ROWS_SLACK:.0%})"
            )
    assert not problems, "\n".join(problems)


def test_gate_prefers_same_session_base(tmp_path):
    """Regression for the round-8 false fail: when a sweep record
    carries its own ``base``, the gate must use it — a later overwrite
    of BENCH_full_local.json cannot change the ratio."""
    recs = {
        "qX": {"query": "qX", "cold": 5.0, "warm": 4.0, "base": 2.0},
        "qY": {"query": "qY", "cold": 5.0, "warm": 4.0},  # pre-r9 line
    }
    skewed_artifact = {"qX": 0.4, "qY": 1.0}  # qX base skewed 5x low
    ratios = _fresh_ratios(recs, skewed_artifact)
    assert ratios["qX"] == (2.0, "same-session")
    assert ratios["qY"] == (4.0, "artifact")


def test_budget_covers_known_watch_items():
    budget = json.load(open(BUDGET))
    for name in (
        "q33_dedup_jaccard_verify",
        "q81_split_contamination",
        "q99_dedup_incremental",
        "q106_unigram_lm_quality",
    ):
        assert name in budget and budget[name] is not None


def test_sf10_output_growth_matches_pinned_rows():
    """Second-decade contracts (round-10): the sf10 top-20 audit's pair-
    family row counts must match their ``__rows_sf10__`` pins — same
    rationale as the sf1 contract, one decade further into the
    replication stress (100 copies, so un-capped pair plans would grow
    ~100x in candidates; the pins certify the caps held)."""
    # union of the per-round sf10 sweeps, newest round winning — r11
    # extended the rows watchlist to the cluster-loop family, so its
    # sweep carries pins the r10 file records as rows=None
    sweeps = sorted(
        glob.glob(os.path.join(ROOT, "BENCH_sf10*_r*.jsonl")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    sweeps = [p for p in sweeps if "singlefile" not in p]
    if not sweeps:
        pytest.skip("no sf10 audit artifact present")
    budget = json.load(open(BUDGET))
    pins = budget.get("__rows_sf10__") or {}
    if not pins:
        pytest.skip("no __rows_sf10__ pins in SCALE_BUDGET.json")
    recs: dict[str, dict] = {}
    for p in sweeps:
        for name, rec in _load_sweep(p).items():
            if "rows" in rec or name not in recs:
                recs[name] = rec
    problems = []
    for name, expected in sorted(pins.items()):
        rec = recs.get(name)
        if rec is None or "rows" not in rec:
            continue
        got = rec["rows"]
        if abs(got - expected) > expected * ROWS_SLACK:
            problems.append(
                f"{name}: sf10 rows {got:,} vs pinned {expected:,} "
                f"(±{ROWS_SLACK:.0%})"
            )
    assert not problems, "\n".join(problems)
