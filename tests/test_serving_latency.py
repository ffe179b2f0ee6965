"""Regression bound on the serving-latency artifact (round-9 verdict
task 4): the four endpoints' cached-index (hot-serving) p95 must stay
within generous per-endpoint bounds. The bounds are ~4x the quiet-host
measurements — loose enough for a noisy hypervisor window, tight enough
that the real failure mode (a per-request corpus re-tokenize or index
rebuild, which multiplies latency ~10x) cannot pass. The per-request
plan discipline itself is enforced structurally in
tests/test_serving.py::test_serving_index_probe_plans."""

from __future__ import annotations

import json
import os

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(HERE, "BENCH_serving_r10.json")

# ~4x the quiet-host cached p95s (BENCH_serving_r10.json: health 82,
# movie 63, recommend 210, search 2620 — search is the fuzzy
# multi_match expansion, inherently several jobs per request). The
# re-tokenize failure mode multiplies all of these ~10x.
P95_BOUNDS_MS = {
    "health": 500.0,
    "movie": 500.0,
    "search": 8000.0,
    "recommend": 2000.0,
}


def test_serving_latency_bounds():
    if not os.path.exists(ARTIFACT):
        pytest.skip("no committed serving-latency artifact")
    art = json.load(open(ARTIFACT))
    eps = art["endpoints"]
    assert set(P95_BOUNDS_MS) <= set(eps), "artifact missing endpoints"
    for name, bound in P95_BOUNDS_MS.items():
        p95 = eps[name]["p95_ms"]
        assert p95 <= bound, (
            f"{name} cached-index p95 {p95} ms exceeds {bound} ms — "
            f"per-request work regressed (re-tokenize/rebuild crept in?)"
        )
        assert eps[name]["n"] >= 20, f"{name}: too few requests for a p95"
