"""The 2x-of-baseline bench gate, machine-speed-normalized (round-9
verdict task 1): the committed full-catalog bench artifact must carry a
normalized headline, and THAT number — not the raw wall-clock — is
compared against the gate. A noisy hypervisor window (CPU steal, clock
scaling) changes raw and cpu_ref together, so the normalized number
stays stable and a genuine code regression can no longer hide behind
"the machine was slow" (nor be faked by a fast window: the scaling is
symmetric)."""

from __future__ import annotations

import json
import os

import pytest

from bench import CPU_REF_BASELINE_1T

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(HERE, "BENCH_full_local.json")

# The operative baseline (BASELINE.md publishes no reference numbers):
# the r01 first-working-run steady headline at sf0.1.
R01_HEADLINE_SEC = 21.16
GATE_RATIO = 2.0


def _load():
    if not os.path.exists(ARTIFACT):
        pytest.skip("no committed full-catalog bench artifact")
    return json.load(open(ARTIFACT))


def test_artifact_carries_raw_and_normalized_headline():
    art = _load()
    if "value_normalized" not in art:
        pytest.skip("artifact predates the normalized gate (regenerate via bench.py)")
    assert art["value"] > 0
    assert art["value_normalized"] > 0
    assert art["cpu_ref_baseline_1t_sec"] == CPU_REF_BASELINE_1T
    # the normalization must be exactly raw * baseline/now (mean of the
    # recorded start/end brackets) — no hidden fudge factor
    now = (art["cpu_ref_1t_start_sec"] + art["cpu_ref_1t_sec"]) / 2.0
    assert art["value_normalized"] == pytest.approx(
        art["value"] * CPU_REF_BASELINE_1T / now, rel=1e-3
    )


def test_normalized_headline_within_gate():
    art = _load()
    if "value_normalized" not in art:
        pytest.skip("artifact predates the normalized gate (regenerate via bench.py)")
    assert art["value_normalized"] <= GATE_RATIO * R01_HEADLINE_SEC, (
        f"normalized headline {art['value_normalized']} s exceeds "
        f"{GATE_RATIO}x the r01 baseline {R01_HEADLINE_SEC} s — a real "
        f"regression (machine speed is already factored out; raw was "
        f"{art['value']} s at cpu_ref_1t {art['cpu_ref_1t_sec']} s vs "
        f"baseline {CPU_REF_BASELINE_1T} s)"
    )
