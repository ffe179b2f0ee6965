"""Differential tests: every oracle-bearing catalog query vs DuckDB at
sf0.001 (fast loop; the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tests.parity import compare, duck_connection

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    odf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_rows_only_queries_run(spark, sf_dir):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name


# ---------------------------------------------------------------------------
# Driver-sample insurance: the driver's CORRECTNESS_r*.json gate has
# sampled the same ~50-query subset every round, so the other half of the
# catalog is never driver-verified at sf0.01. This marker runs exactly
# that set difference at the driver's scale — the un-sampled half cannot
# silently rot. Runs in the default suite (that IS the insurance);
# scope to just these with `python -m pytest -m insurance -q`.
# ---------------------------------------------------------------------------

import glob  # noqa: E402
import json  # noqa: E402
import os  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DRIVER = "/root/testdata/sf0.01"


def _driver_sampled() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        try:
            seen |= set(json.load(open(path)))
        except (OSError, ValueError):
            continue
    return seen


UNSAMPLED = sorted(set(ORACLES) - _driver_sampled())


@pytest.fixture(scope="module")
def duck_driver_scale():
    con = duck_connection(SF_DRIVER)
    yield con
    con.close()


@pytest.mark.insurance
@pytest.mark.skipif(not os.path.exists(SF_DRIVER), reason="sf0.01 testdata absent")
@pytest.mark.parametrize("name", UNSAMPLED or ["<all-sampled>"])
def test_driver_unsampled_query_matches_oracle_at_sf001(
    name, spark, duck_driver_scale
):
    if name == "<all-sampled>":
        pytest.skip("driver has sampled every oracle-bearing query")
    sdf = QUERIES[name](spark, SF_DRIVER)
    odf = duck_driver_scale.execute(ORACLES[name]).df()
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)
