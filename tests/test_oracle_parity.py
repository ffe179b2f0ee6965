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
