"""Docs-vs-code consistency: the README's catalog counts went stale two
rounds in a row when hand-edited; this pins them to the live catalog so
adding a query without refreshing the doc fails CI."""

from __future__ import annotations

import os
import re

import __spark_entry__ as entrymod

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_counts_match_live_catalog():
    text = open(README).read()
    m = re.search(r"\((\d+) queries, (\d+) oracle-matched", text)
    assert m, "README no longer states the catalog counts — update this test's regex"
    n_queries, n_oracles = int(m.group(1)), int(m.group(2))
    assert n_queries == len(entrymod.queries()), (
        f"README says {n_queries} queries, catalog has {len(entrymod.queries())} — "
        "refresh README.md"
    )
    assert n_oracles == len(entrymod.oracle_sql()), (
        f"README says {n_oracles} oracle-matched, catalog has "
        f"{len(entrymod.oracle_sql())} — refresh README.md"
    )


def test_readme_has_no_other_stale_count_literals():
    """The test-count literal was the other recurring staleness vector;
    keep the run-instructions block free of hardcoded totals."""
    text = open(README).read()
    block = text[text.index("python -m pytest"):][:200]
    assert not re.search(r"\d+ tests", block), (
        "README hardcodes a pytest count again — keep it descriptive instead"
    )
