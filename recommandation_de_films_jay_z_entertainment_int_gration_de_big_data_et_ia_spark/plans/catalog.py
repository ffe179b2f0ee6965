"""Query catalog registry.

Every engine capability (SURVEY.md §2 inventory + LLM-pipeline extensions)
is registered here as a named query: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) a DuckDB oracle SQL string that the
driver runs side-by-side at sf0.01 for the correctness gate.

Determinism contract for oracle-checked queries:
- every computed column is aliased identically in Spark and SQL;
- float aggregates go through exact DECIMAL sums, then a deterministic
  cast-to-double + round, so both engines produce bit-identical doubles;
- arrays are surfaced as sorted, delimiter-joined strings;
- timestamps are surfaced as epoch microseconds (BIGINT) or DATE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query name: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import all plan modules so their queries register."""
    from . import (  # noqa: F401
        analytics_ext,
        analytics_ext2,
        analytics_ext3,
        analytics_ext4,
        analytics_ext5,
        analytics_ext6,
        analytics_ext7,
        analytics_ext8,
        analytics_ext9,
        core,
        core_ext,
        corpus,
        dedup,
        ml,
        multimodal,
        relational_ext2,
        resolution,
        search,
        similarity,
        spatial,
        tables,
        textstats,
        timeseries,
    )
