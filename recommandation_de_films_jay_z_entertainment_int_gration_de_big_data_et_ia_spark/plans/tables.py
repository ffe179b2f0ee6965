"""Table-maintenance operators: column profiling and CDC merge/upsert.

The reference maintains its movie corpus with overwrite-style Spark ETL
(`/root/reference/src/preprocessing.py:10-26`) and re-indexes the whole
set on every change; a large-scale deployment instead profiles tables to
catch drift and applies incremental change batches. Both operators here
are single-plan DataFrame compositions with exact DuckDB oracles.

Scale notes (100 TB):
- q112 profiles with ONE scan: a single wide aggregate row (null counts,
  exact distincts, min/max per column) unpivoted to a per-column report.
  Exact COUNT(DISTINCT) over several columns makes Catalyst plan an
  Expand (one duplicated stream per distinct column) — the right trade
  at audit cadence; at continuous-profiling cadence swap in
  approx_count_distinct (HLL, q55's pattern) and the Expand disappears.
- q113 is the MERGE core: changes ⟕⟖ base as ONE full outer join on the
  key — the same shape Delta/Iceberg MERGE lowers to after file pruning.
  The changes batch is typically ≪ base, so AQE broadcasts it; base is
  never shuffled in that regime. Deletes drop, updates coalesce, inserts
  pass through — all in one projection, no per-row logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# q112 — column profile of lineitem: per column null count, exact
# distinct count, min/max rendered as strings (numerics via
# DECIMAL(18,2) so both engines print identically; the timestamp column
# via DATE ISO form).
# ---------------------------------------------------------------------------
_PROFILE_NUM = ("l_quantity", "l_extendedprice")
_PROFILE_KEY = ("l_orderkey",)
_PROFILE_STR = ("l_returnflag", "l_linestatus")
_PROFILE_TS = ("l_shipdate",)


def _num_s(sql_min_max: str, col: str) -> str:
    return f"CAST(CAST(ROUND({sql_min_max}({col}), 2) AS DECIMAL(18,2)) AS VARCHAR)"


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_KEY:
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) - COUNT({c}) AS n_nulls,"
            f" COUNT(DISTINCT {c}) AS n_distinct,"
            f" CAST(MIN({c}) AS VARCHAR) AS min_s, CAST(MAX({c}) AS VARCHAR) AS max_s"
            " FROM lineitem"
        )
    for c in _PROFILE_NUM:
        parts.append(
            f"SELECT '{c}', COUNT(*) - COUNT({c}), COUNT(DISTINCT {c}),"
            f" {_num_s('MIN', c)}, {_num_s('MAX', c)} FROM lineitem"
        )
    for c in _PROFILE_STR:
        parts.append(
            f"SELECT '{c}', COUNT(*) - COUNT({c}), COUNT(DISTINCT {c}),"
            f" MIN({c}), MAX({c}) FROM lineitem"
        )
    for c in _PROFILE_TS:
        parts.append(
            f"SELECT '{c}', COUNT(*) - COUNT({c}), COUNT(DISTINCT CAST({c} AS DATE)),"
            f" CAST(MIN(CAST({c} AS DATE)) AS VARCHAR),"
            f" CAST(MAX(CAST({c} AS DATE)) AS VARCHAR) FROM lineitem"
        )
    sql = " UNION ALL ".join(parts)
    return f"SELECT column_name, CAST(n_nulls AS BIGINT) AS n_nulls, CAST(n_distinct AS BIGINT) AS n_distinct, min_s, max_s FROM ({sql})"


@register("q112_column_profile", oracle=_profile_oracle())
def q112_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def nulls(c: F.Column) -> F.Column:
        return F.count(F.lit(1)) - F.count(c)

    aggs: list[F.Column] = []
    for c in _PROFILE_KEY:
        aggs += [
            nulls(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    for c in _PROFILE_NUM:
        aggs += [
            nulls(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.round(F.min(c), 2).cast("decimal(18,2)").cast("string").alias(f"{c}__mn"),
            F.round(F.max(c), 2).cast("decimal(18,2)").cast("string").alias(f"{c}__mx"),
        ]
    for c in _PROFILE_STR:
        aggs += [
            nulls(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    for c in _PROFILE_TS:
        d = F.col(c).cast("date")
        aggs += [
            nulls(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(d).alias(f"{c}__nd"),
            F.min(d).cast("string").alias(f"{c}__mn"),
            F.max(d).cast("string").alias(f"{c}__mx"),
        ]
    wide = li.agg(*aggs)
    cols = _PROFILE_KEY + _PROFILE_NUM + _PROFILE_STR + _PROFILE_TS
    stack_args = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct, min_s, max_s)"
        )
    ).select(
        "column_name",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_s",
        "max_s",
    )


# ---------------------------------------------------------------------------
# q113 — CDC merge (MERGE INTO semantics) on orders. The change batch is
# derived deterministically from the base table so the oracle replays it:
#   - U: o_orderkey % 7 = 0      -> totalprice + 10.0, same status
#   - D: o_orderkey % 13 = 0 (and % 7 <> 0)            -> delete
#   - I: key = -o_orderkey for o_orderkey % 11 = 0     -> brand-new rows
# Result = base MERGE changes: deletes drop, updates win over base,
# inserts append. The update is float ADDITION (exact, bit-identical in
# both engines) — no cross-engine rounding to defend.
# ---------------------------------------------------------------------------
_MERGE_CHANGES_SQL = """
    SELECT o_orderkey AS k, 'U' AS op,
           o_totalprice + 10.0 AS ch_price, o_orderstatus AS ch_status
    FROM orders WHERE o_orderkey % 7 = 0
    UNION ALL
    SELECT o_orderkey, 'D', NULL, NULL
    FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 7 <> 0
    UNION ALL
    SELECT -o_orderkey, 'I', o_totalprice, 'N'
    FROM orders WHERE o_orderkey % 11 = 0
"""


@register(
    "q113_merge_upsert",
    oracle=f"""
    WITH ch AS ({_MERGE_CHANGES_SQL}),
    base AS (SELECT o_orderkey AS k, o_totalprice AS price,
                    o_orderstatus AS status FROM orders)
    SELECT COALESCE(ch.k, base.k) AS o_orderkey,
           COALESCE(ch.ch_price, base.price) AS o_totalprice,
           COALESCE(ch.ch_status, base.status) AS o_orderstatus,
           CASE WHEN ch.op = 'I' THEN 'inserted'
                WHEN ch.op = 'U' THEN 'updated'
                ELSE 'kept' END AS merge_action
    FROM base FULL OUTER JOIN ch ON base.k = ch.k
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """,
)
def q113_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("U").alias("op"),
        (F.col("o_totalprice") + F.lit(10.0)).alias("ch_price"),
        F.col("o_orderstatus").alias("ch_status"),
    )
    deletes = orders.filter(
        (F.col("o_orderkey") % 13 == 0) & (F.col("o_orderkey") % 7 != 0)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("ch_price"),
        F.lit(None).cast("string").alias("ch_status"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 11 == 0).select(
        (-F.col("o_orderkey")).alias("k"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("ch_price"),
        F.lit("N").alias("ch_status"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    merged = base.join(changes, "k", "full_outer")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.col("k").alias("o_orderkey"),
        F.coalesce("ch_price", "price").alias("o_totalprice"),
        F.coalesce("ch_status", "status").alias("o_orderstatus"),
        F.when(F.col("op") == "I", "inserted")
        .when(F.col("op") == "U", "updated")
        .otherwise("kept")
        .alias("merge_action"),
    )
