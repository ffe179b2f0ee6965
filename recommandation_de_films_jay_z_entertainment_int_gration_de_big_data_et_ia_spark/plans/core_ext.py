"""Extended relational surface (SURVEY.md §2.5/§2.6 notes): cube,
intersect/except, pivot, date parts, selective scan aggregation, approx
distinct — operators the reference lacks but a complete engine exposes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relational as R
from ..sources.readers import load_table
from .catalog import register
from .core import _dec, _money


# ---------------------------------------------------------------------------
# q18 — cube over two dims
# ---------------------------------------------------------------------------
@register(
    "q18_cube",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE(r_name, c_mktsegment)
    """,
)
def q18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = R.join_broadcast_dim(
        R.join_broadcast_dim(cust, nation, on=[cust.c_nationkey == nation.n_nationkey]),
        region,
        on=[nation.n_regionkey == region.r_regionkey],
    )
    return (
        joined.cube("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "n",
            "sum_bal",
        )
    )


# ---------------------------------------------------------------------------
# q19 — intersect + except chain
# ---------------------------------------------------------------------------
@register(
    "q19_intersect_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def q19_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    big = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return building.intersect(big).subtract(urgent)


# ---------------------------------------------------------------------------
# q52 — selective scan aggregation (TPC-H Q6 shape: every predicate must
# reach the parquet scan as a pushed filter)
# ---------------------------------------------------------------------------
@register(
    "q52_forecast_revenue",
    oracle=f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 2) AS promo_revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q52_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.schema["l_shipdate"].dataType
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast(t))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast(t))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money(F.sum(_dec("l_extendedprice") * _dec("l_discount")), "promo_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# q53 — date part extraction + grouped revenue by month
# ---------------------------------------------------------------------------
@register(
    "q53_date_parts",
    oracle=f"""
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS yr,
           CAST(date_part('month', o_orderdate) AS INT) AS mo,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY yr, mo
    """,
)
def q53_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.sum(_dec("o_totalprice")), "total"),
        )
    )


# ---------------------------------------------------------------------------
# q54 — pivot (wide conditional aggregation)
# ---------------------------------------------------------------------------
@register(
    "q54_pivot",
    oracle=f"""
    SELECT o_orderpriority,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 2) AS F,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 2) AS O,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 2) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q54_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum(_dec("o_totalprice")).cast("double"), 2))
    )


# Bounded oracle: HyperLogLog sketches are engine-specific (Spark HLL++
# vs DuckDB's), so the approximate count itself can't hash-match — but
# its ERROR BOUND can: both sides emit the exact stats plus a boolean
# that the HLL++ estimate lies within 3×rsd (= 6%) of the exact distinct
# count; the oracle asserts the inequality as literal TRUE. HLL++ is
# deterministic for fixed data, so the hash is stable; the raw estimate
# stays observable via operators (and the property test pins the same
# bound).
@register(
    "q55_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q55_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_distinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
    )
    rel_err = F.abs(F.col("__approx") - F.col("exact_parts")) / F.col("exact_parts")
    return agg.select(
        "l_returnflag", "n", "exact_parts", (rel_err <= 0.06).alias("approx_within_3rsd")
    )

# ---------------------------------------------------------------------------
# q76 — array-function breadth: array_remove and when/otherwise are the
# two functions the reference imports but never calls
# (elasticsearch_ingest.py:2, SURVEY §2.7 N6) — the engine ships them,
# plus position/desc-sort/zip.
# ---------------------------------------------------------------------------
@register(
    "q76_array_functions",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks, p_size FROM part WHERE p_partkey <= 300)
    SELECT p_partkey,
           array_to_string(list_filter(toks, x -> x != 'small'), ',') AS no_small,
           CAST(COALESCE(list_position(toks, 'widget'), 0) AS BIGINT) AS widget_pos,
           array_to_string(list_sort(toks, 'DESC'), ',') AS toks_desc,
           CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' ELSE 'small' END AS size_class
    FROM t
    """,
)
def q76_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    toks = F.split("p_name", " ")
    return part.select(
        "p_partkey",
        F.concat_ws(",", F.array_remove(toks, "small")).alias("no_small"),
        F.array_position(toks, "widget").alias("widget_pos"),
        F.concat_ws(",", F.sort_array(toks, asc=False)).alias("toks_desc"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


# ---------------------------------------------------------------------------
# q77 — explicit GROUPING SETS (beyond rollup/cube): per-region totals,
# per-segment totals, and the grand total in one pass.
# ---------------------------------------------------------------------------
_Q77_SQL = """
SELECT COALESCE(r_name, '(all)') AS region, COALESCE(c_mktsegment, '(all)') AS segment,
       COUNT(*) AS n,
       CASE WHEN r_name IS NOT NULL THEN 'by_region'
            WHEN c_mktsegment IS NOT NULL THEN 'by_segment'
            ELSE 'total' END AS level
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
"""


@register("q77_grouping_sets", oracle=_Q77_SQL)
def q77_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q77_SQL)
