"""Core relational query catalog (SURVEY.md §2.1–§2.7).

Each query exercises one or more inventory operators on the driver's
TPC-H-ish testdata and carries a DuckDB oracle. Reference citations are in
the operator library (``operators/relational.py``); here we cite the
inventory IDs (S*/P*/F*/J*/A*/U*/N*/Q*).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relational as R
from ..sources.readers import load_table
from .catalog import register

# Exact-sum trick: float64 → DECIMAL(18,4) makes sums order-independent and
# engine-identical; final cast-to-double + round(2) is then deterministic.
DEC = "decimal(18,4)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(DEC)


def _money(col: F.Column, alias: str, nd: int = 2) -> F.Column:
    return F.round(col.cast("double"), nd).alias(alias)


def _revenue() -> F.Column:
    return F.sum(_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount")))


REVENUE_SQL = "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"


# ---------------------------------------------------------------------------
# q01 — pricing summary (F2 filter + A2 grouped agg, TPC-H Q1 shape)
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST({REVENUE_SQL} AS DOUBLE), 2) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02 00:00:00").cast(li.schema["l_shipdate"].dataType)
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_quantity")), "sum_qty"),
            _money(F.sum(_dec("l_extendedprice")), "sum_base_price"),
            _money(_revenue(), "sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — top customers by revenue (J1 joins + A2 agg + Q7 global top-k).
# Flagship query: the reference's core shape (join → aggregate → top-k,
# preprocessing.py:22 + model.py:13) on the testdata star schema.
# ---------------------------------------------------------------------------
@register(
    "q02_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           ROUND(CAST({REVENUE_SQL} AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q02_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # Pre-aggregate lineitem per order BEFORE the orders join: map-side
    # partial agg collapses the ~4 items/order ahead of both shuffles
    # (join input and the custkey re-agg), cutting shuffle volume ~4x at
    # any scale. Decimal partial sums re-sum exactly, so the result is
    # bit-identical to the direct join+agg plan.
    per_order = li.groupBy("l_orderkey").agg(
        _revenue().alias("__rev"), F.count(F.lit(1)).alias("__n")
    )
    per_cust = (
        per_order.join(
            orders.select("o_orderkey", "o_custkey"), per_order.l_orderkey == orders.o_orderkey
        )
        .groupBy("o_custkey")
        .agg(_money(F.sum("__rev"), "revenue"), F.sum("__n").alias("n_items"))
    )
    joined = R.join_broadcast_dim(
        per_cust, customer.select("c_custkey", "c_name"), on=[per_cust.o_custkey == customer.c_custkey]
    ).select("c_custkey", "c_name", "revenue", "n_items")
    return R.topk_global(joined, [F.desc("revenue"), F.asc("c_custkey")], 10)


# ---------------------------------------------------------------------------
# q03 — shipping priority (selective J1 + F2 on both sides + top-k)
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(CAST({REVENUE_SQL} AS DOUBLE), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1998-03-15 00:00:00").cast(orders.schema["o_orderdate"].dataType)
    orders = orders.filter(F.col("o_orderdate") < cut)
    li = li.filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast(li.schema["l_shipdate"].dataType))
    joined = R.join_broadcast_dim(
        li, R.semi_join(orders, cust, on=[orders.o_custkey == cust.c_custkey]).select(
            "o_orderkey", "o_orderdate", "o_orderpriority"
        ),
        on=[li.l_orderkey == F.col("o_orderkey")],
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(_money(_revenue(), "revenue"))
    return R.topk_global(
        agg.select(
            "l_orderkey", "revenue", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"), "o_orderpriority"
        ),
        [F.desc("revenue"), F.asc("l_orderkey")],
        10,
    )


# ---------------------------------------------------------------------------
# q05 — revenue by nation within a region (J1 chain over 5 tables;
# dims broadcast so the fact side never shuffles for the joins)
# ---------------------------------------------------------------------------
@register(
    "q05_region_nation_revenue",
    oracle=f"""
    SELECT n.n_name, ROUND(CAST({REVENUE_SQL} AS DOUBLE), 2) AS revenue
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q05_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = R.join_broadcast_dim(
        cust,
        R.join_broadcast_dim(nation, region, on=[nation.n_regionkey == region.r_regionkey]).select(
            "n_nationkey", "n_name"
        ),
        on=[cust.c_nationkey == F.col("n_nationkey")],
    ).select("c_custkey", "n_name")
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey)
    joined = R.join_broadcast_dim(fact, dims, on=[F.col("o_custkey") == dims.c_custkey])
    return joined.groupBy("n_name").agg(_money(_revenue(), "revenue"))


# ---------------------------------------------------------------------------
# q06 — projection / cast / literal / derived columns (P1–P6)
# ---------------------------------------------------------------------------
@register(
    "q06_project_cast",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(p_size AS BIGINT) AS size_big,
           p_retailprice AS retail,
           'catalog' AS tag,
           p_size * 2 AS size_doubled
    FROM part
    WHERE p_size >= 10
    """,
)
def q06_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size") >= 10)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.col("p_size").cast("bigint").alias("size_big"),
            F.col("p_retailprice").alias("retail"),
            F.lit("catalog").alias("tag"),
            (F.col("p_size") * 2).alias("size_doubled"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — null-drop + predicate filter (F1 + F2)
# ---------------------------------------------------------------------------
@register(
    "q07_null_drop_filter",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
    FROM events
    WHERE event_id IS NOT NULL AND ts IS NOT NULL AND user_id IS NOT NULL
      AND event_type IS NOT NULL AND value IS NOT NULL AND props IS NOT NULL
      AND value > 5.0
    GROUP BY event_type
    """,
)
def q07_null_drop_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = R.null_drop(load_table(spark, sf_dir, "events")).filter(F.col("value") > 5.0)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        _money(F.sum(_dec("value")), "sum_value"),
    )


# ---------------------------------------------------------------------------
# q08 — single-pass unpivot/melt (U1; replaces the reference's 18×
# filter+union anti-pattern, elasticsearch_ingest.py:48-61)
# ---------------------------------------------------------------------------
@register(
    "q08_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, CAST(p_retailprice AS DOUBLE) AS val FROM part
    """,
)
def q08_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return R.unpivot(part, ["p_partkey"], ["p_size", "p_retailprice"], "attr", "val")


# ---------------------------------------------------------------------------
# q09/q10 — semi / anti joins (free on Spark; SURVEY §2.4 note)
# ---------------------------------------------------------------------------
@register(
    "q09_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def q09_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return R.semi_join(cust, big, on=[cust.c_custkey == big.o_custkey]).select("c_custkey", "c_name")


@register(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return R.anti_join(cust, orders, on=[cust.c_custkey == orders.o_custkey]).select(
        "c_custkey", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# q11 — grouped list-agg with deterministic ordering (A1/N5; reference
# collect_list at elasticsearch_ingest.py:65-67, array_sort per §7.3)
# ---------------------------------------------------------------------------
@register(
    "q11_collect_list",
    oracle="""
    SELECT c_nationkey, STRING_AGG(c_name, '|' ORDER BY c_name) AS names, COUNT(*) AS n
    FROM customer WHERE c_custkey <= 200
    GROUP BY c_nationkey
    """,
)
def q11_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    agg = R.collect_list_sorted(cust, "c_nationkey", "c_name", "names_arr")
    cnt = cust.groupBy("c_nationkey").count()
    return (
        agg.join(cnt, "c_nationkey")
        .select("c_nationkey", F.concat_ws("|", "names_arr").alias("names"), F.col("count").alias("n"))
    )


# ---------------------------------------------------------------------------
# q12 — histogram-of-histogram (A2; reference num_genres histogram,
# elasticsearch_ingest.py:81)
# ---------------------------------------------------------------------------
@register(
    "q12_histogram",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    GROUP BY n_orders
    """,
)
def q12_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# q13 — explode + group + ranked top-k (N2 + A3; the ES `terms`
# aggregation shape, elasticsearch_ingest.py:158-163)
# ---------------------------------------------------------------------------
@register(
    "q13_explode_terms",
    oracle="""
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT UNNEST(STRING_SPLIT(p_name, ' ')) AS tok FROM part WHERE p_partkey >= 1)
    GROUP BY tok
    ORDER BY cnt DESC, tok ASC
    LIMIT 20
    """,
)
def q13_explode_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") >= 1)
    toks = part.select(F.explode(F.split("p_name", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return R.topk_global(counts, [F.desc("cnt"), F.asc("tok")], 20)


# ---------------------------------------------------------------------------
# q14 — per-group top-k via window (Q7 generalized; model.py:13 shape)
# ---------------------------------------------------------------------------
@register(
    "q14_window_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q14_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    top = R.topk_per_group(
        orders, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3, rank_col="rn"
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("bigint").alias("rn"))


# ---------------------------------------------------------------------------
# q15 — offset pagination with clamps (Q8; api.py:197-221)
# ---------------------------------------------------------------------------
@register(
    "q15_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
)
def q15_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return R.paginate(orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], page=3, size=20)


# ---------------------------------------------------------------------------
# q16 — rollup (extended surface, SURVEY §2.5 note)
# ---------------------------------------------------------------------------
@register(
    "q16_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q16_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = R.join_broadcast_dim(
        R.join_broadcast_dim(cust, nation, on=[cust.c_nationkey == nation.n_nationkey]),
        region,
        on=[nation.n_regionkey == region.r_regionkey],
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
        )
    )


# ---------------------------------------------------------------------------
# q17 — distinct (dedup-lite relational form)
# ---------------------------------------------------------------------------
@register(
    "q17_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q17_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
