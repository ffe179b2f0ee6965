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


# ---------------------------------------------------------------------------
# q150 — rolling 7-day distinct users (WAU per day). Spark has no
# COUNT(DISTINCT) OVER a range frame, so the engine uses the bounded-
# explode rewrite: dedupe to (user, day), fan each row out to the ≤7
# target days it contributes to, then an exact per-day distinct count.
# Explode factor = window length (a plan constant), so this is linear —
# the shape that replaces the unsupported windowed distinct at 100 TB.
# Day is epoch-day arithmetic (timezone-free), output clipped to days
# that actually have events (INNER join to the observed-day set).
# ---------------------------------------------------------------------------
@register(
    "q150_rolling_wau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    fan AS (
      SELECT d.day AS target_day, ud.user_id
      FROM ud JOIN days d ON d.day BETWEEN ud.day AND ud.day + 6)
    SELECT target_day AS epoch_day, COUNT(DISTINCT user_id) AS wau
    FROM fan GROUP BY target_day
    """,
)
def q150_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint")
    ud = ev.select("user_id", day.alias("day")).distinct()
    fanned = ud.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("target_day")
    )
    days = ud.select("day").distinct().withColumnRenamed("day", "target_day")
    return (
        fanned.join(F.broadcast(days), "target_day")
        .groupBy(F.col("target_day").alias("epoch_day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


# ---------------------------------------------------------------------------
# q151 — analytic-window suite: the full ranking/navigation family in one
# plan (rank, dense_rank, percent_rank, cume_dist, ntile, lag, lead,
# nth_value) over per-segment customer balances — the SQL surface a
# warehouse migration checks first. One shuffle on the partition key;
# values rounded to 6 dp so the rational percent_rank/cume_dist compare
# bit-identically.
# ---------------------------------------------------------------------------
_Q151_SQL = """
SELECT c_mktsegment, c_custkey,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       LAG(c_custkey, 1, -1) OVER w AS prev_ck,
       LEAD(c_custkey, 1, -1) OVER w AS next_ck,
       NTH_VALUE(c_custkey, 3) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_ck
FROM customer
WHERE c_acctbal > 9000
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


@register("q151_window_suite", oracle=_Q151_SQL)
def q151_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_Q151_SQL)


# ---------------------------------------------------------------------------
# q152 — multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL keep
# per-row multiplicities (q19 covers the DISTINCT variants). Engine side
# uses DataFrame intersectAll/exceptAll; surfaced as value + an exact
# output-multiplicity count so the hash compare proves the bag
# semantics, not just membership.
# ---------------------------------------------------------------------------
@register(
    "q152_multiset_ops",
    oracle="""
    WITH ia AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
    ea AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n FROM ia GROUP BY o_custkey
    UNION ALL
    SELECT 'except_all', o_custkey, COUNT(*) FROM ea GROUP BY o_custkey
    """,
)
def q152_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    big = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    ia = (
        f.intersectAll(big)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "n")
    )
    ea = (
        f.exceptAll(big)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "n")
    )
    return ia.unionAll(ea)


# ---------------------------------------------------------------------------
# q160 — approx percentile with a bounded oracle (q55's discipline for
# the quantile family): Spark's approx_percentile is a deterministic
# t-digest-style sketch whose estimate can't hash-match DuckDB's exact
# quantile, but its RANK ERROR can be gated. Both engines emit exact
# grouped stats plus a boolean that the approximate p50/p95 each fall
# within the exact p45–p55 / p90–p99 bands (±0.05 rank, 5000× the
# documented accuracy=10000 bound — generous, so the gate is stable,
# not lucky). At 100 TB this is the mergeable one-pass quantile path;
# the exact interpolated percentile (q60) is the two-pass audit.
# ---------------------------------------------------------------------------
@register(
    "q160_approx_percentile_bounded",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
           ROUND(quantile_cont(value, 0.95), 6) AS exact_p95,
           TRUE AS p50_in_band, TRUE AS p95_in_band
    FROM events GROUP BY event_type
    """,
)
def q160_approx_percentile_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile(value, 0.5)").alias("__e50"),
        F.expr("percentile(value, 0.95)").alias("__e95"),
        F.expr("percentile(value, 0.45)").alias("__lo50"),
        F.expr("percentile(value, 0.55)").alias("__hi50"),
        F.expr("percentile(value, 0.90)").alias("__lo95"),
        F.expr("percentile(value, 0.99)").alias("__hi95"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("__a50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("__a95"),
    )
    return agg.select(
        "event_type",
        "n",
        F.round("__e50", 6).alias("exact_p50"),
        F.round("__e95", 6).alias("exact_p95"),
        ((F.col("__a50") >= F.col("__lo50")) & (F.col("__a50") <= F.col("__hi50"))).alias(
            "p50_in_band"
        ),
        ((F.col("__a95") >= F.col("__lo95")) & (F.col("__a95") <= F.col("__hi95"))).alias(
            "p95_in_band"
        ),
    )


# ---------------------------------------------------------------------------
# q162 — contribution / share-of-total analytics (ratio_to_report): each
# nation's revenue as a share of its region's total and of the grand
# total, plus its rank within the region. Exact decimal revenue sums;
# the shares are single-rounded integer-decimal ratios so both engines
# emit identical doubles. Shape: one fact aggregation (shuffle on
# nation), then window sums over the TINY nation-level rollup — the
# share windows never touch fact rows.
# ---------------------------------------------------------------------------
@register(
    "q162_revenue_contribution",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY region, nation)
    SELECT region, nation,
           ROUND(CAST(rev AS DOUBLE), 2) AS rev,
           ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE), 6) AS region_share,
           ROUND(CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE), 6) AS total_share,
           CAST(RANK() OVER (PARTITION BY region ORDER BY rev DESC, nation) AS BIGINT) AS rank_in_region
    FROM rev
    """,
)
def q162_revenue_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias("rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy("region").orderBy(F.col("rev").desc(), F.col("nation"))
    return rev.select(
        "region",
        "nation",
        F.round(F.col("rev").cast("double"), 2).alias("rev"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_region).cast("double"), 6
        ).alias("region_share"),
        F.round(
            F.col("rev").cast("double") / F.sum("rev").over(w_all).cast("double"), 6
        ).alias("total_share"),
        F.rank().over(w_rank).cast("bigint").alias("rank_in_region"),
    )


# ---------------------------------------------------------------------------
# q163 — stickiness (DAU/WAU): the product-analytics companion of q150 —
# per day, distinct daily actives over distinct trailing-7-day actives,
# via the same bounded-explode rewrite (no windowed COUNT DISTINCT in
# any engine). Ratio rounded from exact integer counts.
# ---------------------------------------------------------------------------
@register(
    "q163_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    fan AS (
      SELECT d.day AS target_day, ud.user_id
      FROM ud JOIN days d ON d.day BETWEEN ud.day AND ud.day + 6),
    wau AS (SELECT target_day AS day, COUNT(DISTINCT user_id) AS wau FROM fan GROUP BY target_day)
    SELECT dau.day AS epoch_day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def q163_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint")
    ud = ev.select("user_id", day.alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = ud.select("day").distinct().withColumnRenamed("day", "target_day")
    wau = (
        ud.select(
            "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("target_day")
        )
        .join(F.broadcast(days), "target_day")
        .groupBy(F.col("target_day").alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        F.col("day").alias("epoch_day"),
        "dau",
        "wau",
        F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# q164 — week-over-week growth: weekly exact-decimal revenue with lag
# deltas and percent change (the reporting rollup every finance
# dashboard runs). Week = epoch-day // 7 (timezone-free, no calendar
# ambiguity); pct change NULL for the first week, rounded from a single
# double division.
# ---------------------------------------------------------------------------
@register(
    "q164_wow_growth",
    oracle="""
    WITH w AS (
      SELECT (epoch_us(o_orderdate) // 86400000000) // 7 AS week,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY week)
    SELECT week, ROUND(CAST(rev AS DOUBLE), 2) AS rev,
           ROUND(CAST(rev - LAG(rev) OVER (ORDER BY week) AS DOUBLE), 2) AS delta,
           ROUND(CAST(rev - LAG(rev) OVER (ORDER BY week) AS DOUBLE)
                 / CAST(LAG(rev) OVER (ORDER BY week) AS DOUBLE), 6) AS pct_change
    FROM w
    """,
)
def q164_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    # o_orderdate arrives as TIMESTAMP_NTZ (parquet without UTC
    # adjustment); pure NTZ arithmetic == DuckDB's epoch_us of a naive
    # timestamp, with no session-timezone coercion (readers.py lesson).
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', o_orderdate)"
    )
    week = (micros / F.lit(86400000000)).cast("bigint") / 7
    w = (
        orders.groupBy(week.cast("bigint").alias("week"))
        .agg(F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias("rev"))
    )
    lag = F.lag("rev").over(Window.orderBy("week"))
    return w.select(
        "week",
        F.round(F.col("rev").cast("double"), 2).alias("rev"),
        F.round((F.col("rev") - lag).cast("double"), 2).alias("delta"),
        F.round((F.col("rev") - lag).cast("double") / lag.cast("double"), 6).alias(
            "pct_change"
        ),
    )


# ---------------------------------------------------------------------------
# q167 — quantile-rank normalization (per-group rank transform to [0,1]):
# the distribution-free feature scaling that survives outliers where
# min-max (q74's Arrow path) does not. percent_rank per event_type over
# (value, event_id) — the id tiebreak makes ranks of duplicate values
# deterministic in both engines. One shuffle on the group key.
# ---------------------------------------------------------------------------
@register(
    "q167_quantile_normalize",
    oracle="""
    SELECT event_id, event_type,
           ROUND(value, 6) AS value,
           ROUND(PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value, event_id), 6) AS qnorm
    FROM events WHERE event_id % 17 = 0
    """,
)
def q167_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    w = Window.partitionBy("event_type").orderBy(F.col("value"), F.col("event_id"))
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round(F.percent_rank().over(w), 6).alias("qnorm"),
    )


# ---------------------------------------------------------------------------
# q168 — out-of-order (late-data) audit: the observability metric every
# event-time streaming pipeline tracks to SIZE ITS WATERMARK — per
# event_type, how many events arrive behind the per-user running
# maximum event time (ordered by event_id as arrival order), the p95 of
# that lateness, and the max. Lateness in whole seconds from
# full-precision microsecond running maxima; exact interpolated p95.
# ---------------------------------------------------------------------------
@register(
    "q168_lateness_audit",
    oracle="""
    WITH o AS (
      SELECT event_type, epoch_us(ts) AS t,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM events),
    lat AS (
      SELECT event_type,
             CASE WHEN prev_max IS NOT NULL AND prev_max > t
                  THEN (prev_max - t) // 1000000 ELSE 0 END AS late_s,
             CASE WHEN prev_max IS NOT NULL AND prev_max > t THEN 1 ELSE 0 END AS is_late
      FROM o)
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(is_late) AS BIGINT) AS n_late,
           ROUND(CAST(SUM(is_late) AS DOUBLE) / COUNT(*), 6) AS late_share,
           ROUND(quantile_cont(late_s, 0.95), 6) AS p95_late_s,
           CAST(MAX(late_s) AS BIGINT) AS max_late_s
    FROM lat GROUP BY event_type
    """,
)
def q168_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.unix_micros("ts")
    o = ev.select("event_type", t.alias("t"), F.max(t).over(w).alias("prev_max"))
    is_late = F.col("prev_max").isNotNull() & (F.col("prev_max") > F.col("t"))
    lat = o.select(
        "event_type",
        F.when(is_late, ((F.col("prev_max") - F.col("t")) / 1000000).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("late_s"),
        F.when(is_late, 1).otherwise(0).alias("is_late"),
    )
    return lat.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_late").cast("bigint").alias("n_late"),
        F.round(F.sum("is_late").cast("double") / F.count(F.lit(1)), 6).alias("late_share"),
        F.round(F.expr("percentile(late_s, 0.95)"), 6).alias("p95_late_s"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )
