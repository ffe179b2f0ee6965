"""Round-4 (continued) analytics additions: blocked fuzzy matching,
customer-value segmentation, streak analysis, and further LLM-pipeline /
warehouse operators.

Same determinism contract as the rest of the catalog (see
``plans/catalog.py``): portable md5 hashing, exact-DECIMAL money sums,
floored-epoch day arithmetic (never session-timezone ``to_date``), every
computed column aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register

_FUZZY_MAX_DIST = 4


# ---------------------------------------------------------------------------
# q171 — blocked fuzzy join (entity-matching primitive the q140
# resolution pipeline assumes): candidate pairs of *distinct* part names
# whose edit distance is <= 4, generated ONLY within a blocking key (the
# head noun of the name), never all-pairs. At 100 TB the block key keeps
# the self-join linear in block sizes: Exchange on the noun, in-block
# pair comparison, and levenshtein runs JVM-side (built-in, codegen) —
# no UDF. Both engines compute exact Levenshtein, so `dist` matches
# bit-for-bit.
# ---------------------------------------------------------------------------
@register(
    "q171_fuzzy_blocked_join",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS block
      FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
    """,
)
def q171_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("block").alias("ba"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("block").alias("bb"))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= _FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist")
    )


# ---------------------------------------------------------------------------
# q172 — RFM segmentation (recency / frequency / monetary quintiles):
# per customer, days since last order (vs the global latest order day),
# order count, and exact-DECIMAL revenue; each scored into NTILE(5)
# with a fully deterministic tie-break (metric, then custkey). One
# groupBy shuffle + three windows over the same small per-customer
# frame; the 1-row global max is broadcast. Segment ids like '5-4-5'
# are the classic CRM export.
# NTILE ordering note: recency ASC (recent buyers score low r_days →
# bucket 1), frequency/monetary DESC (big spenders → bucket 1). The
# DECIMAL monetary value (not the rounded double) feeds the ordering so
# both engines rank identical values identically.
# ---------------------------------------------------------------------------
@register(
    "q172_rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS custkey,
             MAX(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))) AS last_day,
             COUNT(*) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary_dec
      FROM orders GROUP BY o_custkey),
    g AS (SELECT MAX(last_day) AS global_day FROM per_cust),
    scored AS (
      SELECT custkey,
             CAST(g.global_day - last_day AS BIGINT) AS recency_days,
             CAST(frequency AS BIGINT) AS frequency,
             monetary_dec,
             NTILE(5) OVER (ORDER BY (g.global_day - last_day) ASC, custkey ASC) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, custkey ASC) AS f_score,
             NTILE(5) OVER (ORDER BY monetary_dec DESC, custkey ASC) AS m_score
      FROM per_cust CROSS JOIN g)
    SELECT custkey, recency_days, frequency,
           CAST(monetary_dec AS DOUBLE) AS monetary,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           r_score || '-' || f_score || '-' || m_score AS segment
    FROM scored
    """,
)
def q172_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")))
        .cast("bigint")
        .alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary_dec"),
    )
    g = per_cust.groupBy().agg(F.max("last_day").alias("global_day"))
    scored = per_cust.crossJoin(F.broadcast(g)).withColumn(
        "recency_days", (F.col("global_day") - F.col("last_day")).cast("bigint")
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    w_m = Window.orderBy(F.desc("monetary_dec"), F.asc("custkey"))
    return scored.select(
        "custkey",
        "recency_days",
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary_dec").cast("double").alias("monetary"),
        F.ntile(5).over(w_r).cast("int").alias("r_score"),
        F.ntile(5).over(w_f).cast("int").alias("f_score"),
        F.ntile(5).over(w_m).cast("int").alias("m_score"),
    ).withColumn(
        "segment",
        F.concat_ws("-", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


# ---------------------------------------------------------------------------
# q173 — longest activity streak per user (gaps-and-islands over
# *distinct active days*): day = floor(epoch)/86400 integer UTC day
# (never session-tz to_date), island id = day - row_number, streak =
# island size. Output per user: longest streak, total active days, and
# whether the longest streak touches the user's last active day
# ("current streak" flag). Two shuffles: the distinct and the per-user
# window — both partition by user_id, so AQE coalesces them; no global
# sort anywhere.
# ---------------------------------------------------------------------------
@register(
    "q173_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      FROM events),
    isl AS (
      SELECT user_id, day,
             day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len, MAX(day) AS streak_end
      FROM isl GROUP BY user_id, grp),
    marked AS (
      SELECT user_id, len, streak_end,
             MAX(streak_end) OVER (PARTITION BY user_id) AS last_active
      FROM streaks)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS active_days,
           CAST(MAX(CASE WHEN streak_end = last_active THEN len ELSE 0 END) AS BIGINT)
             AS current_streak
    FROM marked
    GROUP BY user_id
    """,
)
def q173_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", (F.col("ts").cast("long") / F.lit(86400)).cast("bigint").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn("grp", F.col("day") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.max("day").alias("streak_end")
    )
    marked = streaks.withColumn(
        "last_active", F.max("streak_end").over(Window.partitionBy("user_id"))
    )
    return (
        marked.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("longest_streak"),
            F.sum("len").cast("bigint").alias("active_days"),
            F.max(
                F.when(F.col("streak_end") == F.col("last_active"), F.col("len")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("current_streak"),
        )
    )
