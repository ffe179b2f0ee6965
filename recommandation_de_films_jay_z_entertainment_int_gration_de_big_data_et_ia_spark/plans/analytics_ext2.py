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


# ---------------------------------------------------------------------------
# q174 — Welch's t-test between two event cohorts (the A/B-test
# primitive behind q139's CUPED): per-cohort n / mean / variance from
# EXACT decimal sums (sum, sum-of-squares of the DECIMAL(18,4)-cast
# value — decimal x decimal products are exact, so both engines feed
# bit-identical doubles into the final formula), then the Welch
# statistic and Satterthwaite df in identically-shaped double
# arithmetic, single-rounded. One scan, one 2-group aggregate — the
# whole test is a map-side-combinable agg at any scale.
# ---------------------------------------------------------------------------
@register(
    "q174_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS svv
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type),
    m AS (
      SELECT event_type, n, sv / n AS mean,
             (svv - sv * sv / n) / (n - 1) AS var
      FROM s),
    ab AS (
      SELECT
        MAX(CASE WHEN event_type = 'click' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'click' THEN mean END) AS m1,
        MAX(CASE WHEN event_type = 'click' THEN var END) AS v1,
        MAX(CASE WHEN event_type = 'view' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'view' THEN mean END) AS m2,
        MAX(CASE WHEN event_type = 'view' THEN var END) AS v2
      FROM m)
    SELECT CAST(n1 AS BIGINT) AS n_click, CAST(n2 AS BIGINT) AS n_view,
           ROUND(m1, 6) AS mean_click, ROUND(m2, 6) AS mean_view,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(
             (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)),
             6) AS welch_df
    FROM ab
    """,
)
def q174_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    vdec = F.col("value").cast("decimal(18,4)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vdec).cast("double").alias("sv"),
        F.sum(vdec * vdec).cast("double").alias("svv"),
    )
    m = s.select(
        "event_type",
        "n",
        (F.col("sv") / F.col("n")).alias("mean"),
        ((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    def _pick(col: str, et: str) -> F.Column:
        return F.max(F.when(F.col("event_type") == et, F.col(col)))
    ab = m.groupBy().agg(
        _pick("n", "click").alias("n1"),
        _pick("mean", "click").alias("m1"),
        _pick("var", "click").alias("v1"),
        _pick("n", "view").alias("n2"),
        _pick("mean", "view").alias("m2"),
        _pick("var", "view").alias("v2"),
    )
    se2_1 = F.col("v1") / F.col("n1")
    se2_2 = F.col("v2") / F.col("n2")
    return ab.select(
        F.col("n1").cast("bigint").alias("n_click"),
        F.col("n2").cast("bigint").alias("n_view"),
        F.round(F.col("m1"), 6).alias("mean_click"),
        F.round(F.col("m2"), 6).alias("mean_view"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2_1 + se2_2), 6).alias("t_stat"),
        F.round(
            (se2_1 + se2_2) * (se2_1 + se2_2)
            / (se2_1 * se2_1 / (F.col("n1") - 1) + se2_2 * se2_2 / (F.col("n2") - 1)),
            6,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# q175 — Benford first-digit audit over order totals (fraud/data-quality
# screen): the leading digit is taken from the INTEGER part's string
# form (integer-to-string is exact in every engine — no float-formatting
# or log10 edge cases), counted, and compared to the Benford expectation
# log10(1 + 1/d). Output: digit, count, observed share, expected share,
# absolute deviation, and the chi-square contribution. One scan + one
# 9-group agg; the global total is a broadcast 1-row frame.
# ---------------------------------------------------------------------------
@register(
    "q175_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / t.total, 6) AS observed,
           ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
           ROUND(abs(CAST(n AS DOUBLE) / t.total - log10(1.0 + 1.0 / digit)), 6) AS abs_dev,
           ROUND(
             (CAST(n AS DOUBLE) - t.total * log10(1.0 + 1.0 / digit))
             * (CAST(n AS DOUBLE) - t.total * log10(1.0 + 1.0 / digit))
             / (t.total * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
    FROM c CROSS JOIN t
    """,
)
def q175_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    c = (
        orders.select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.groupBy().agg(F.sum("n").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    diff = F.col("n").cast("double") - F.col("total") * exp
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(obs, 6).alias("observed"),
        F.round(exp, 6).alias("expected"),
        F.round(F.abs(obs - exp), 6).alias("abs_dev"),
        F.round(diff * diff / (F.col("total") * exp), 6).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# q176 — Pearson correlation matrix over the lineitem measures
# (feature-screening primitive for the q139/q131 model-prep family):
# all pairwise correlations among quantity / extendedprice / discount /
# tax in ONE scan — a single aggregate computes every decimal sum and
# exact pairwise product-sum (10 of them); the 6 correlations are then
# identically-shaped double expressions over that broadcast 1-row
# frame, unpivoted to (col_a, col_b, corr) rows. At 100 TB this stays a
# map-side-combinable single-pass agg — never one job per pair.
# ---------------------------------------------------------------------------
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    sums = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) AS s_{c}")
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            # DECIMAL(28,4) operands force int128 storage in DuckDB —
            # DECIMAL(18)x DECIMAL(18) would overflow its int64 fast path.
            # The product is exact either way, matching Spark's (37,8).
            sums.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(28,4)) * CAST({b} AS DECIMAL(28,4))) AS DOUBLE)"
                f" AS p_{a}_{b}"
            )
    arms = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            arms.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
                f" ROUND((n * p_{a}_{b} - s_{a} * s_{b})"
                f" / (sqrt(n * p_{a}_{a} - s_{a} * s_{a})"
                f" * sqrt(n * p_{b}_{b} - s_{b} * s_{b})), 6) AS corr FROM s"
            )
    return "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem) " + " UNION ALL ".join(arms)


@register("q176_corr_matrix", oracle=_corr_oracle())
def q176_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c).cast("decimal(18,4)")).cast("double").alias(f"s_{c}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum(F.col(a).cast("decimal(18,4)") * F.col(b).cast("decimal(18,4)"))
                .cast("double")
                .alias(f"p_{a}_{b}")
            )
    s = li.groupBy().agg(*aggs)
    arms = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            corr = (
                F.col("n") * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            ) / (
                F.sqrt(F.col("n") * F.col(f"p_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * F.sqrt(F.col("n") * F.col(f"p_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            arms.append(
                s.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(corr, 6).alias("corr"),
                )
            )
    out = arms[0]
    for arm in arms[1:]:
        out = out.unionAll(arm)
    return out
