"""Time-series / event-stream query catalog over ``events``.

Uses Spark's native time-window operators (``F.window`` tumbling/sliding,
``F.session_window`` gap sessions) — the *same* expressions run under
Structured Streaming with a watermark (see ``streaming/windows.py``); here
they're exercised in batch so the DuckDB oracle can replay them exactly.
Window starts are surfaced as epoch seconds (BIGINT) — timezone-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register

DEC = "decimal(18,4)"


def _sum_value() -> F.Column:
    return F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 2)


SUM_VALUE_SQL = "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)"


# ---------------------------------------------------------------------------
# Tumbling 1-hour windows per event_type
# ---------------------------------------------------------------------------
@register(
    "q44_tumbling_window",
    oracle=f"""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_s, event_type,
           COUNT(*) AS n_events, {SUM_VALUE_SQL} AS sum_value
    FROM events
    GROUP BY window_start_s, event_type
    """,
)
def q44_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value().alias("sum_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Sliding windows: 1 hour long, every 30 minutes (each event in 2 windows)
# ---------------------------------------------------------------------------
@register(
    "q45_sliding_window",
    oracle=f"""
    WITH assigned AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS ws, value FROM events
      UNION ALL
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 - 1800 AS ws, value FROM events)
    SELECT ws AS window_start_s, COUNT(*) AS n_events, {SUM_VALUE_SQL} AS sum_value
    FROM assigned GROUP BY ws
    """,
)
def q45_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value().alias("sum_value"))
        .select(F.col("w.start").cast("long").alias("window_start_s"), "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (30-minute inactivity gap) — Spark-native
# session_window, oracled by the classic lag/cumulative-sum construction.
# New-session rule matches session_window: gap STRICTLY less than 30 min
# continues a session (diff >= 1800s starts a new one).
# ---------------------------------------------------------------------------
@register(
    "q46_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch(ts) AS t,
             LAG(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
      FROM events),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN prev_t IS NULL OR t - prev_t >= 1800 THEN 1 ELSE 0 END AS new_sess
      FROM o),
    numbered AS (
      SELECT user_id, t,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_num
      FROM flagged)
    SELECT user_id, CAST(MIN(floor(t)) AS BIGINT) AS session_start_s,
           COUNT(*) AS n_events,
           CAST(MAX(floor(t)) AS BIGINT) - CAST(MIN(floor(t)) AS BIGINT) AS duration_s
    FROM numbered GROUP BY user_id, sess_num
    """,
)
def q46_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.min(F.col("ts").cast("long")).alias("session_start_s"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("duration_s"),
        )
        .select("user_id", "session_start_s", "n_events", "duration_s")
    )


# ---------------------------------------------------------------------------
# JSON scalar extraction from the props column
# ---------------------------------------------------------------------------
@register(
    "q47_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q47_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Range (interval) join: events ⨝ overlapping 2-day campaign windows.
# Engine side uses the bucketed equi-join rewrite (relational.range_join_
# bucketed) — never BroadcastNestedLoopJoin; oracle uses the plain
# inequality join (same result, different physical strategy).
# Epoch-second comparisons on both sides keep it timezone-proof.
# ---------------------------------------------------------------------------
_JAN1_2024 = 1704067200  # 2024-01-01 00:00:00 UTC


@register(
    "q84_range_join",
    oracle=f"""
    WITH ev AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value FROM events),
    iv AS (SELECT {_JAN1_2024} + s * 86400 AS w_start_s,
                  {_JAN1_2024} + s * 86400 + 172800 AS w_end_s
           FROM generate_series(0, 29) t(s)),
    j AS (SELECT w_start_s, value FROM ev
          JOIN iv ON ts_s >= w_start_s AND ts_s < w_end_s)
    SELECT CAST(w_start_s AS BIGINT) AS w_start_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SUM_VALUE_SQL} AS sum_value
    FROM j GROUP BY w_start_s ORDER BY w_start_s
    """,
)
def q84_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import relational as R

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("long").alias("ts_s"), "value"
    )
    iv = spark.range(0, 30).select(
        (F.lit(_JAN1_2024).cast("long") + F.col("id") * 86400).alias("w_start_s"),
        (F.lit(_JAN1_2024).cast("long") + F.col("id") * 86400 + 172800).alias("w_end_s"),
    )
    joined = R.range_join_bucketed(
        ev, "ts_s", iv, "w_start_s", "w_end_s", bucket=86400, broadcast_intervals=True
    )
    return (
        joined.groupBy("w_start_s")
        .agg(F.count(F.lit(1)).alias("n_events"), _sum_value().alias("sum_value"))
        .orderBy("w_start_s")
    )


# ---------------------------------------------------------------------------
# Click attribution: interval self-join (view ← click within 30 min, same
# user). The engine runs streaming/windows.attribution_join — the SAME
# expression that runs as a watermarked stream-stream join (equivalence
# guarded by tests/test_streaming.py) — here over the batch table.
# ---------------------------------------------------------------------------
@register(
    "q87_click_attribution",
    oracle="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM events WHERE event_type = 'click')
    SELECT v.user_id, view_id, click_id,
           CAST(floor(epoch(view_ts)) AS BIGINT) AS view_ts_s,
           CAST(floor(epoch(click_ts)) AS BIGINT) AS click_ts_s
    FROM v JOIN c ON v.user_id = c.user_id
      AND click_ts >= view_ts AND click_ts < view_ts + INTERVAL 30 MINUTE
    """,
)
def q87_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import attribution_join

    ev = load_table(spark, sf_dir, "events")
    return attribution_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
    )


# ---------------------------------------------------------------------------
# q98 — as-of join (backward): each click attributed to the single most
# recent prior view by the same user, with UNBOUNDED lookback (q87's
# interval join needs a 30-min bound to stay bucketable; the as-of shape
# doesn't). Generalizes q59 (single-stream carry-forward of one
# timestamp) to TWO frames with an arbitrary matched-row payload. The operator is join-free — union-tag + running last() over a
# (user, ts) window, one shuffle — and the oracle is DuckDB's native
# ASOF JOIN. Ties: views are pre-reduced to max(view_id) per (user, ts),
# and a click at ts T matches a view at exactly T (>= semantics), both
# mirrored in the oracle.
# ---------------------------------------------------------------------------
@register(
    "q98_asof_join",
    oracle="""
    WITH v AS (SELECT user_id, ts, MAX(event_id) AS view_id
               FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
    c AS (SELECT user_id, ts, event_id AS click_id
          FROM events WHERE event_type = 'click')
    SELECT c.click_id, c.user_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts_s,
           v.view_id,
           CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts_s
    FROM c ASOF JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def q98_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    j = asof_join_backward(clicks, views, on="user_id", ts="ts")
    return j.select(
        "click_id",
        "user_id",
        F.col("ts").cast("long").alias("click_ts_s"),
        "view_id",
        F.col("ts_matched").cast("long").alias("view_ts_s"),
    )


# ---------------------------------------------------------------------------
# q101 — retention cohort matrix: users bucketed by first-seen week,
# counted in each subsequent week they were active. Week buckets are
# epoch arithmetic (floor(epoch / 604800)), NOT date_trunc('week') —
# calendar truncation is session-timezone-dependent in Spark (LTZ) and
# would break oracle parity on a non-UTC vanilla driver session.
# Shape: distinct (one shuffle), first-seen agg (one shuffle on user),
# join on user, final agg — no window, no per-user state.
# ---------------------------------------------------------------------------
@register(
    "q101_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS wk
      FROM events),
    firstseen AS (SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY user_id)
    SELECT cohort * 604800 AS cohort_week_s,
           a.wk - f.cohort AS week_offset,
           COUNT(*) AS n_users
    FROM act a JOIN firstseen f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q101_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.floor(F.col("ts").cast("long") / 604800).cast("long").alias("wk")
    ).distinct()
    firstseen = act.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        act.join(firstseen, "user_id")
        .groupBy(
            (F.col("cohort") * 604800).alias("cohort_week_s"),
            (F.col("wk") - F.col("cohort")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ---------------------------------------------------------------------------
# q102 — SCD2 history: per user, collapse consecutive identical
# event_types into versioned validity intervals (valid_from <= t <
# valid_to; the open version ends at the standard year-9999 high-date,
# not NULL, so intervals stay range-filterable and engines agree on the
# column type). Both sides order by (floored epoch, event_id) — a total
# order — so same-second changes version deterministically.
# ---------------------------------------------------------------------------
@register(
    "q102_scd2_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS rn
      FROM events),
    chg AS (SELECT user_id, event_type, t, event_id FROM o
            WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
    SELECT user_id, event_type, t AS valid_from_s,
           COALESCE(LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id),
                    253402300800) AS valid_to_s,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, event_id) AS BIGINT) AS version
    FROM chg
    """,
)
def q102_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import scd2_history

    ev = load_table(spark, sf_dir, "events")
    return scd2_history(ev, "user_id", "ts", "event_type", "event_id")


# ---------------------------------------------------------------------------
# q118 — gap-filled hourly series: every (event_type, hour) bucket in the
# table's [min, max] hour span, zero-filled where no events landed (the
# dense series a dashboard/forecaster consumes; sparse groupBy output
# silently hides empty buckets). The dense axis is generated with
# F.sequence/explode from a 1-row span aggregate — no driver loop, no UDF.
#
# Shape (100 TB): the span is a 1-row broadcast; the dense axis is
# |hours| × |types| rows (tiny vs the fact table); the fact-side agg is
# the usual partial+final hash agg, and the fill join is broadcast of the
# AGGREGATED sparse frame into the dense axis when small — here the
# dense axis and the agg are both small; the fact table is scanned once.
# ---------------------------------------------------------------------------
@register(
    "q118_gapfill_hourly",
    oracle="""
    WITH span AS (
      SELECT CAST(epoch(date_trunc('hour', MIN(ts))) AS BIGINT) AS lo,
             CAST(epoch(date_trunc('hour', MAX(ts))) AS BIGINT) AS hi
      FROM events),
    axis AS (
      SELECT t.h AS window_start_s, et.event_type
      FROM (SELECT unnest(range(lo, hi + 3600, 3600)) AS h FROM span) t
      CROSS JOIN (SELECT DISTINCT event_type FROM events) et),
    agg AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS ws, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT a.window_start_s, a.event_type,
           CAST(COALESCE(g.n, 0) AS BIGINT) AS n_events
    FROM axis a LEFT JOIN agg g
      ON a.window_start_s = g.ws AND a.event_type = g.event_type
    """,
)
def q118_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.floor(F.col("ts").cast("long") / 3600) * 3600
    span = ev.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("window_start_s")
    )
    types = ev.select("event_type").distinct()
    axis = hours.crossJoin(F.broadcast(types))
    agg = ev.groupBy(hour.alias("ws"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        axis.join(
            F.broadcast(agg),
            (axis["window_start_s"] == agg["ws"])
            & (axis["event_type"] == agg["event_type"]),
            "left",
        )
        .select(
            "window_start_s",
            axis["event_type"].alias("event_type"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# q128 — behavior transition matrix: per user, order events by the total
# order (epoch-floored ts, event_id) and count consecutive event-type
# bigrams; emit each transition's count and per-source-state probability
# (the first-order Markov chain product analytics reads funnels from).
# Probability = count/row-total as identically-parenthesized double math
# rounded to 6 — cross-engine exact.
#
# Shape (100 TB): one shuffle on user_id for the lag window, then a
# small (|types|²) aggregate; the per-from totals come from a window
# over that tiny frame, not a second pass over events.
# ---------------------------------------------------------------------------
@register(
    "q128_markov_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev
      FROM events),
    c AS (SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
          FROM o WHERE prev IS NOT NULL GROUP BY prev, event_type),
    t AS (SELECT from_type, to_type, n,
                 SUM(n) OVER (PARTITION BY from_type) AS tot
          FROM c)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / tot, 6) AS prob
    FROM t
    """,
)
def q128_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").cast("long"), "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("from_type")
    ).filter(F.col("from_type").isNotNull())
    c = o.groupBy("from_type", F.col("event_type").alias("to_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.withColumn("tot", F.sum("n").over(Window.partitionBy("from_type")))
    return t.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("prob"),
    )


# ---------------------------------------------------------------------------
# q129 — horizon dedup (the batch twin of q114's streaming
# dropDuplicatesWithinWatermark): per (user, event_type), events closer
# than 30 min to their predecessor collapse into one "burst"; keep the
# first event of each burst. Expressed with the native session window —
# the same merging-state machinery as q46 — so the batch and streaming
# forms share semantics. Oracle: gaps-and-islands (lag + cumulative
# new-burst flag), the classic SQL replay of session merging.
# The burst's keeper is selected via a packed (t, event_id) integer key
# (t*2^32 + id — engine-agnostic argmin; t < 2^31 and id < 2^32 keep
# the pack inside int64 for any realistic fixture).
# ---------------------------------------------------------------------------
@register(
    "q129_horizon_dedup",
    oracle="""
    WITH o AS (
      -- Gap detection MUST use full-precision epoch(ts): Spark's
      -- session_window merges on microsecond timestamps, so a pair with
      -- a 1799.2s true gap (floored diff 1800) must merge here too.
      -- Floored t is used only for the packed output key, matching the
      -- Spark side's ts.cast('long'). (Same precision discipline as q46.)
      SELECT user_id, event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             epoch(ts) AS t_us,
             LAG(epoch(ts))
               OVER (PARTITION BY user_id, event_type
                     ORDER BY epoch(ts), event_id) AS prev_t_us
      FROM events),
    f AS (SELECT *, CASE WHEN prev_t_us IS NULL OR t_us - prev_t_us >= 1800 THEN 1 ELSE 0 END AS new_burst
          FROM o),
    g AS (SELECT *, SUM(new_burst) OVER (PARTITION BY user_id, event_type
                                         ORDER BY t_us, event_id) AS burst
          FROM f)
    SELECT user_id, event_type,
           CAST(MIN(t * 4294967296 + event_id) // 4294967296 AS BIGINT) AS first_ts_s,
           CAST(MIN(t * 4294967296 + event_id) % 4294967296 AS BIGINT) AS kept_event_id,
           CAST(COUNT(*) AS BIGINT) AS n_collapsed
    FROM g GROUP BY user_id, event_type, burst
    """,
)
def q129_horizon_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type", F.session_window("ts", "30 minutes"))
        .agg(
            F.min(F.col("ts").cast("long") * 4294967296 + F.col("event_id")).alias("__p"),
            F.count(F.lit(1)).cast("bigint").alias("n_collapsed"),
        )
        .select(
            "user_id",
            "event_type",
            (F.col("__p") / 4294967296).cast("bigint").alias("first_ts_s"),
            (F.col("__p") % 4294967296).cast("bigint").alias("kept_event_id"),
            "n_collapsed",
        )
    )


# ---------------------------------------------------------------------------
# q130 — chi-square independence audit between event_type and day-of-week:
# observed cell counts vs expected under independence, with per-cell
# chi² contributions. Day-of-week is epoch arithmetic ((d + 4) % 7,
# 1970-01-01 = Thursday) — timezone-free and identical in both engines;
# expected/chi² are identically-parenthesized double math on exact
# counts, rounded to 6.
# ---------------------------------------------------------------------------
@register(
    "q130_chisq_dow",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(((CAST(floor(epoch(ts)) AS BIGINT) // 86400) + 4) % 7 AS BIGINT) AS dow,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, dow, o,
                 SUM(o) OVER (PARTITION BY event_type) AS row_tot,
                 SUM(o) OVER (PARTITION BY dow) AS col_tot,
                 SUM(o) OVER () AS n
          FROM c)
    SELECT event_type, dow, CAST(o AS BIGINT) AS observed,
           ROUND((CAST(row_tot AS DOUBLE) * col_tot) / n, 6) AS expected,
           ROUND(((o - (CAST(row_tot AS DOUBLE) * col_tot) / n)
                  * (o - (CAST(row_tot AS DOUBLE) * col_tot) / n))
                 / ((CAST(row_tot AS DOUBLE) * col_tot) / n), 6) AS chi2_term
    FROM t
    """,
)
def q130_chisq_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dow = (((F.col("ts").cast("long") / 86400).cast("bigint") + 4) % 7).cast("bigint")
    c = ev.groupBy("event_type", dow.alias("dow")).agg(F.count(F.lit(1)).alias("o"))
    t = c.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = (F.col("row_tot").cast("double") * F.col("col_tot")) / F.col("n")
    return t.select(
        "event_type",
        "dow",
        F.col("o").cast("bigint").alias("observed"),
        F.round(e, 6).alias("expected"),
        F.round(((F.col("o") - e) * (F.col("o") - e)) / e, 6).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# q131 — grouped OLS trend: per event_type, regress value on event-day
# with closed-form least squares over EXACT decimal sums (value rounded
# to DECIMAL(18,6) first; x is integer days) — the slope/intercept
# doubles are then identical in both engines because every float op on
# top of the exact sums is identically parenthesized.
# ---------------------------------------------------------------------------
@register(
    "q131_group_ols_trend",
    oracle="""
    WITH p AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS x,
             CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS y
      FROM events WHERE value IS NOT NULL),
    s AS (SELECT event_type,
                 COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
                 SUM(y) AS sy, SUM(CAST(x AS DECIMAL(18,0)) * y) AS sxy
          FROM p GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 8) AS slope,
           ROUND((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM s
    """,
)
def q131_group_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    p = ev.select(
        "event_type",
        (F.col("ts").cast("long") / 86400).cast("bigint").alias("x"),
        F.round("value", 6).cast("decimal(18,6)").alias("y"),
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, sxxd = F.col("sx").cast("double"), F.col("sxx").cast("double")
    syd, sxyd = F.col("sy").cast("double"), F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 8).alias("slope"),
        F.round((syd - slope * sxd) / nd, 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# q132 — weighted moving average per event-type daily series: the last 3
# days' sums combined with fixed weights (0.5, 0.3, 0.2, newest first) —
# the bounded-window smoother dashboards run (EWMA's exact finite
# cousin; a true EWMA is the streaming applyInPandasWithState shape).
# Daily sums and the weighted combination stay in EXACT decimal
# arithmetic end-to-end and are emitted at FULL scale as strings — the
# oracle exposed that not only double rounding but even decimal→decimal
# tie rounding differs across engines (x.xx5 went HALF_UP in Spark,
# down in DuckDB), so the only bit-stable surface is the unrounded
# exact decimal.
# ---------------------------------------------------------------------------
@register(
    "q132_weighted_moving_avg",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS s
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    l AS (
      SELECT event_type, day, s,
             LAG(s, 1) OVER (PARTITION BY event_type ORDER BY day) AS s1,
             LAG(s, 2) OVER (PARTITION BY event_type ORDER BY day) AS s2
      FROM d)
    SELECT event_type, day,
           CAST(s AS VARCHAR) AS day_sum,
           CAST(CAST(CAST(0.5 AS DECIMAL(2,1)) * s
                     + CAST(0.3 AS DECIMAL(2,1)) * s1
                     + CAST(0.2 AS DECIMAL(2,1)) * s2 AS DECIMAL(30,7)) AS VARCHAR) AS wma3
    FROM l WHERE s1 IS NOT NULL AND s2 IS NOT NULL
    """,
)
def q132_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    d = ev.groupBy(
        "event_type",
        (F.col("ts").cast("long") / 86400).cast("bigint").alias("day"),
    ).agg(F.sum(F.round("value", 6).cast("decimal(18,6)")).alias("s"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = d.select(
        "event_type",
        "day",
        "s",
        F.lag("s", 1).over(w).alias("s1"),
        F.lag("s", 2).over(w).alias("s2"),
    ).filter(F.col("s1").isNotNull() & F.col("s2").isNotNull())
    import decimal

    w5 = F.lit(decimal.Decimal("0.5"))
    w3 = F.lit(decimal.Decimal("0.3"))
    w2 = F.lit(decimal.Decimal("0.2"))
    return lagged.select(
        "event_type",
        "day",
        F.col("s").cast("string").alias("day_sum"),
        (w5 * F.col("s") + w3 * F.col("s1") + w2 * F.col("s2"))
        .cast("decimal(30,7)")
        .cast("string")
        .alias("wma3"),
    )


# ---------------------------------------------------------------------------
# q135 — point-in-time (time-travel) lookup over the SCD2 history: the
# state every user was in at 2024-01-15 00:00 UTC — the interval
# containing T (valid_from <= T < valid_to). This is why q102 closes its
# open version with a year-9999 high-date instead of NULL: the probe is
# a plain range filter, partition/zone-map prunable at scale, no
# NULL-handling branch.
# ---------------------------------------------------------------------------
_PIT_T = 1705276800  # 2024-01-15 00:00:00 UTC


@register(
    "q135_point_in_time",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS prev,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS rn
      FROM events),
    chg AS (SELECT user_id, event_type, t, event_id FROM o
            WHERE rn = 1 OR event_type IS DISTINCT FROM prev),
    hist AS (
      SELECT user_id, event_type, t AS valid_from_s,
             COALESCE(LEAD(t) OVER (PARTITION BY user_id ORDER BY t, event_id),
                      253402300800) AS valid_to_s,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t, event_id) AS BIGINT) AS version
      FROM chg)
    SELECT user_id, event_type AS state_at_t, valid_from_s, version
    FROM hist WHERE valid_from_s <= {_PIT_T} AND {_PIT_T} < valid_to_s
    """,
)
def q135_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.relational import scd2_history

    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(ev, "user_id", "ts", "event_type", "event_id")
    return hist.filter(
        (F.col("valid_from_s") <= _PIT_T) & (F.lit(_PIT_T) < F.col("valid_to_s"))
    ).select(
        "user_id",
        F.col("event_type").alias("state_at_t"),
        "valid_from_s",
        "version",
    )


# ---------------------------------------------------------------------------
# q143 — STREAMING sessionization (q46 through Structured Streaming's
# merging-session state store, drained with availableNow in append
# mode). The oracle is the batch lag/cumsum session construction in
# FULL-PRECISION microseconds (per the q129 lesson: gap and emission
# comparisons never floor; only output columns do) plus the emission
# predicate probed and pinned in tests/test_streaming.py:
#   watermark_us = (max_event_us // 1000 - delay_ms) * 1000   (ms truncation)
#   emitted      iff session_end_us <= watermark_us           (non-strict)
# Sessions the final watermark has not passed remain in state and are
# NOT in the output — the oracle excludes exactly those.
# ---------------------------------------------------------------------------
_SESS_GAP_US = 1_800_000_000  # 30 minutes
_SESS_DELAY_MS = 600_000  # 10 minutes


@register(
    "q143_streaming_sessions",
    oracle=f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS t,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
      FROM events),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN prev_t IS NULL OR t - prev_t >= {_SESS_GAP_US} THEN 1 ELSE 0 END AS new_sess
      FROM o),
    numbered AS (
      SELECT user_id, t,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_num
      FROM flagged),
    sess AS (
      SELECT user_id,
             MIN(t) AS start_us, MAX(t) AS end_last_us, COUNT(*) AS n_events
      FROM numbered GROUP BY user_id, sess_num),
    wm AS (
      SELECT ((MAX(epoch_us(ts)) // 1000) - {_SESS_DELAY_MS}) * 1000 AS wm_us FROM events)
    SELECT user_id,
           start_us // 1000000 AS session_start_s,
           n_events,
           end_last_us // 1000000 - start_us // 1000000 AS duration_s
    FROM sess, wm
    WHERE end_last_us + {_SESS_GAP_US} <= wm_us
    """,
)
def q143_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from ..streaming.windows import run_stream_to_memory, session_counts, stream_events

    name = f"q143_sink_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(
        session_counts(stream_events(spark, sf_dir), gap="30 minutes", watermark="10 minutes"),
        name,
        output_mode="append",
    )
    return spark.table(name)


# ---------------------------------------------------------------------------
# q145 — concurrency curve (sweep-line occupancy): sessions (q46's exact
# construction) become +1/-1 boundary deltas; a running sum over the
# time-ordered deltas is the number of concurrently-open sessions; the
# output is the per-day peak. The classic interval-overlap aggregation
# that plain SQL can't express without a sweep — here it is two
# shuffles (session groupBy, boundary groupBy) plus one global running
# window. Day is surfaced as epoch-day (t // 86400) — timezone-free.
#
# Shape (100 TB): the global running sum is the one inherently serial
# step; its input is BOUNDARY COUNTS (two rows per session, pre-summed
# per timestamp), orders of magnitude smaller than events. For
# cluster-width parallelism swap the single window for the two-pass
# partition-prefix trick (per-shard sums, then broadcast shard offsets)
# — same algebra, documented here as the scale path.
# ---------------------------------------------------------------------------
@register(
    "q145_concurrency_curve",
    oracle=f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS t,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
      FROM events),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN prev_t IS NULL OR t - prev_t >= {_SESS_GAP_US} THEN 1 ELSE 0 END AS new_sess
      FROM o),
    numbered AS (
      SELECT user_id, t, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_num
      FROM flagged),
    sess AS (
      SELECT user_id, MIN(t) // 1000000 AS start_s, MAX(t) // 1000000 AS end_s
      FROM numbered GROUP BY user_id, sess_num),
    deltas AS (
      SELECT start_s AS t, 1 AS d FROM sess
      UNION ALL SELECT end_s + 1, -1 FROM sess),
    per_t AS (SELECT t, SUM(d) AS d FROM deltas GROUP BY t),
    curve AS (SELECT t, SUM(d) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM per_t)
    SELECT t // 86400 AS epoch_day, CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM curve GROUP BY epoch_day
    """,
)
def q145_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw")).agg(
        F.min(F.col("ts").cast("long")).alias("start_s"),
        F.max(F.col("ts").cast("long")).alias("end_s"),
    )
    deltas = sess.select(F.col("start_s").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select((F.col("end_s") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t").agg(F.sum("d").alias("d"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve = per_t.withColumn("conc", F.sum("d").over(w))
    return (
        curve.withColumn("epoch_day", (F.col("t") / 86400).cast("bigint"))
        .groupBy("epoch_day")
        .agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
    )


# ---------------------------------------------------------------------------
# q147 — multi-touch revenue attribution: each purchase credits its value
# to (a) the user's most recent prior non-purchase event type
# (last-touch) and (b) the user's earliest prior non-purchase event type
# (first-touch); purchases with no prior touch credit 'none'. One window
# pass per user ordered by full-precision (ts, event_id) — the running
# last/first are computed with frame UNBOUNDED PRECEDING..1 PRECEDING,
# so a purchase never credits itself or later events. Exact decimal
# value sums. One shuffle on user_id, one on the tiny (model, type)
# rollup.
# ---------------------------------------------------------------------------
@register(
    "q147_touch_attribution",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
             FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
      FROM events),
    p AS (SELECT COALESCE(last_touch, 'none') AS last_touch,
                 COALESCE(first_touch, 'none') AS first_touch,
                 CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v
          FROM o WHERE event_type = 'purchase'),
    m AS (
      SELECT 'last_touch' AS model, last_touch AS touch_type,
             SUM(v) AS rev, COUNT(*) AS n FROM p GROUP BY last_touch
      UNION ALL
      SELECT 'first_touch', first_touch, SUM(v), COUNT(*) FROM p GROUP BY first_touch)
    SELECT model, touch_type, ROUND(CAST(rev AS DOUBLE), 4) AS rev, n FROM m
    """,
)
def q147_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    o = ev.select(
        "user_id",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(wb).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(wb).alias("first_touch"),
    )
    p = o.filter(F.col("event_type") == "purchase").select(
        F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
        F.round("value", 6).cast("decimal(18,6)").alias("v"),
    )
    def rollup(col: str, model: str) -> DataFrame:
        return p.groupBy(F.col(col).alias("touch_type")).agg(
            F.sum("v").alias("rev"), F.count(F.lit(1)).alias("n")
        ).select(F.lit(model).alias("model"), "touch_type", "rev", "n")

    m = rollup("last_touch", "last_touch").unionAll(rollup("first_touch", "first_touch"))
    return m.select(
        "model", "touch_type", F.round(F.col("rev").cast("double"), 4).alias("rev"), "n"
    )


# ---------------------------------------------------------------------------
# q154 — STREAMING left-outer click attribution: q87's stream-stream
# interval join in LEFT OUTER form, so unattributed views surface as
# NULL-click rows once the watermark closes their match window. The
# oracle is the batch interval join UNION'd with the unmatched views
# whose end-exclusive window the final watermark has passed:
#   wm_us = (min(max_view_ms, max_click_ms) - delay_ms) * 1000
#   null-emit iff view_ts + 30min <= wm_us   (probe-pinned, strict
#   window end ⇒ non-strict watermark comparison).
# ---------------------------------------------------------------------------
_ATTR_WIN_US = 1_800_000_000  # 30 minutes
_ATTR_DELAY_MS = 7_200_000  # 2 hours


@register(
    "q154_streaming_left_attribution",
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_id AS view_id, epoch_us(ts) AS vt
      FROM events WHERE event_type = 'view'),
    c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS ct
      FROM events WHERE event_type = 'click'),
    m AS (
      SELECT v.user_id, v.view_id, c.click_id
      FROM v JOIN c ON v.user_id = c.user_id
       AND c.ct >= v.vt AND c.ct < v.vt + {_ATTR_WIN_US}),
    wm AS (
      SELECT (LEAST((SELECT MAX(vt) // 1000 FROM v),
                    (SELECT MAX(ct) // 1000 FROM c)) - {_ATTR_DELAY_MS}) * 1000 AS wmu),
    unm AS (
      SELECT v.user_id, v.view_id, CAST(NULL AS BIGINT) AS click_id
      FROM v, wm
      WHERE v.vt + {_ATTR_WIN_US} <= wm.wmu
        AND NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.view_id))
    SELECT user_id, view_id, click_id FROM m
    UNION ALL SELECT user_id, view_id, click_id FROM unm
    """,
)
def q154_streaming_left_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from ..streaming.windows import attribution_join_left, run_stream_to_memory, stream_events

    ev = stream_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    name = f"q154_sink_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(attribution_join_left(views, clicks), name, output_mode="append")
    return spark.table(name)


# ---------------------------------------------------------------------------
# q165 — LINEAR-interpolation gap fill (q118 zero-fills; real sensor /
# metric pipelines interpolate): per event_type, the hourly mean series
# on a dense hour axis, with missing hours linearly interpolated
# between the nearest observed neighbors (edge gaps clamp to the
# nearest boundary value). Neighbor lookup is last/first-IGNORE-NULLS
# over the dense axis; the interpolation expression is singly-rounded
# with identical parenthesization in both engines. Exact decimal hour
# means; the dense axis is generated per type from min/max hour
# (sequence+explode — scan-local, never a driver loop).
# ---------------------------------------------------------------------------
@register(
    "q165_interpolated_series",
    oracle="""
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
             ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS v
      FROM events GROUP BY event_type, hour),
    axis AS (
      SELECT event_type, UNNEST(range(MIN(hour), MAX(hour) + 1)) AS hour
      FROM hourly GROUP BY event_type),
    dense AS (
      SELECT a.event_type, a.hour, h.v
      FROM axis a LEFT JOIN hourly h ON a.event_type = h.event_type AND a.hour = h.hour),
    nb AS (
      SELECT event_type, hour, v,
             LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY hour
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM dense)
    SELECT event_type, hour,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE ROUND(pv + (nv - pv) * (CAST(hour - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)), 6)
           END AS value_filled,
           (v IS NULL) AS interpolated
    FROM nb
    """,
)
def q165_interpolated_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = (F.unix_micros("ts") / F.lit(3600000000)).cast("bigint")
    hourly = (
        ev.groupBy("event_type", hour.alias("hour"))
        .agg(
            F.round(
                F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("v")
        )
    )
    axis = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("hour"))
    )
    dense = axis.join(hourly, ["event_type", "hour"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    nb = dense.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wb).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("hour") - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt")).cast("double")),
        6,
    )
    return nb.select(
        "event_type",
        "hour",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
        .alias("value_filled"),
        F.col("v").isNull().alias("interpolated"),
    )


# ---------------------------------------------------------------------------
# q166 — session bounce rate: share of q46 sessions containing exactly
# one event, per user-activity bucket (light/medium/heavy by session
# count). Rides the exact session construction; rates rounded from
# integer ratios.
# ---------------------------------------------------------------------------
@register(
    "q166_bounce_rate",
    oracle=f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS t,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t
      FROM events),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN prev_t IS NULL OR t - prev_t >= {_SESS_GAP_US} THEN 1 ELSE 0 END AS new_sess
      FROM o),
    numbered AS (
      SELECT user_id, t, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_num
      FROM flagged),
    sess AS (SELECT user_id, sess_num, COUNT(*) AS n_events
             FROM numbered GROUP BY user_id, sess_num),
    per_user AS (
      SELECT user_id, COUNT(*) AS n_sessions,
             SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces
      FROM sess GROUP BY user_id),
    bucketed AS (
      SELECT CASE WHEN n_sessions >= 30 THEN 'heavy'
                  WHEN n_sessions >= 15 THEN 'medium' ELSE 'light' END AS activity,
             n_sessions, n_bounces
      FROM per_user)
    SELECT activity, COUNT(*) AS n_users,
           CAST(SUM(n_sessions) AS BIGINT) AS n_sessions,
           CAST(SUM(n_bounces) AS BIGINT) AS n_bounces,
           ROUND(CAST(SUM(n_bounces) AS DOUBLE) / SUM(n_sessions), 6) AS bounce_rate
    FROM bucketed GROUP BY activity
    """,
)
def q166_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    per_user = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("n_bounces"),
    )
    activity = (
        F.when(F.col("n_sessions") >= 30, "heavy")
        .when(F.col("n_sessions") >= 15, "medium")
        .otherwise("light")
    )
    return (
        per_user.select(activity.alias("activity"), "n_sessions", "n_bounces")
        .groupBy("activity")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_sessions").alias("n_sessions"),
            F.sum("n_bounces").alias("n_bounces"),
            F.round(
                F.sum("n_bounces").cast("double") / F.sum("n_sessions"), 6
            ).alias("bounce_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q240 — VARIABLE-gap sessionization: Spark's dynamic session_window
# (per-event inactivity horizon by event_type: click 10 min / view
# 30 min / else 15 min). Each event opens [ts, ts+gap); overlapping
# windows per user merge, so the batch oracle is the interval-union
# islands construction: new session when t >= running MAX of prior
# (t + gap). All comparisons in exact epoch MICROSECONDS (the q129/q46
# precision lesson — never compare on floored seconds); only the OUTPUT
# keys floor to seconds.
# ---------------------------------------------------------------------------
@register(
    "q240_dynamic_sessions",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CASE event_type WHEN 'click' THEN 600000000
                             WHEN 'view' THEN 1800000000
                             ELSE 900000000 END AS gap_us
      FROM events),
    runend AS (
      SELECT user_id, t_us,
             MAX(t_us + gap_us) OVER (PARTITION BY user_id ORDER BY t_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM o),
    flagged AS (
      SELECT user_id, t_us,
             CASE WHEN prev_end IS NULL OR t_us >= prev_end THEN 1 ELSE 0 END AS new_sess
      FROM runend),
    numbered AS (
      SELECT user_id, t_us,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_num
      FROM flagged)
    SELECT user_id,
           CAST(MIN(t_us // 1000000) AS BIGINT) AS session_start_s,
           COUNT(*) AS n_events,
           CAST(MAX(t_us // 1000000) - MIN(t_us // 1000000) AS BIGINT) AS duration_s
    FROM numbered GROUP BY user_id, sess_num
    """,
)
def q240_dynamic_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "click", "10 minutes")
        .when(F.col("event_type") == "view", "30 minutes")
        .otherwise("15 minutes")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.min(F.col("ts").cast("long")).alias("session_start_s"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_s"
            ),
        )
        .select("user_id", "session_start_s", "n_events", "duration_s")
    )


# ---------------------------------------------------------------------------
# q276 — ES pipeline aggregations over a date_histogram: the
# `cumulative_sum`, `derivative`, and `moving_fn`(avg, window=7) sibling
# aggs Elasticsearch layers on a date_histogram bucket response
# (reference stack surface: the ES DSL family; the reference's own
# queries stop at flat aggs). Daily revenue buckets over `orders`;
# per-bucket revenue is an exact DECIMAL(18,2) sum so every derived
# pipeline value (running sum, first difference, 7-bucket moving mean)
# is order-stable and bit-identical across engines. First-bucket
# derivative is NULL, exactly as ES emits it; moving_fn averages the
# partial window at the head, as ES does.
#
# Shape (100 TB): one shuffle to the day-grain aggregate; the pipeline
# window functions then run over the *bucket frame* — date_histogram
# cardinality (one row per day), which is small by construction, same
# as the single ES agg response the pipeline aggs walk.
# ---------------------------------------------------------------------------
@register(
    "q276_es_pipeline_aggs",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY day)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
           ROUND(CAST(SUM(rev) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_revenue,
           ROUND(CAST(rev - LAG(rev) OVER (ORDER BY day) AS DOUBLE), 2) AS deriv,
           ROUND(CAST(SUM(rev) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov7_avg
    FROM daily ORDER BY day
    """,
)
def q276_es_pipeline_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.to_date("o_orderdate").alias("day"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("day")
        .agg(F.sum("p").alias("rev"))
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_mov = Window.orderBy("day").rowsBetween(-6, 0)
    w_lag = Window.orderBy("day")
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(F.sum("rev").over(w_cum).cast("double"), 2).alias("cum_revenue"),
        F.round(
            (F.col("rev") - F.lag("rev").over(w_lag)).cast("double"), 2
        ).alias("deriv"),
        F.round(
            F.sum("rev").over(w_mov).cast("double")
            / F.count(F.lit(1)).over(w_mov),
            4,
        ).alias("mov7_avg"),
    ).orderBy("day")
