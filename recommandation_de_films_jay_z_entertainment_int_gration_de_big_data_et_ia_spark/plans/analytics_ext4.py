"""Round-7 catalog extensions, batch 5+ — ES compound-query scoring
(`boosting`, `dis_max`) and LLM-training data transforms (fill-in-the-
middle split prep, matryoshka-embedding truncation audit).

Reference context: the reference delegates all querying to the full ES
stack (docker-compose.yml:32); `boosting` and `dis_max` are core ES
compound queries any user of that stack can issue. The FIM and
matryoshka entries extend the LLM-pipeline family (SURVEY §2.8) the
same way q302/q304 (batching, curriculum) do.

Determinism discipline (see catalog.py): integer term frequencies as
the score base (exact in binary), shared float literals for boosts,
md5-derived cut points (never engine-native hash/random), per-vector
double folds left-to-right (F.aggregate ↔ list_reduce) with
round→DECIMAL before any cross-row average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.readers import load_table
from .analytics_ext2 import _md5_16bit_sql
from .catalog import register

# DuckDB mirror of functions.text.tokens() — keep in sync.
_TOKS_SQL = (
    "regexp_split_to_array(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' +')"
)


def _tf_sql(term: str) -> str:
    return (
        f"CAST(len(list_filter({_TOKS_SQL}, x -> x = '{term}')) AS BIGINT)"
    )


def _tf_col(term: str) -> F.Column:
    return (
        F.size(F.filter(tokens("text"), lambda x: x == F.lit(term)))
        .cast("bigint")
    )


# ---------------------------------------------------------------------------
# q314 — ES `boosting` query: documents matching the positive query
# ("merge") score by term frequency; documents ALSO matching the
# negative query ("slow") keep matching but are demoted by
# negative_boost (ES default-style multiplicative penalty).
#
# Determinism: base score is an integer tf; the demotion multiplies by
# the shared literal 0.5 (exact in binary), so both engines produce
# bit-identical doubles before the ROUND(.,6).
#
# Shape (100 TB): scan-local scoring (two token-array probes fused into
# one whole-stage-codegen projection) + TakeOrdered(20) — no shuffle
# beyond the top-k exchange, never a global sort.
# ---------------------------------------------------------------------------
_BOOST_NEG = 0.5


@register(
    "q314_boosting_query",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {_tf_sql("merge")} AS pos_tf,
             {_tf_sql("slow")} > 0 AS demoted
      FROM documents)
    SELECT doc_id, pos_tf, demoted,
           ROUND(pos_tf * (CASE WHEN demoted THEN {_BOOST_NEG} ELSE 1.0 END), 6)
             AS score
    FROM t WHERE pos_tf > 0
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q314_boosting_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        _tf_col("merge").alias("pos_tf"),
        (_tf_col("slow") > 0).alias("demoted"),
    )
    score = F.col("pos_tf") * F.when(
        F.col("demoted"), F.lit(_BOOST_NEG)
    ).otherwise(F.lit(1.0))
    return (
        t.filter(F.col("pos_tf") > 0)
        .select("doc_id", "pos_tf", "demoted", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q315 — ES `dis_max` query: per document, take the BEST of the
# subquery scores plus tie_breaker × the sum of the others:
#   score = max(s_i) + tie_breaker * (sum(s_i) - max(s_i))
# Subqueries here are term-frequency scores for three probe terms.
#
# Determinism: s_i are integer tfs; max/sum are exact; the single
# float multiply uses the shared 0.3 literal — identical doubles on
# both engines before ROUND(.,6).
#
# Shape (100 TB): one scan-local projection (all three tf probes fuse
# into one codegen stage over the same token array) + TakeOrdered(20).
# ---------------------------------------------------------------------------
_DM_TERMS = ("sort", "window", "scan")
_DM_TIE = 0.3


@register(
    "q315_dis_max",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {_tf_sql(_DM_TERMS[0])} AS tf0,
             {_tf_sql(_DM_TERMS[1])} AS tf1,
             {_tf_sql(_DM_TERMS[2])} AS tf2
      FROM documents)
    SELECT doc_id, tf0, tf1, tf2,
           ROUND(GREATEST(tf0, tf1, tf2)
                 + {_DM_TIE} * (tf0 + tf1 + tf2 - GREATEST(tf0, tf1, tf2)),
                 6) AS score
    FROM t WHERE tf0 + tf1 + tf2 > 0
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q315_dis_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        _tf_col(_DM_TERMS[0]).alias("tf0"),
        _tf_col(_DM_TERMS[1]).alias("tf1"),
        _tf_col(_DM_TERMS[2]).alias("tf2"),
    )
    best = F.greatest("tf0", "tf1", "tf2")
    total = F.col("tf0") + F.col("tf1") + F.col("tf2")
    score = best + F.lit(_DM_TIE) * (total - best)
    return (
        t.filter(total > 0)
        .select("doc_id", "tf0", "tf1", "tf2", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q316 — fill-in-the-middle (FIM) transform prep: per document, a
# deterministic prefix/middle/suffix split at token level (the PSM
# reordering used to build infilling training examples — Bavarian et
# al. 2022 style). The cut point derives from md5(doc_id), the middle
# span is n//4 tokens, and both prefix and suffix are guaranteed
# non-empty. The middle's md5 makes the split content-checkable
# without shipping the substring.
#
# Determinism: cut arithmetic is pure integer (md5-16bit % range, no
# floats, no engine RNG); the md5 of the space-joined middle matches
# across engines because tokenization is the shared normalize+split.
#
# Shape (100 TB): fully scan-local (one projection per doc, no
# shuffle at all except the driver's display sort) — embarrassingly
# parallel over document splits.
# ---------------------------------------------------------------------------
_FIM_MIN_TOKENS = 8


@register(
    "q316_fim_transform",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, toks, n_tokens,
             CAST(n_tokens // 4 AS BIGINT) AS span_len,
             CAST(2 + ({_md5_16bit_sql("CAST(doc_id AS VARCHAR)")})
                  % (n_tokens - (n_tokens // 4) - 1) AS BIGINT) AS fim_start
      FROM t WHERE n_tokens >= {_FIM_MIN_TOKENS})
    SELECT doc_id, n_tokens, fim_start, span_len,
           CAST(fim_start - 1 AS BIGINT) AS prefix_len,
           CAST(n_tokens - fim_start - span_len + 1 AS BIGINT) AS suffix_len,
           md5(array_to_string(toks[fim_start : fim_start + span_len - 1], ' '))
             AS middle_md5
    FROM c ORDER BY doc_id
    """,
)
def q316_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    t = t.withColumn("n_tokens", F.size("toks").cast("bigint")).filter(
        F.col("n_tokens") >= _FIM_MIN_TOKENS
    )
    span = (F.col("n_tokens") / 4).cast("bigint")  # floor for non-negative n
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    start = F.lit(2) + h % (F.col("n_tokens") - span - 1)
    c = t.select(
        "doc_id",
        "n_tokens",
        start.cast("bigint").alias("fim_start"),
        span.alias("span_len"),
        "toks",
    )
    middle = F.slice("toks", F.col("fim_start").cast("int"), F.col("span_len").cast("int"))
    return c.select(
        "doc_id",
        "n_tokens",
        "fim_start",
        "span_len",
        (F.col("fim_start") - 1).cast("bigint").alias("prefix_len"),
        (F.col("n_tokens") - F.col("fim_start") - F.col("span_len") + 1)
        .cast("bigint")
        .alias("suffix_len"),
        F.md5(F.concat_ws(" ", middle)).alias("middle_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q317 — matryoshka-embedding truncation audit: for each truncation
# dimension d ∈ {4, 8, 16, 32, 64}, the average fraction of a vector's
# energy (sum of squared components) retained by its first d
# components, per label. The standard readiness check before serving
# truncated MRL embeddings: if energy@16 ≈ 1.0 the index can run at
# 1/4 the dimensionality.
#
# Determinism: per-vector double folds are left-to-right identical
# (F.aggregate ↔ list_reduce, same CAST placement as q37's cosine);
# each per-vector fraction is ROUND(.,6) → DECIMAL(18,6) before the
# cross-row average (exact decimal sum, then one division and round).
#
# Shape (100 TB): the dims explode is a 5× row-local expansion BEFORE
# the groupBy, so the plan is one map-combinable shuffle keyed by
# (label, d) — 5 × |labels| result rows regardless of input size.
# ---------------------------------------------------------------------------
_MRL_DIMS = (4, 8, 16, 32, 64)


def _ssq_sql(v: str, d: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {d}+1),"
        f" i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


@register(
    "q317_matryoshka_energy",
    oracle=f"""
    WITH x AS (
      SELECT label, CAST(d AS BIGINT) AS d,
             ROUND({_ssq_sql("embedding", "d")}
                   / {_ssq_sql("embedding", "len(embedding)")}, 6) AS frac
      FROM embeddings, (SELECT UNNEST({list(_MRL_DIMS)!r}) AS d))
    SELECT label, d,
           CAST(COUNT(*) AS BIGINT) AS n_vec,
           ROUND(CAST(SUM(CAST(frac AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS avg_energy_frac
    FROM x GROUP BY label, d ORDER BY label, d
    """,
)
def q317_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def ssq(col: F.Column) -> F.Column:
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    x = (
        emb.withColumn("d", F.explode(F.array(*[F.lit(d) for d in _MRL_DIMS])))
        .withColumn("d", F.col("d").cast("bigint"))
        .select(
            "label",
            "d",
            F.round(
                ssq(F.slice("embedding", F.lit(1), F.col("d").cast("int")))
                / ssq(F.slice("embedding", F.lit(1), F.size("embedding"))),
                6,
            ).alias("frac"),
        )
    )
    return (
        x.groupBy("label", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vec"),
            F.round(
                F.sum(F.col("frac").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_energy_frac"),
        )
        .orderBy("label", "d")
    )
