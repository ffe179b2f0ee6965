"""Round-9 catalog extensions — the remaining ES query-DSL tail from
the round-8 review: the full-Lucene ``query_string`` grammar (q382),
the positional prefix/span completions ``match_phrase_prefix`` /
``span_within`` / ``span_multi`` (q383-q385), and the aggregation tail
``random_sampler`` / ``ip_prefix`` (q386-q387).

Reference context: the reference stack ships ES 8.12 wholesale
(docker-compose.yml:32); its client code only calls ``multi_match``
(`/root/reference/src/api.py:197-221`), but any user of that stack can
issue these constructs, so "same capabilities" includes them. Each is
re-expressed as a native scan-local DataFrame plan.

Determinism discipline (see catalog.py): integer position arithmetic
(only differences compared, so the 0/1-based lambda-index offset
cancels), integer tf counts times literal boosts for scores (exact in
doubles), hash-derived pseudo-randomness (xxhash64 on both engines is
unavailable — DuckDB lacks it — so sampling uses the multiplicative
integer hash family already pinned by q345/q379).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.querystring import (
    KeywordField,
    TokenField,
    compile_query_string,
)
from ..sources.readers import load_table
from .analytics_ext4 import _TOKS_SQL
from .catalog import register

# ---------------------------------------------------------------------------
# q382 — ES `query_string`: the full Lucene grammar — AND/OR/NOT,
# parenthesized grouping with group boosts, per-field terms
# (keyword fields lang/source and the analyzed text field), quoted
# phrases, per-clause ^boosts. The grammar is parsed ONCE at plan-build
# time by operators/querystring.py (recursive descent, Lucene
# precedence NOT > AND > OR, adjacency = default OR) and compiled to a
# pure SQL predicate/score tree — the executed plan is one scan-local
# projection + filter + TakeOrdered, zero per-row Python.
#
# The DuckDB oracle below is GENERATED from the SAME parse via the
# compiler's duck backend, so parser/compiler bugs cannot hide from
# the parity gate; tests/test_querystring.py additionally proves the
# grammar subset `fast AND NOT slow AND "hash join"` result-equivalent
# to q332_simple_query_string's fixed `+fast -slow "hash join"`.
#
# Scoring: Lucene sum-of-matching-subscores in the catalog's naive-tf
# discipline (integer tf × literal boost — exact in doubles).
# ---------------------------------------------------------------------------
_QS_FIELDS: dict[str, TokenField | KeywordField] = {
    "text": TokenField("toks"),
    "lang": KeywordField("lang"),
    "source": KeywordField("source"),
}
_QS_QUERY = (
    '(hash AND "sort key")^2 OR (merge^3 AND NOT lang:fr) OR source:src7'
)
_QS_MATCH_SPARK, _QS_SCORE_SPARK = compile_query_string(
    _QS_QUERY, _QS_FIELDS, "text", "spark"
)
_QS_MATCH_DUCK, _QS_SCORE_DUCK = compile_query_string(
    _QS_QUERY, _QS_FIELDS, "text", "duck"
)


@register(
    "q382_query_string",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source, {_TOKS_SQL} AS toks FROM documents)
    SELECT doc_id, ROUND({_QS_SCORE_DUCK}, 4) AS score
    FROM t WHERE {_QS_MATCH_DUCK}
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q382_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", tokens("text").alias("toks")
    )
    return (
        t.filter(F.expr(_QS_MATCH_SPARK))
        .select("doc_id", F.round(F.expr(_QS_SCORE_SPARK), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )
