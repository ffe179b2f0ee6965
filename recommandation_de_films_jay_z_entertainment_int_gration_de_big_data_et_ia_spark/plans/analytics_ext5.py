"""Round-8 catalog extensions — the remaining ES aggregation surface
flagged by the round-7 review (`top_hits`, `scripted_metric`,
`geo_shape` polygon containment, `reverse_nested`) plus further
LLM-pipeline operators.

Reference context: the reference delegates all querying to the full ES
stack (docker-compose.yml:32); these are core ES constructs any user of
that stack can issue, re-expressed as native DataFrame plans. The
reference API's own hit lists are size-bounded per query
(src/api.py:93,149) — `top_hits` is the aggregation-side version of
exactly that shape.

Determinism discipline (see catalog.py): integer arithmetic generated
as literals for geometry (no engine float builtins), per-bucket folds
over explicitly sorted lists (F.aggregate ↔ list_reduce after
list_prepend-ed init), exact DECIMAL sums before any average, ROUND at
the surface only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import scripted_metric, top_hits
from ..sources.readers import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# q346 — ES `top_hits` aggregation: the canonical group-by-with-
# examples. Buckets = documents.source (terms agg); per bucket the
# bucket's doc_count plus its top-3 full documents by (n_chars DESC,
# doc_id) — doc fields surfaced verbatim, text as md5 fingerprint.
#
# Shape (100 TB): WindowGroupLimit prunes each source partition's sort
# to 3 rows before the exchange; the per-source counts aggregate is
# |sources| rows, broadcast back onto the 3·|sources| hits. See
# operators/relational.py:top_hits for why this beats a COUNT-over-
# partition window (that would defeat the group-limit pushdown).
# ---------------------------------------------------------------------------
_TH_K = 3


@register(
    "q346_top_hits",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS doc_count
      FROM documents GROUP BY source),
    r AS (
      SELECT source, doc_id, n_chars, lang, md5(text) AS text_md5,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS hit_rank
      FROM documents)
    SELECT r.source, c.doc_count, CAST(r.hit_rank AS INT) AS hit_rank,
           r.doc_id, r.n_chars, r.lang, r.text_md5
    FROM r JOIN c ON r.source = c.source
    WHERE r.hit_rank <= {_TH_K}
    ORDER BY r.source, r.hit_rank
    """,
)
def q346_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", "lang", F.md5("text").alias("text_md5")
    )
    out = top_hits(
        docs,
        bucket_by=["source"],
        order=[F.desc("n_chars"), F.asc("doc_id")],
        k=_TH_K,
        hit_cols=["doc_id", "n_chars", "lang", "text_md5"],
    )
    return out.select(
        "source", "doc_count", "hit_rank", "doc_id", "n_chars", "lang", "text_md5"
    ).orderBy("source", "hit_rank")


# ---------------------------------------------------------------------------
# q347 — ES `scripted_metric` aggregation analog: an order-dependent
# per-bucket fold no built-in agg expresses — here an exponentially
# decayed sum of document lengths in doc_id order (state' = state/2 +
# n_chars), the kind of "recency-weighted total" ES users write as a
# map/combine/reduce script. Reusable operator:
# operators/relational.py:scripted_metric (rank-capped buckets, sorted
# fold — deterministic where real ES scripted_metric is shard-order-
# dependent).
#
# Determinism: the fold is left-to-right over the doc_id-sorted list on
# both engines (F.aggregate ↔ list_reduce with a list_prepend-ed 0.0
# init); 0.5 is exact in binary; one ROUND(.,4) at the surface.
#
# Shape (100 TB): rank window caps each bucket at 10k rows BEFORE
# collect_list (WindowGroupLimit), one shuffle on source; result is
# |sources| rows.
# ---------------------------------------------------------------------------
_SM_CAP = 10_000


@register(
    "q347_scripted_metric",
    oracle=f"""
    WITH d AS (
      SELECT source, list(CAST(n_chars AS DOUBLE) ORDER BY doc_id) AS xs,
             CAST(COUNT(*) AS BIGINT) AS doc_count
      FROM documents GROUP BY source)
    SELECT source, doc_count,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), xs[1:{_SM_CAP}]),
                             (acc, x) -> acc * 0.5 + x), 4) AS decayed_len
    FROM d ORDER BY source
    """,
)
def q347_scripted_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    out = scripted_metric(
        docs,
        bucket_by=["source"],
        order_by=["doc_id"],
        map_cols=["n_chars"],
        init=F.lit(0.0),
        fold=lambda acc, row: acc * F.lit(0.5) + row["n_chars"].cast("double"),
        cap=_SM_CAP,
        metric_col="decayed_len",
    )
    return out.select(
        "source", "doc_count", F.round("decayed_len", 4).alias("decayed_len")
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q348 — ES `geo_shape` query, polygon containment: which points fall
# inside a (non-convex) polygon, counted per nation. Ray-cast with the
# half-open crossing rule, done ENTIRELY in integer arithmetic on the
# 0..999 lattice (points derive from c_custkey exactly like q340's
# geohash lattice): for edge (x1,y1)->(x2,y2) a rightward ray from
# (px,py) crosses iff (y1>py) != (y2>py) and the signed area test
# t = (x1-px)*dy + (x2-x1)*(py-y1) has dy's sign — the division-free
# form of px < x_edge(py). Unrolled per edge as generated literals, so
# both engines evaluate the identical integer expression.
#
# Shape (100 TB): scan-local — one constant-depth integer projection
# per point (whole-stage codegen), then a map-combinable count keyed by
# nation; no join, no geometry library.
# ---------------------------------------------------------------------------
_GS_POLY = (  # non-convex pentagon-ish arrow on the 0..999 lattice
    (100, 100),
    (900, 150),
    (500, 450),
    (850, 800),
    (150, 850),
    (400, 500),
)


def _ray_cast_sql(px: str, py: str) -> str:
    """Generated integer crossing-count expression (DuckDB + Spark SQL
    share this string verbatim — both support CASE/AND/comparison)."""
    terms = []
    n = len(_GS_POLY)
    for i in range(n):
        x1, y1 = _GS_POLY[i]
        x2, y2 = _GS_POLY[(i + 1) % n]
        dy = y2 - y1
        if dy == 0:
            continue  # horizontal edge never crosses a horizontal ray
        spans = f"(({y1} > {py}) != ({y2} > {py}))"
        t = f"(({x1} - {px}) * {dy} + {x2 - x1} * ({py} - {y1}))"
        side = f"{t} > 0" if dy > 0 else f"{t} < 0"
        terms.append(f"(CASE WHEN {spans} AND ({side}) THEN 1 ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


@register(
    "q348_geo_shape_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT c_nationkey,
             (c_custkey * 104729) % 1000 AS px,
             (c_custkey * 7919) % 1000 AS py
      FROM customer)
    SELECT CAST(c_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM({_ray_cast_sql("px", "py")} % 2) AS BIGINT) AS n_inside
    FROM pts GROUP BY c_nationkey ORDER BY nationkey
    """,
)
def q348_geo_shape_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        ((F.col("c_custkey") * 104729) % 1000).alias("px"),
        ((F.col("c_custkey") * 7919) % 1000).alias("py"),
    )
    inside = F.expr(f"{_ray_cast_sql('px', 'py')} % 2")
    return (
        pts.select("nationkey", inside.alias("inside"))
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("inside").cast("bigint").alias("n_inside"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# q349 — ES `reverse_nested` aggregation: bucket on a NESTED field,
# then hop back up to the parent document level for sub-aggs. Model:
# lineitem rows are the nested docs inside their order; bucket by
# l_returnflag (nested terms agg → nested_hits), reverse_nested →
# count of DISTINCT parent orders per bucket plus a parent-level
# metric (avg o_totalprice of those parents). Completes the hierarchy
# family: q264/q265 (has_child/has_parent queries), q266 (nested
# query), q333 (children agg) — this is the child→parent agg direction.
#
# Determinism: parent average via exact DECIMAL(18,4) sum then one
# division + ROUND(.,4).
#
# Shape (100 TB): the distinct (orderkey, flag) pairs collapse ~4x in
# a map-side partial before one shuffle; the orders join is key-co-
# partitioned on orderkey; both per-flag aggregates are 3-row frames
# joined broadcast. No row ever carries the parent payload before the
# distinct collapses the nested side.
# ---------------------------------------------------------------------------
@register(
    "q349_reverse_nested",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS returnflag, CAST(COUNT(*) AS BIGINT) AS nested_hits
      FROM lineitem GROUP BY 1),
    p AS (
      SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem),
    pa AS (
      SELECT p.l_returnflag AS returnflag,
             CAST(COUNT(*) AS BIGINT) AS parent_count,
             ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*), 4) AS avg_parent_price
      FROM p JOIN orders o ON p.l_orderkey = o.o_orderkey GROUP BY 1)
    SELECT b.returnflag, b.nested_hits, pa.parent_count, pa.avg_parent_price
    FROM b JOIN pa ON b.returnflag = pa.returnflag
    ORDER BY b.returnflag
    """,
)
def q349_reverse_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    nested = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nested_hits")
    )
    parents = li.select("l_orderkey", "l_returnflag").distinct()
    parent_agg = (
        parents.join(orders, parents["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("parent_count"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_parent_price"),
        )
    )
    return (
        nested.join(F.broadcast(parent_agg), "returnflag")
        .select("returnflag", "nested_hits", "parent_count", "avg_parent_price")
        .orderBy("returnflag")
    )
