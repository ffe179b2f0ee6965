"""ML / recommendation query catalog (SURVEY.md §2.9).

ALS is seeded but factorization VALUES aren't SQL-reproducible; q50
therefore oracle-checks the output's STRUCTURAL contract (coverage,
per-user k, item provenance, bounded scores — round-8 VERDICT task 7)
while tests/test_recommend.py holds the value-level behavioral line
(seeded RMSE slack). q51 is the deterministic, fully-oracled
collaborative baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import recommend as REC
from ..sources.readers import load_table
from .catalog import register


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit ratings from the star schema: customer × part with total
    ordered quantity as the rating signal (reference shape: userId ×
    movieId × rating, model.py:8)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .select(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
            F.col("qty").cast("float").alias("rating"),
        )
    )


# ALS factorization VALUES aren't expressible in ANSI SQL, but the
# output's STRUCTURAL contract is (round-8 VERDICT task 7): exactly k
# recommendations per user, every training user covered, every
# recommended item drawn from the training item set, every score
# finite and inside a generous pinned band. The query trains ALS, then
# folds the actual recommendation frame into one contract row; the
# oracle derives the same row purely from the INPUT tables (what the
# contract says MUST come out). A hash match means the pipeline
# honored the contract; the factorization values themselves stay
# behaviorally checked (seeded RMSE slack, tests/test_recommend.py).
_ALS_K = 5
# |predicted_rating| bound: ratings are summed l_quantity per
# (cust, part) — <= ~300 at any SF — so a seeded rank-8 ALS cannot
# legitimately reach 1e4; a blow-up here means divergence, not taste.
_ALS_BAND = 1.0e4


_ALS_CONTRACT_ORACLE = f"""
    WITH users AS (
      SELECT DISTINCT o.o_custkey AS u
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) * {_ALS_K} AS BIGINT) AS n_rows,
           CAST({_ALS_K} AS BIGINT) AS min_per_user,
           CAST({_ALS_K} AS BIGINT) AS max_per_user,
           CAST(0 AS BIGINT) AS n_unknown_items,
           CAST(0 AS BIGINT) AS n_bad_scores
    FROM users
    """


def _als_contract_fold(recs: DataFrame, ratings: DataFrame) -> DataFrame:
    """Fold a (user, item, score) rec frame into the one-row structural
    contract the q50/q402 oracle pins: coverage, per-user k, item
    provenance, bounded scores. Single pass: broadcast the training item
    set to mark unknown items, fold per-user, then one global fold —
    one shuffle (the per-user groupBy)."""
    items = ratings.select("item").distinct().withColumn("__known", F.lit(1))
    j = recs.join(F.broadcast(items), "item", "left")
    bad = (
        F.isnan("score")
        | F.col("score").isNull()
        | ~F.col("score").between(-_ALS_BAND, _ALS_BAND)
    )
    per_user = j.groupBy("user").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.when(F.col("__known").isNull(), 1).otherwise(0)).alias("unk"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("bad"),
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_per_user"),
        F.max("k").cast("bigint").alias("max_per_user"),
        F.sum("unk").cast("bigint").alias("n_unknown_items"),
        F.sum("bad").cast("bigint").alias("n_bad_scores"),
    )


@register("q50_als_recommend", oracle=_ALS_CONTRACT_ORACLE)
def q50_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ratings = _ratings(spark, sf_dir)
    model = REC.train_als(ratings, "user", "item", "rating", rank=8, max_iter=5, seed=42)
    recs = REC.als_recommendations(model, k=_ALS_K).select(
        "user", "item", F.col("predicted_rating").cast("double").alias("score")
    )
    return _als_contract_fold(recs, ratings)


@register("q402_als_ann_topk", oracle=_ALS_CONTRACT_ORACLE)
def q402_als_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe ALS batch scoring (round-10 VERDICT task 1): the same
    per-user top-k contract as q50, computed via PQ-cell coarse search +
    exact re-rank over the factor matrices instead of the users × items
    block-matmul ``recommendForAllUsers`` runs (reference src/model.py:13).
    Per-user cost O(cells + budget), independent of the item-catalog
    size; recall@k vs exact is pinned >= 0.95 at sf0.1
    (tests/test_recommend.py). Same structural oracle as q50 — exactly k
    recs per training user, items from the training set, bounded scores."""
    ratings = _ratings(spark, sf_dir)
    model = REC.train_als(ratings, "user", "item", "rating", rank=8, max_iter=5, seed=42)
    uf = model.userFactors.select(F.col("id").alias("id"), "features")
    itf = model.itemFactors.select(F.col("id").alias("id"), "features")
    # m/kcodes passed EXPLICITLY (ADVICE r11): the 2/16 = 256-cell
    # geometry was tuned for exactly this rank-8 / budget-4608 call and
    # its recall pin; callers at other ranks must re-validate.
    recs = REC.ann_factor_topk(
        uf, itf, rank=8, k=_ALS_K, cand_budget=4608, m=2, kcodes=16, lloyd_iters=3
    ).select("user", "item", F.col("predicted_rating").cast("double").alias("score"))
    return _als_contract_fold(recs, ratings)


@register(
    "q51_popular_unseen",
    oracle="""
    WITH inter AS (
      SELECT o.o_custkey AS cust, l.l_partkey AS item
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    pop AS (SELECT item, COUNT(*) AS popularity FROM inter GROUP BY item),
    usr AS (SELECT c_custkey AS cust FROM customer WHERE c_custkey <= 20),
    cand AS (
      SELECT u.cust, p.item, p.popularity FROM usr u CROSS JOIN pop p
      WHERE NOT EXISTS (SELECT 1 FROM inter i WHERE i.cust = u.cust AND i.item = p.item)),
    ranked AS (
      SELECT cust, item, popularity,
             ROW_NUMBER() OVER (PARTITION BY cust ORDER BY popularity DESC, item ASC) AS rec_rank
      FROM cand)
    SELECT cust, item, popularity, rec_rank FROM ranked WHERE rec_rank <= 3
    """,
)
def q51_popular_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    inter = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("item")
    )
    users = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 20)
        .select(F.col("c_custkey").alias("cust"))
    )
    return REC.popular_unseen(inter, "cust", "item", users, k=3)
