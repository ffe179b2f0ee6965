"""ML / recommendation query catalog (SURVEY.md §2.9).

ALS is seeded but factorization isn't SQL-reproducible, so q50 is a
rows-only check (driver contract explicitly allows this); q51 is the
deterministic, fully-oracled collaborative baseline.
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


# rows-only: ALS factorization isn't expressible in ANSI SQL (driver
# records the weaker rows-only check; SURVEY §5.2 behavioral assertions
# live in tests/test_recommend.py).
@register("q50_als_recommend")
def q50_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ratings = _ratings(spark, sf_dir)
    model = REC.train_als(ratings, "user", "item", "rating", rank=8, max_iter=5, seed=42)
    recs = REC.als_recommendations(model, k=5)
    return recs.select("user", "item", F.round("predicted_rating", 3).alias("predicted_rating"))


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
