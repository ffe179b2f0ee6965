"""Recommendation operators (SURVEY.md §2.9, M1–M2).

The reference trains ALS on (userId, movieId, rating) and materializes
top-10-per-user (``src/model.py:10-15``). Here:

- :func:`train_als` — MLlib ALS with a FIXED seed (the reference leaves the
  seed unset, which breaks reproducibility; §7.3 risk table);
- :func:`als_recommendations` — ``recommendForAllUsers(k)`` flattened via
  explode + struct access (the reference's N2/N3 operators);
- :func:`popular_unseen` — a deterministic, oracle-checkable collaborative
  baseline: globally-popular items each user has *not* interacted with
  (anti join + global popularity + per-user top-k), the classic cold-start
  fallback. Scale shape: popularity is a small broadcast; the anti join
  shuffles on (user, item) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_als(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    rating_col: str,
    rank: int = 8,
    max_iter: int = 5,
    reg_param: float = 0.01,
    seed: int = 42,
):
    """M1: ALS matrix factorization (reference config: maxIter=10,
    regParam=0.01, default rank 10 — model.py:10-11 — trimmed here for the
    test harness; every iteration is a pair of distributed solves)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        coldStartStrategy="drop",
    )
    return als.fit(ratings)


def als_recommendations(model, k: int, user_col: str = "user", item_col: str = "item") -> DataFrame:
    """M2 + N2/N3: top-k per user, flattened to (user, item, predicted_rating)."""
    recs = model.recommendForAllUsers(k)
    exploded = recs.select(
        F.col(recs.columns[0]).alias(user_col), F.explode("recommendations").alias("rec")
    )
    return exploded.select(
        user_col,
        F.col("rec.*"),
    ).toDF(user_col, item_col, "predicted_rating")


def popular_unseen(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    users: DataFrame,
    k: int = 3,
    max_seen_per_user: int | None = 1000,
) -> DataFrame:
    """Top-k globally-popular items each user hasn't interacted with.

    ``users`` is the user frame to recommend for. Popularity ranks break
    ties by item id — fully deterministic.

    ``max_seen_per_user`` bounds candidate generation: popularity is
    truncated to the top-``k + max_seen_per_user`` items (a distributed
    partial top-k, ``TakeOrderedAndProject``) before the cross join, so
    candidates are O(|users| · (k + bound)) instead of |users| × |items| —
    the difference between a broadcastable frame and a cartesian
    scale-killer when ``users`` is the full user table. The result is
    IDENTICAL to the exact semantics whenever every cohort user has
    interacted with at most ``max_seen_per_user`` distinct items (then at
    least k of their top-``k + bound`` candidates are unseen, and any
    truncated item ranks below all of them). Pass ``None`` only for small
    cohorts where the full-popularity cross join is affordable.
    """
    pop = (
        interactions.groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("popularity"))
    )
    if max_seen_per_user is not None:
        # same (popularity DESC, item ASC) order as the ranking below, so
        # truncation never reorders ties across the cut
        pop = pop.orderBy(F.desc("popularity"), F.asc(item_col)).limit(
            k + max_seen_per_user
        )
    cand = users.crossJoin(F.broadcast(pop))
    seen = interactions.select(user_col, item_col).distinct()
    unseen = cand.join(seen, on=[user_col, item_col], how="left_anti")
    w = Window.partitionBy(user_col).orderBy(F.desc("popularity"), F.asc(item_col))
    return (
        unseen.withColumn("rec_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rec_rank") <= k)
        .select(user_col, item_col, "popularity", "rec_rank")
    )
