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

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.plan import with_once


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


# ---------------------------------------------------------------------------
# Scale-safe ALS batch top-k (round-10 VERDICT task 1, q402).
#
# ``recommendForAllUsers`` is a users × items block-matmul: growing both
# factors 10x makes the sf10 point ~100x FLOPs — the catalog's one
# quadratic operator (killed at >26 min in SCALE_r10.md). The machinery
# to make it linear already ships in this engine (q148 PQ codebooks,
# q149 ADC LUT scoring, q234 two-stage re-rank, q287 recall audit); this
# operator wires them to the factor matrices:
#
#   1. Product-quantize the ITEM factor matrix: m subspaces of the
#      rank-d vector, a tiny per-subspace codebook (Lloyd iterations
#      with the codebook as a broadcast nested array — assignment is a
#      per-row expression, never a shuffle), items grouped into product
#      cells (cell = the m-tuple of code ids). kcodes adapts to the
#      catalog size so cell count tracks items (IVF's sqrt-N discipline,
#      capped): per-user coarse cost stays O(cells), bounded.
#   2. Coarse stage, map-only over USERS: the whole index (per-subspace
#      codebooks + occupied-cell directory with item counts) folds into
#      ONE broadcast row (index metadata, the _centroid_frame idiom —
#      ~cells x (m bytes + count), no driver collect). Each user row
#      computes its ADC LUT (m x kcodes sub-dots) once, scores every
#      cell by m LUT lookups, sorts cells, and keeps the best cells
#      until their cumulative item count reaches the candidate budget.
#      No users x cells explode, no shuffle: one projection.
#   3. Exact re-rank: selected (user, cell) pairs join the item-cell
#      table on cell_key — shuffle_hash BOTH sides (both corpus-scaled;
#      never leave a corpus-scaled side broadcastable, the round-10
#      OOM lesson) — exact dot(u, i) on ~budget candidates per user,
#      top-k per user via WindowGroupLimit.
#
# Per-user cost is O(cells + budget), independent of |items|; total cost
# is linear in users + items. Recall vs exact recommendForAllUsers is
# pinned >= 0.95 at sf0.1 (tests/test_recommend.py); at sf <= 0.01 the
# budget covers the whole catalog and the result is exact.
# Reference anchor: src/model.py:13 (recommendForAllUsers(10)).
# ---------------------------------------------------------------------------


def _sub_slices(vec_col, rank: int, m: int):
    """array<array<double>>: the m contiguous rank/m-dim subvectors."""
    sub = rank // m
    return F.array(
        *[
            F.transform(F.slice(vec_col, s * sub + 1, sub), lambda x: x.cast("double"))
            for s in range(m)
        ]
    )


def _dotd(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_factor_codebook(
    itf: DataFrame, id_col: str, vec_col: str, rank: int, m: int, kcodes: int,
    lloyd_iters: int = 2,
) -> DataFrame:
    """Train per-subspace codebooks over a factor matrix; returns the
    1-row nested-array frame ``cents[s][cid] -> array<double>`` (seeded
    init = the kcodes lowest-id vectors, then ``lloyd_iters`` rounds of
    expression-side assignment + partial-agg mean update; every shuffle
    in here is a <= m*kcodes*dims-group partial aggregate)."""
    sub = itf.select(
        F.col(id_col).alias("__pid"),
        F.posexplode(_sub_slices(F.col(vec_col), rank, m)).alias("s", "sv"),
    )
    seeds = itf.orderBy(id_col).limit(kcodes).select(
        F.col(id_col).alias("__pid"),
        F.posexplode(_sub_slices(F.col(vec_col), rank, m)).alias("s", "sv"),
    )
    w_seed = Window.partitionBy("s").orderBy("__pid")
    cent = seeds.select(
        "s", (F.row_number().over(w_seed) - 1).cast("int").alias("cid"), F.col("sv").alias("c")
    )

    def nest(cent_df: DataFrame) -> DataFrame:
        """(s, cid, c) -> one row: cents[s][cid] = c (cid-sorted per s,
        s-sorted outer)."""
        per_s = cent_df.groupBy("s").agg(
            F.array_sort(F.collect_list(F.struct("cid", "c"))).alias("cs")
        )
        return per_s.agg(
            F.array_sort(F.collect_list(F.struct("s", "cs"))).alias("__o")
        ).select(
            F.transform(
                "__o", lambda o: F.transform(o["cs"], lambda e: e["c"])
            ).alias("cents")
        )

    dim = rank // m
    for _ in range(lloyd_iters):
        with_c = sub.crossJoin(F.broadcast(nest(cent)))
        # Pin the distance fold to ONE evaluation per row: the
        # array_position/array_min pair below references it twice, and
        # interpreted lambdas do no CSE (functions/plan.with_once).
        dists = F.transform(
            F.element_at("cents", F.col("s") + 1), lambda cvec: _l2(F.col("sv"), cvec)
        )
        with_d = with_once(with_c, "__d", dists)
        assigned = with_d.select(
            "__pid", "s", "sv",
            (F.array_position("__d", F.array_min("__d")) - 1).cast("int").alias("cid"),
        )
        # Mean update in ONE partial-aggregatable shuffle: element-wise
        # avg per (s, cid) with the sub-dimension unrolled statically
        # (dim = rank/m is a small constant), instead of the
        # posexplode -> groupBy(s,cid,pos) -> re-nest double shuffle.
        cent = assigned.groupBy("s", "cid").agg(
            F.array(*[F.avg(F.col("sv")[i]) for i in range(dim)]).alias("c")
        )
        # codebook is <= m*kcodes tiny rows but its lineage re-scans the
        # corpus per round; pin it so each Lloyd round scans once
        cent = cent.localCheckpoint(eager=True)
    return nest(cent)


def pq_assign_cells(
    itf: DataFrame, cents1: DataFrame, id_col: str, vec_col: str,
    rank: int, m: int, kcodes: int,
) -> DataFrame:
    """(id, features, cell_key): nearest-code product-cell assignment —
    one corpus scan, assignment fully in-expression against the
    broadcast codebook row."""
    with_c = itf.crossJoin(F.broadcast(cents1))
    subs = _sub_slices(F.col(vec_col), rank, m)
    cids = F.zip_with(
        subs,
        F.col("cents"),
        lambda sv, sc: (
            F.array_position(
                F.transform(sc, lambda cvec: _l2(sv, cvec)),
                F.array_min(F.transform(sc, lambda cvec: _l2(sv, cvec))),
            )
            - 1
        ).cast("int"),
    )
    key = F.aggregate(
        cids, F.lit(0), lambda acc, c: acc * F.lit(kcodes) + c
    ).cast("int")
    return with_c.select(
        F.col(id_col), F.col(vec_col), key.alias("cell_key"),
        cids.alias("__cids"),
    )


def ann_factor_topk(
    uf: DataFrame,
    itf: DataFrame,
    rank: int,
    k: int,
    cand_budget: int = 2048,
    m: int = 2,
    user_col: str = "user",
    item_col: str = "item",
    score_col: str = "predicted_rating",
    kcodes: int | None = None,
    lloyd_iters: int = 2,
) -> DataFrame:
    """Approximate batch top-k over ALS factors: (user, item, score) with
    exactly k rows per user (budget >= k guaranteed by whole-cell
    selection). See the module-level design note."""
    import numpy as np
    import pandas as pd

    n_items = itf.count()
    if kcodes is None:
        kcodes = 16  # kcodes^m product cells (16^2 = 256 at the default m)
    kcodes = min(kcodes, max(2, n_items))

    cents1 = pq_factor_codebook(
        itf, "id", "features", rank, m, kcodes, lloyd_iters=lloyd_iters
    )
    item_cells = pq_assign_cells(itf, cents1, "id", "features", rank, m, kcodes)

    # Occupied-cell directory: (cell_key, reconstructed centroid, item
    # count) — index METADATA, <= kcodes^m (4096) rows regardless of
    # corpus size. Collected once on the driver and shipped to executors
    # as a broadcast variable for the numpy coarse stage; this is the
    # same information _centroid_frame ships as a 1-row broadcast frame,
    # in the representation the BLAS kernel wants. (The DATA — user and
    # item factors — never touches the driver.)
    spark = itf.sparkSession
    cells_rows = sorted(
        item_cells.groupBy("cell_key")
        .agg(F.count(F.lit(1)).alias("n"), F.first("__cids").alias("cids"))
        .collect(),
        key=lambda r: r["cell_key"],
    )
    cents = cents1.collect()[0]["cents"]  # [s][cid] -> sub-centroid
    keys_np = np.array([r["cell_key"] for r in cells_rows], dtype=np.int64)
    counts_np = np.array([r["n"] for r in cells_rows], dtype=np.int64)
    vecs_np = np.array(
        [np.concatenate([cents[s][c] for s, c in enumerate(r["cids"])]) for r in cells_rows],
        dtype=np.float64,
    )
    bc = spark.sparkContext.broadcast((keys_np, vecs_np, counts_np))
    budget = int(cand_budget)

    # Coarse stage, map-only over USERS (no shuffle): one BLAS matmul of
    # each Arrow batch against the cell-centroid matrix, stable argsort
    # (score desc, ties -> lower cell_key: the directory is key-sorted),
    # then keep whole cells until the cumulative item count reaches the
    # budget. This is the engine's sanctioned vectorized-Python boundary
    # (SURVEY §2.8: Arrow batches + numpy kernels where per-row JVM
    # folds would interpret — a dense d x cells product per user is
    # exactly that case; the HOF-expression formulation measured ~19 ms
    # per user vs microseconds here).
    coarse_schema = (
        f"{user_col} int, __uf array<double>, cell_key int"
    )

    def _coarse(batches):
        keys, vecs, counts = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            U = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__uf"]])
            S = U @ vecs.T  # n_users_batch x n_cells
            order = np.argsort(-S, axis=1, kind="stable")
            cnt_o = counts[order]
            csum = cnt_o.cumsum(axis=1)
            sel = (csum - cnt_o) < budget  # cells that start under budget
            n_sel = sel.sum(axis=1)
            uidx = np.repeat(np.arange(len(pdf)), n_sel)
            yield pd.DataFrame(
                {
                    user_col: pdf[user_col].to_numpy()[uidx],
                    "__uf": pdf["__uf"].to_numpy()[uidx],
                    "cell_key": keys[order[sel]],
                }
            )

    u = uf.select(
        F.col("id").cast("int").alias(user_col),
        F.transform("features", lambda x: x.cast("double")).alias("__uf"),
    )
    probes = u.mapInPandas(_coarse, coarse_schema)

    # Exact re-rank, cogrouped by cell: users probing a cell meet that
    # cell's items in one matmul; only the per-(user, cell) top-k leaves
    # the kernel (top-k of a union == top-k over per-cell top-ks), so
    # the Arrow boundary emits ~k * cells_probed rows per user, never
    # the full budget x users candidate set. Ties break item-ascending
    # (items are column-sorted; stable argsort). The global per-user
    # top-k merge stays JVM-side (WindowGroupLimit).
    items_side = item_cells.select(
        "cell_key",
        F.col("id").cast("int").alias(item_col),
        F.transform("features", lambda x: x.cast("double")).alias("__if"),
    )
    out_schema = f"{user_col} int, {item_col} int, {score_col} double"

    def _cell_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {user_col: pd.Series(dtype="int32"),
                 item_col: pd.Series(dtype="int32"),
                 score_col: pd.Series(dtype="float64")}
            )
        right = right.sort_values(item_col)
        U = np.stack([np.asarray(v, dtype=np.float64) for v in left["__uf"]])
        I = np.stack([np.asarray(v, dtype=np.float64) for v in right["__if"]])
        S = U @ I.T
        kk = min(k, S.shape[1])
        top = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        uidx = np.repeat(np.arange(len(left)), kk)
        iidx = top.ravel()
        return pd.DataFrame(
            {
                user_col: left[user_col].to_numpy()[uidx],
                item_col: right[item_col].to_numpy()[iidx],
                score_col: S[uidx, iidx],
            }
        )

    exact = (
        probes.groupBy("cell_key")
        .cogroup(items_side.groupBy("cell_key"))
        .applyInPandas(_cell_topk, out_schema)
    )
    w = Window.partitionBy(user_col).orderBy(F.desc(score_col), F.asc(item_col))
    return (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
