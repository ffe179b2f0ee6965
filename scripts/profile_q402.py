#!/usr/bin/env python
"""Staged noop profile of q402_als_ann_topk (guide §1.4): time each
stage of the pipeline separately so the optimization targets the real
cost, not the guess. Writes one line per stage to stdout.

Usage: python scripts/profile_q402.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f}s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-q402")
    spark.range(1).count()  # warm

    from pyspark.sql import functions as F

    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators import (
        recommend as REC,
    )
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.plans.ml import (
        _ALS_K,
        _als_contract_fold,
        _ratings,
    )

    ratings = t("ratings build+noop", lambda: (_ratings(spark, sf_dir),))[0]
    t("ratings noop", lambda: noop(ratings))
    model = t(
        "ALS train",
        lambda: REC.train_als(
            ratings, "user", "item", "rating", rank=8, max_iter=5, seed=42
        ),
    )
    uf = model.userFactors.select(F.col("id").alias("id"), "features")
    itf = model.itemFactors.select(F.col("id").alias("id"), "features")
    recs = t(
        "ann_factor_topk plan-build (incl. driver actions)",
        lambda: REC.ann_factor_topk(
            uf, itf, rank=8, k=_ALS_K, cand_budget=4608, lloyd_iters=3
        ),
    )
    t("final exec noop (recs)", lambda: noop(recs))
    out = _als_contract_fold(
        recs.select("user", "item", F.col("predicted_rating").cast("double").alias("score")),
        ratings,
    )
    t("contract fold noop", lambda: noop(out))

    # end-to-end, fresh, bench-identical
    import __spark_entry__ as entrymod

    q = entrymod.queries()["q402_als_ann_topk"]
    for i in range(3):
        t0 = time.time()
        noop(q(spark, sf_dir))
        print(f"end-to-end run {i}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
