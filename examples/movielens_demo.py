#!/usr/bin/env python
"""End-to-end demo: every job and endpoint of the reference stack, run
against the reference's own MovieLens-100k data on this engine alone
(no Elasticsearch, no Flask — one SparkSession).

Reference equivalents exercised:
  spark-submit preprocessing.py        → pipelines.preprocess
  spark-submit elasticsearch_ingest.py → pipelines.build_movie_index (+ JSONL sink)
  spark-submit model.py               → pipelines.train_recommendations
  POST /recommend                      → movierec.lookup_title + recommend_by_genre_overlap
  GET  /search?q=...                   → movierec.search_movies
  GET  /movie/<id>                     → term filter

Usage: python examples/movielens_demo.py [data_dir]  (default /root/reference/data)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark import pipelines
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators import movierec
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import get_spark


def main() -> None:
    data = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data"
    spark = get_spark("movielens-demo")

    print("== preprocess (ratings ⋈ movies) ==")
    processed = pipelines.preprocess(spark, f"{data}/u.data", f"{data}/u.item").cache()
    print(f"rows={processed.count()}, users={processed.select('userId').distinct().count()}")

    print("\n== movie index (genre name-arrays, no unpivot shuffle) ==")
    index = pipelines.build_movie_index(spark, f"{data}/u.item").cache()
    index.orderBy("movieId").show(3, truncate=60)

    print("== /recommend 'Toy Story' ==")
    status, hits = movierec.lookup_title(index, "Toy Story")
    print("lookup status:", status)
    hit = hits.first()
    movierec.recommend_by_genre_overlap(index, hit.movieId, list(hit.genres), k=5).show(truncate=50)

    print("== /search 'stor wars' (fuzzy, page 1) ==")
    movierec.search_movies(index, "stor wars", page=1, size=5).show(truncate=50)

    print("== /movie/50 ==")
    index.filter(F.col("movieId") == 50).show(truncate=60)

    print("== ALS top-10/user (seeded) ==")
    recs = pipelines.train_recommendations(spark, processed, k=10)
    recs.filter(F.col("userId") == 1).orderBy(F.desc("predicted_rating")).show(10)

    print("demo complete")


if __name__ == "__main__":
    main()
