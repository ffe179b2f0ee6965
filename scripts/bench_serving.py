#!/usr/bin/env python
"""Online-serving latency bench (round-9 verdict task 4): the
reference's second engine role is INTERACTIVE search (size-5 top-k,
reference src/api.py:91-221), so the published numbers need a latency
axis beside batch throughput.

Measures per-request wall-clock for the four serving endpoints
(serving.py — the pure request->DataFrame->JSON functions http_api.py
wraps 1:1) against the PERSISTED MovieIndex parquet tables (the
production path: every request is an index probe + top-k collect, never
a corpus re-tokenize — plan-guarded by tests/test_serving.py). Request
mix rotates deterministically over real corpus titles/ids/queries so
no per-request plan or result is cached into triviality.

Writes BENCH_serving_r11.json: per-endpoint p50/p95/max + request count
+ cpu_ref machine-speed reference; tests/test_serving_latency.py holds
the regression bound against the committed artifact.

Usage: python scripts/bench_serving.py [n_requests_per_endpoint]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark import (  # noqa: E402
    pipelines,
    serving,
)
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators import (  # noqa: E402
    movierec,
)
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)

DATA = "/root/reference/data"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "BENCH_serving_r12.json")
IDX_DIR = os.path.join(HERE, ".tmp", "movieindex_bench")

# Deterministic request mixes drawn from the MovieLens corpus: exact
# titles (unambiguous + ambiguous + genre-less fallback), raw ids, and
# fuzzy/multi-term search strings, cycled round-robin per request.
RECOMMEND_TITLES = [
    "Toy Story (1995)", "GoldenEye (1995)", "Four Rooms (1995)",
    "Get Shorty (1995)", "Copycat (1995)", "Twelve Monkeys (1995)",
    "Babe (1995)", "Dead Man Walking (1995)", "Richard III (1995)",
    "Seven (Se7en) (1995)",
]
MOVIE_IDS = ["1", "50", "100", "181", "258", "300", "405", "655", "1000", "1500"]
SEARCH_QS = [
    "star wars", "stor wars", "toy story", "godfather", "the lost world",
    "batman", "alien", "love", "night", "dead man",
]


def _cpu_ref_1t() -> float:
    t0 = time.time()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    return round(time.time() - t0, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    # Serving-tier session conf (round-10 task 4): an online endpoint
    # tier sizes its shuffle width to its request working set, not to
    # the batch catalog's — every /search request moves a few thousand
    # rows, so 32-task shuffles and AQE's per-stage re-planning rounds
    # are pure scheduling latency here. 1 reducer + static plans is the
    # standard low-latency posture (the batch engine keeps its own
    # defaults; results are identical either way — tests/test_serving.py
    # runs the same endpoints under the default conf).
    spark = get_spark(
        "serving-bench",
        extra_conf={
            "spark.sql.shuffle.partitions": "1",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.range(1).count()

    # Build once, persist, serve from the parquet-backed index — the
    # production layout (SURVEY §3.3; index build is offline, requests
    # only probe).
    frame = pipelines.build_movie_index(spark, f"{DATA}/u.item")
    built = movierec.build_movie_index_tables(frame)
    # Persist docs + postings + the prebuilt terms dictionary (round-10
    # task 4: vocab moves to index-build time); both serving postures
    # load through the PIT-pinned reader (round-10 task 7) so concurrent
    # index rebuilds can't leak into open paginated sessions.
    movierec.write_movie_index(built, IDX_DIR)
    idx_parquet = movierec.load_movie_index(spark, IDX_DIR, pinned=True)
    # The hot-serving posture: ES keeps its index in the page cache /
    # heap; the Spark analog is an explicitly cached index frame. Both
    # variants are measured — parquet = cold-ish storage probe, cached =
    # steady-state production serving.
    pinned = movierec.load_movie_index(spark, IDX_DIR, pinned=True)
    idx_cached = movierec.MovieIndex(
        docs=pinned.docs.cache(),
        postings=pinned.postings.cache(),
        vocab=pinned.vocab.cache(),
        terms=pinned.terms,
    )
    idx_cached.docs.count()
    idx_cached.postings.count()
    idx_cached.vocab.count()

    def endpoints(idx):
        return {
            "recommend": lambda i: serving.recommend_endpoint(
                idx, {"title": RECOMMEND_TITLES[i % len(RECOMMEND_TITLES)]}
            ),
            "movie": lambda i: serving.movie_endpoint(
                idx, MOVIE_IDS[i % len(MOVIE_IDS)]
            ),
            "search": lambda i: serving.search_endpoint(
                idx, {"q": SEARCH_QS[i % len(SEARCH_QS)], "page": "1", "size": "10"}
            ),
            "health": lambda i: serving.health_endpoint(idx),
        }

    variants: dict[str, dict] = {}
    for variant, idx in (("parquet", idx_parquet), ("cached", idx_cached)):
        results: dict[str, dict] = {}
        for name, fn in endpoints(idx).items():
            # warm-up: one full rotation primes codegen/broadcast for
            # every distinct request plan, so steady numbers measure the
            # probe
            for i in range(10):
                status, _ = fn(i)
                assert status == 200, f"{name} warm-up returned {status}"
            lat: list[float] = []
            for i in range(n):
                t0 = time.time()
                status, _body = fn(i)
                lat.append((time.time() - t0) * 1000.0)
                assert status == 200, f"{name} request {i} returned {status}"
            lat.sort()
            results[name] = {
                "n": n,
                "p50_ms": round(statistics.median(lat), 1),
                "p95_ms": round(lat[int(0.95 * (n - 1))], 1),
                "max_ms": round(lat[-1], 1),
            }
            print(variant, name, results[name], flush=True)
        variants[variant] = results

    out = {
        "metric": "serving_latency",
        "unit": "ms",
        "endpoints": variants["cached"],
        "endpoints_parquet": variants["parquet"],
        "cpu_ref_1t_sec": _cpu_ref_1t(),
        "index": (
            "persisted MovieIndex parquet (docs + postings + build-time "
            "vocab), PIT-pinned loads; serving-tier conf (1 shuffle "
            "partition, AQE off); 'endpoints' = memory-cached hot-serving "
            "posture, 'endpoints_parquet' = storage-probe posture"
        ),
        "corpus": "MovieLens-100k u.item (1682 docs, the reference's own serving corpus)",
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "endpoints"}))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
