#!/usr/bin/env python
"""Benchmark harness: runs the catalog queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line:
``{"metric": ..., "value": headline_total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Modes
-----
default        full catalog, N_RUNS (>=3) timed runs per query after a cold
               run; reports per-query min ("queries") and median
               ("median"). "value" stays the HEADLINE-subset steady-state
               total so it is comparable with BENCH_r01/r02.
--headline     only the headline subset (fast iteration loop).
--runs N       override run count (default 3).

Each query is executed with a noop-sink write that forces full evaluation
without driver materialization of the payload. The streaming row
(q87_streaming_attribution) drains the watermarked stream-stream interval
join with availableNow into a memory sink — the one non-batch entry.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.session import (  # noqa: E402
    get_spark,
)

# Headline set: one per capability family (relational joins/aggs, window
# top-k, search scoring, dedup, similarity, time-series windows,
# multimodal mapInPandas, streaming stream-stream join). This list is the
# round-over-round comparison basis — append, never remove.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_shipping_priority",
    "q05_region_nation_revenue",
    "q13_explode_terms",
    "q14_window_topk",
    "q26_search_bm25",
    "q32_dedup_minhash_pairs",
    "q37_embedding_cosine_topk",
    "q44_tumbling_window",
    "q46_sessionize",
    "q49_multimodal_features",
    "q35_dedup_simhash_pairs",
    "q68_search_bm25_indexed",
    "q75_item_item_similarity",
    "q82_embedding_ann_ivf",
    "q84_range_join",
    "q85_ann_batch",
    "q86_curation_pipeline",
    "q88_sequence_packing",
    "q91_multimodal_frames",
    "q87_streaming_attribution",
    "q97_search_multimatch_indexed",
    # r05 append (round-4 verdict task 5): the actual top-cost catalog
    # entries, so regression tracking covers them. Kept out of the
    # r01-comparable "value" basis via _POST_R02 below; tracked in
    # "headline_ext_total".
    "q117_semantic_dedup",
    "q99_dedup_incremental",
    "q126_pagerank_copurchase",
    "q237_ppjoin_exact",
    "q249_poisson_bootstrap",
    # r06 append: the round-6 cross-doc span-dedup + Gopher-rules
    # additions — the heaviest new entries, tracked from birth.
    "q263_crossdoc_span_excise",
    "q267_gopher_repetition",
]

# Entries appended to HEADLINE after the r01/r02 baseline was frozen.
# They report individually and in "headline_ext_total", but stay out of
# "value" so the round-over-round ratio is apples-to-apples with r01.
_POST_R02 = {
    "q87_streaming_attribution",
    "q97_search_multimatch_indexed",
    "q117_semantic_dedup",
    "q99_dedup_incremental",
    "q126_pagerank_copurchase",
    "q237_ppjoin_exact",
    "q249_poisson_bootstrap",
    "q263_crossdoc_span_excise",
    "q267_gopher_repetition",
}


def _run_streaming_attribution(spark, sf_dir: str) -> None:
    """Watermarked stream-stream click-attribution join (q87's streaming
    variant, tests/test_streaming.py equivalence-proven) drained with
    availableNow into a memory sink."""
    from pyspark.sql import functions as F

    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.streaming.windows import (
        attribution_join,
        run_stream_to_memory,
        stream_events,
    )

    events = stream_events(spark, sf_dir)
    joined = attribution_join(
        events.filter(F.col("event_type") == "view"),
        events.filter(F.col("event_type") == "click"),
    )
    run_stream_to_memory(joined, "bench_attrib", output_mode="append")
    spark.catalog.dropTempView("bench_attrib")


def main() -> None:
    args = sys.argv[1:]
    headline_only = "--headline" in args
    n_runs = 3
    if "--runs" in args:
        n_runs = max(2, int(args[args.index("--runs") + 1]))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    queries = entrymod.queries()

    if headline_only:
        names = [n for n in HEADLINE if n in queries or n == "q87_streaming_attribution"]
    else:
        # Full catalog; headline order first so a partial run still covers
        # the comparison basis, then the rest sorted by name.
        rest = sorted(n for n in queries if n not in HEADLINE)
        names = [n for n in HEADLINE if n in queries] + ["q87_streaming_attribution"] + rest

    # Warm the JVM/session so per-query numbers measure the plan, not
    # startup — including the machinery the FIRST cold query would
    # otherwise initialize lazily: whole-stage codegen + the shuffle
    # system (groupBy), broadcast exchange (join), the parquet reader
    # path (tiny region table), and the Arrow Python-worker pool
    # (mapInPandas forks workers on first use; q49's cold run paid ~1.5 s
    # for it). Each warms ONCE per session; no headline query's own plan
    # is executed here.
    from pyspark.sql import functions as _F

    spark.range(1).count()
    _w = spark.range(1000).selectExpr("id % 7 AS k")
    _w.groupBy("k").count().join(
        _F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k"
    ).count()
    try:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    except Exception:  # noqa: BLE001 — warm-up only; the run itself will surface real errors
        pass

    def _ident(batches):
        yield from batches

    spark.range(64).mapInPandas(_ident, "id long").count()

    cold: dict[str, float] = {}
    mins: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in names:
        runs: list[float] = []
        for i in range(1 + n_runs):  # run 0 = cold (plan/codegen), rest timed
            t0 = time.time()
            if name == "q87_streaming_attribution":
                _run_streaming_attribution(spark, sf_dir)
            else:
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        cold[name] = runs[0]
        steady = runs[1:]
        mins[name] = min(steady)
        medians[name] = round(statistics.median(steady), 3)

    # r01/r02-comparable basis: the original 21 queries (rows appended to
    # HEADLINE later report individually and via headline_ext_total, but
    # stay out of "value" so the round-over-round ratio is apples-to-apples).
    headline_names = [n for n in HEADLINE if n in mins and n not in _POST_R02]
    ext_names = [n for n in HEADLINE if n in mins]
    summary = {
        "metric": "headline_queries_total",
        # Comparable with BENCH_r01/r02: steady-state total over the same
        # 21-query headline subset.
        "value": round(sum(mins[n] for n in headline_names), 3),
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "mode": f"steady-state (min of {n_runs} runs after 1 cold run)",
        "n_runs": n_runs,
        "cold_total": round(sum(cold[n] for n in headline_names), 3),
        "headline_ext_total": round(sum(mins[n] for n in ext_names), 3),
        "streaming_attribution_sec": mins.get("q87_streaming_attribution"),
        "full_catalog": not headline_only,
        "full_total": round(sum(mins.values()), 3),
        "n_queries": len(mins),
        "per_query_file": (
            "BENCH_headline_local.json" if headline_only else "BENCH_full_local.json"
        ),
    }
    # Full per-query detail goes to a side artifact, NOT stdout: the driver
    # captures only a bounded tail of stdout, and a 247-entry map pushed the
    # headline fields past the capture window in r03/r04 ("parsed": null).
    # --headline iteration runs write to their own file so they never
    # clobber the committed full-catalog per-query artifact.
    side_name = "BENCH_headline_local.json" if headline_only else "BENCH_full_local.json"
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), side_name)
    with open(full_path, "w") as fh:
        json.dump({**summary, "queries": mins, "median": medians,
                   "cold": cold}, fh, indent=1, sort_keys=True)
    # The compact summary is the FINAL stdout line so a tail-capture always
    # sees a complete, parseable JSON object.
    sys.stdout.flush()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
