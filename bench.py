#!/usr/bin/env python
"""Benchmark harness: runs the catalog queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line:
``{"metric": ..., "value": headline_total_sec, "unit": "sec", "queries": {...}, "sf": ...}``
where ``queries`` carries the HEADLINE-set per-query minima (bounded ~32
entries — the full catalog's per-query map goes to the side artifact
named by ``per_query_file``, a defense against driver stdout-tail
truncation; see the write-up at the end of main()).

Modes
-----
default        full catalog, N_RUNS (>=3) timed runs per query after a cold
               run; reports per-query min ("queries") and median
               ("median"). "value" stays the HEADLINE-subset steady-state
               total so it is comparable with BENCH_r01/r02.
--headline     only the headline subset (fast iteration loop).
--runs N       override run count (default 3).
--cache-tables opt-in catalog-run table cache (round-9 verdict task 6):
               persists each base-table scan MEMORY_AND_DISK on first
               load so the 398-query catalog stops re-reading the same
               parquet hundreds of times — the build-once-query-many
               posture of a hot storage tier at 100 TB. Per-query
               results are byte-identical (same rows, different scan
               node); correctness runs never set it. Reported in the
               json as "cache_tables" so artifacts are self-describing.

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


def _cpu_sample() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from the aggregate ``cpu`` line of
    ``/proc/stat``; (0, 0) when unreadable (non-Linux). Steal is field 8
    (time the hypervisor ran someone else while this VM was runnable) —
    the r8 headline regression was adjudicated to exactly this, so the
    bench now measures it instead of guessing post-hoc."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:  # noqa: BLE001 — instrumentation only; never break the bench
        return 0, 0


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    """CPU-steal share (percent of all jiffies) between two samples."""
    ds, dt = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / dt, 3) if dt > 0 else 0.0


def _cpu_reference() -> dict[str, float]:
    """Fixed-work CPU reference timings, recorded into every BENCH json.

    Steal only measures runnable-but-preempted time; a slower host CLOCK
    (frequency scaling, noisy-neighbor memory bandwidth) is invisible to
    it. The round-9 headline sat 1.15x above r7 UNIFORMLY across 344
    unchanged queries at ~0.4% steal — classic clock drift. These two
    absolute numbers (single-thread integer loop; multi-thread float64
    matmul, BLAS) let the next round separate machine speed from code
    speed by ratioing against the committed artifact instead of
    adjudicating from per-query forensics."""
    out: dict[str, float] = {}
    out["cpu_ref_1t_sec"] = _cpu_ref_1t()
    try:
        import numpy as np

        a = np.arange(2048 * 2048, dtype=np.float64).reshape(2048, 2048) % 97
        t0 = time.time()
        (a @ a).sum()
        out["cpu_ref_mt_sec"] = round(time.time() - t0, 3)
    except Exception:  # noqa: BLE001 — reference only
        pass
    return out


# A timed run whose window saw more steal than this is suspect; the
# headline subset is re-timed (up to _MAX_RETRIES extra passes) until a
# pass lands under it, and every pass's steal is recorded in the json so
# a judge can separate "slow code" from "stolen CPU" without adjudication.
STEAL_THRESHOLD_PCT = float(os.environ.get("SPARK_GRAFT_STEAL_THRESHOLD", "1.5"))
_MAX_RETRIES = int(os.environ.get("SPARK_GRAFT_STEAL_RETRIES", "2"))

# Machine-speed baseline for the normalized headline (round-9 verdict
# task 1: two consecutive rounds of steal/clock adjudication is enough).
# Pinned ONCE from the fastest cpu_ref readings recorded on this host
# class (BENCH_r09.json's driver run: cpu_ref_1t 0.609 s at 1.2%
# whole-bench steal — the quietest instrumented window on record, and
# the machine-speed band in which the r01 21.16 s headline baseline was
# measured). headline_normalized = value * (CPU_REF_BASELINE_1T /
# cpu_ref_now): a slower clock window (frequency scaling, noisy
# neighbor) scales the raw wall-clock DOWN toward what the quiet
# machine would have measured; a faster window scales it up — symmetric,
# so the gate can't be gamed by a lucky fast window either. The 2x gate
# (tests/test_bench_gate.py) compares the NORMALIZED number; the raw
# value stays in the artifact beside it.
CPU_REF_BASELINE_1T = 0.609


def _cpu_ref_1t() -> float:
    """The fixed-work single-thread reference loop (same work as
    _cpu_reference's 1t probe), run at a single point in time."""
    t0 = time.time()
    acc = 0
    for i in range(10_000_000):
        acc += i * i
    return round(time.time() - t0, 3)


def main() -> None:
    args = sys.argv[1:]
    headline_only = "--headline" in args
    cache_tables = "--cache-tables" in args
    if cache_tables:
        os.environ["SPARK_GRAFT_CACHE_TABLES"] = "1"
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

    def _execute(name: str) -> None:
        if name == "q87_streaming_attribution":
            _run_streaming_attribution(spark, sf_dir)
        else:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()

    def _time(name: str, runs_n: int, include_cold: bool):
        """Return (cold_sec_or_None, [(sec, steal_pct), ...steady...])."""
        out: list[tuple[float, float]] = []
        cold_sec = None
        for i in range(int(include_cold) + runs_n):
            s0, t0 = _cpu_sample(), time.time()
            _execute(name)
            sec = round(time.time() - t0, 3)
            sp = _steal_pct(s0, _cpu_sample())
            if include_cold and i == 0:
                cold_sec = sec
            else:
                out.append((sec, sp))
        return cold_sec, out

    bench_steal0 = _cpu_sample()
    cpu_ref_start = _cpu_ref_1t()
    cold: dict[str, float] = {}
    mins: dict[str, float] = {}
    medians: dict[str, float] = {}
    run_steal: dict[str, float] = {}  # max steal% seen across a query's steady runs
    # Per-segment noise forensics (round-10 verdict task 6): the r10
    # driver artifact carried an alphabetically-contiguous q371–q381
    # block inflated 4–12x that only a hand comparison against a second
    # artifact could localize to one noisy wall-clock window. Sampling a
    # cheap fixed-work cpu_ref + steal delta every _SEG_N queries puts
    # that localization IN the artifact: a segment whose steal exceeds
    # the threshold or whose cpu_ref drifts >25% off the run's bracket
    # mean is listed in "tainted_segments", so a judge (or the gate) can
    # discount exactly the affected query range.
    _SEG_N = 40
    segments: list[dict] = []
    seg_start_idx, seg_steal0, seg_t0 = 0, _cpu_sample(), time.time()

    def _close_segment(end_idx: int) -> None:
        segments.append(
            {
                "queries": f"{names[seg_start_idx]}..{names[end_idx - 1]}",
                "steal_pct": _steal_pct(seg_steal0, _cpu_sample()),
                "cpu_ref_1t_sec": _cpu_ref_1t(),
                "wall_sec": round(time.time() - seg_t0, 3),
            }
        )

    for qi, name in enumerate(names):
        c, steady = _time(name, n_runs, include_cold=True)
        cold[name] = c
        mins[name] = min(s for s, _ in steady)
        medians[name] = round(statistics.median(s for s, _ in steady), 3)
        run_steal[name] = max(sp for _, sp in steady)
        if (qi + 1) % _SEG_N == 0 or qi == len(names) - 1:
            _close_segment(qi + 1)
            seg_start_idx, seg_steal0, seg_t0 = qi + 1, _cpu_sample(), time.time()

    # Steal-aware headline re-pin: if any headline steady run overlapped a
    # steal spike, re-time JUST the headline subset (cheap — seconds, not
    # the full catalog) and fold in the per-query minima. Stop as soon as
    # a pass is clean or retries are exhausted; record every pass.
    headline_live = [n for n in HEADLINE if n in mins]
    retry_log: list[dict] = []
    retries = 0
    while (
        retries < _MAX_RETRIES
        and max(run_steal[n] for n in headline_live) > STEAL_THRESHOLD_PCT
    ):
        retries += 1
        pass_max_steal = 0.0
        # targeted: only re-time queries whose own runs overlapped steal —
        # a calm query's min is already trustworthy
        for name in [n for n in headline_live if run_steal[n] > STEAL_THRESHOLD_PCT]:
            _, steady = _time(name, n_runs, include_cold=False)
            best_sec = min(s for s, _ in steady)
            best_steal = min(sp for _, sp in steady)
            if best_sec < mins[name]:
                mins[name] = best_sec
            # the query's steal record improves if this pass was calmer
            run_steal[name] = min(run_steal[name], max(sp for _, sp in steady))
            pass_max_steal = max(pass_max_steal, best_steal)
        retry_log.append(
            {"attempt": retries, "max_steal_pct": round(pass_max_steal, 3)}
        )

    # r01/r02-comparable basis: the original 21 queries (rows appended to
    # HEADLINE later report individually and via headline_ext_total, but
    # stay out of "value" so the round-over-round ratio is apples-to-apples).
    headline_names = [n for n in HEADLINE if n in mins and n not in _POST_R02]
    ext_names = [n for n in HEADLINE if n in mins]
    cpu_refs = _cpu_reference()  # end-of-bench sample (1t + mt)
    # Bracket the run: the 1t reference is sampled at bench start AND
    # end; normalization uses the mean so a machine-speed change
    # mid-run is split, not attributed to one endpoint.
    cpu_ref_now = (cpu_ref_start + cpu_refs["cpu_ref_1t_sec"]) / 2.0
    value = round(sum(mins[n] for n in headline_names), 3)
    summary = {
        "metric": "headline_queries_total",
        # Comparable with BENCH_r01/r02: steady-state total over the same
        # 21-query headline subset.
        "value": value,
        # Machine-speed-normalized headline (round-9 verdict task 1): the
        # raw wall-clock scaled by the pinned-baseline/now ratio of the
        # fixed-work 1t reference (mean of the start/end brackets). THIS
        # is the number the 2x gate compares (tests/test_bench_gate.py);
        # raw stays beside it so both are always in the artifact.
        "value_normalized": round(value * (CPU_REF_BASELINE_1T / cpu_ref_now), 3),
        "cpu_ref_baseline_1t_sec": CPU_REF_BASELINE_1T,
        "cpu_ref_1t_start_sec": cpu_ref_start,
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "mode": f"steady-state (min of {n_runs} runs after 1 cold run)",
        "n_runs": n_runs,
        "cold_total": round(sum(cold[n] for n in headline_names), 3),
        "headline_ext_total": round(sum(mins[n] for n in ext_names), 3),
        "streaming_attribution_sec": mins.get("q87_streaming_attribution"),
        "full_catalog": not headline_only,
        "cache_tables": cache_tables,
        "full_total": round(sum(mins.values()), 3),
        "n_queries": len(mins),
        # CPU-steal instrumentation (round-8 verdict task 1): whole-bench
        # steal share, the worst steal seen in any headline steady run
        # AFTER retries, and the retry log. headline_max_steal_pct ≈ 0
        # means the headline number was timed on quiet CPU; a high value
        # with exhausted retries means the number is environment-tainted
        # and says so in the artifact itself.
        "steal_pct_bench": _steal_pct(bench_steal0, _cpu_sample()),
        **cpu_refs,
        # Conf self-description (round-10 ADVICE): the artifact records
        # the shuffle conf it was measured under, and the gate test
        # flags a mismatch with session.DEFAULT_CONF — a conf change can
        # no longer leave a stale-conf artifact as the regression basis.
        "conf": {
            key: spark.conf.get(key, None)
            for key in (
                "spark.sql.shuffle.partitions",
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            )
        },
        "segments": segments,
        "tainted_segments": [
            s["queries"]
            for s in segments
            if s["steal_pct"] > STEAL_THRESHOLD_PCT
            or abs(s["cpu_ref_1t_sec"] - cpu_ref_now) > 0.25 * cpu_ref_now
        ],
        "headline_max_steal_pct": round(
            max(run_steal[n] for n in headline_live), 3
        ),
        "steal_threshold_pct": STEAL_THRESHOLD_PCT,
        "steal_retries": retry_log,
        # Per-query minima for the HEADLINE set only (r11 VERDICT task
        # 4): bounded at ~32 entries so the driver's stdout-tail capture
        # can't be pushed past the headline fields (the r03/r04 failure
        # came from the 247-entry full map), while restoring the
        # driver-side round-over-round per-query comparison the one-line
        # format had lost. The FULL per-query map still goes to the side
        # artifact below.
        "queries": {n: mins[n] for n in HEADLINE if n in mins},
        "per_query_file": (
            "BENCH_headline_local.json"
            if headline_only
            else (
                "BENCH_full_cached_local.json"
                if cache_tables
                else "BENCH_full_local.json"
            )
        ),
    }
    # Full per-query detail goes to a side artifact, NOT stdout: the driver
    # captures only a bounded tail of stdout, and a 247-entry map pushed the
    # headline fields past the capture window in r03/r04 ("parsed": null).
    # --headline iteration runs write to their own file so they never
    # clobber the committed full-catalog per-query artifact.
    side_name = summary["per_query_file"]
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
