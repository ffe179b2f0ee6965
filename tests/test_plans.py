"""Physical-plan regression guards: the scale properties (pushdown,
pruning, broadcast, partial top-k) must survive refactors."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators import (
    relational as R,
)
from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.sources.readers import (
    load_table,
    write_parquet,
)

QUERIES = entrymod.queries()
TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString() + df._jdf.queryExecution().toString()


def test_q01_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = _plan(QUERIES["q01_pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 6 needed columns of 11 reach the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q02_broadcasts_dimension_and_takeordered(spark, sf_dir):
    plan = _plan(QUERIES["q02_top_customers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q14_partial_topk_before_shuffle(spark, sf_dir):
    plan = _plan(QUERIES["q14_window_topk"](spark, sf_dir))
    assert "WindowGroupLimit" in plan  # rank-limit pushdown (partial top-k)


def test_q05_no_fact_side_shuffle_joins(spark, sf_dir):
    plan = _plan(QUERIES["q05_region_nation_revenue"](spark, sf_dir))
    assert "SortMergeJoin" not in plan  # all dims broadcast


def test_partitioned_write_enables_partition_pruning(spark, sf_dir):
    out = os.path.join(TMP, "orders_by_status")
    shutil.rmtree(out, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = _plan(back)
    # pruned read: only the F partition directory is scanned
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or "o_orderstatus=F" in plan
    shutil.rmtree(out, ignore_errors=True)


def test_bucketed_tables_join_without_exchange(spark, sf_dir):
    """Bucketing pre-shuffles on the join key at write time — the 100 TB
    co-located join strategy (no Exchange on either side at query time)."""
    # tables land in ./spark-warehouse (gitignored); warehouse dir is a
    # static conf and can't be changed on the shared session
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    ).write.bucketBy(8, "o_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders").hint("merge"), "o_orderkey"
    )
    plan = _plan(joined)
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_incremental_dedup_index_skips_corpus_scan(spark, sf_dir):
    """With the corpus dedup index persisted (parquet, as at scale), an
    increment's plan must scan the BATCH and the index tables only —
    never the corpus itself. That is the O(|batch|) claim, plan-proven."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cdir = os.path.join(TMP, "inc_corpus")
    bdir = os.path.join(TMP, "inc_batch")
    idirs = {k: os.path.join(TMP, f"inc_idx_{k}") for k in ("hashes", "bands", "shingles")}
    for d in [cdir, bdir, *idirs.values()]:
        shutil.rmtree(d, ignore_errors=True)
    write_parquet(docs.filter(F.col("doc_id") % 4 != 0), cdir)
    write_parquet(docs.filter(F.col("doc_id") % 4 == 0), bdir)

    corpus = spark.read.parquet(cdir)
    h, b, s = build_dedup_index(corpus, "doc_id", "text")
    write_parquet(h, idirs["hashes"])
    write_parquet(b, idirs["bands"])
    write_parquet(s, idirs["shingles"])

    batch = spark.read.parquet(bdir)
    admitted = incremental_dedup(
        batch, None, "doc_id", "text",
        index=tuple(spark.read.parquet(idirs[k]) for k in ("hashes", "bands", "shingles")),
    )
    plan = admitted._jdf.queryExecution().executedPlan().toString()
    assert "inc_corpus" not in plan, "increment plan rescans the corpus"
    assert "inc_batch" in plan
    # same admitted set as the self-contained (corpus-frame) path
    inline = incremental_dedup(batch, corpus, "doc_id", "text")
    assert {r.doc_id for r in admitted.collect()} == {r.doc_id for r in inline.collect()}
    for d in [cdir, bdir, *idirs.values()]:
        shutil.rmtree(d, ignore_errors=True)


def test_asof_join_is_join_free(spark, sf_dir):
    """The as-of operator must compile to union + window (one shuffle on
    the key), never to any join — a bare inequality join would be
    BroadcastNestedLoopJoin, the O(n*m) cliff."""
    plan = _plan(QUERIES["q98_asof_join"](spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_join_equals_naive_inequality_max(spark, sf_dir):
    """Reference semantics: per click, the max-(ts, view_id) view among
    all views with view.ts <= click.ts for the same user — computed the
    quadratic way and compared exactly."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.relational import (
        asof_join_backward,
    )

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    got = {
        (r.click_id, r.view_id, r.ts_matched)
        for r in asof_join_backward(clicks, views, on="user_id", ts="ts").collect()
    }
    v = views.select(
        F.col("user_id").alias("vu"), F.col("ts").alias("vts"), "view_id"
    )
    naive = (
        clicks.join(v, (F.col("user_id") == F.col("vu")) & (F.col("vts") <= F.col("ts")))
        .groupBy("click_id")
        .agg(F.max(F.struct(F.col("vts"), F.col("view_id"))).alias("m"))
    )
    want = {(r.click_id, r.m.view_id, r.m.vts) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_multimatch_indexed_single_corpus_scan(spark, sf_dir):
    """With the per-field index pre-materialized (parquet, as at scale),
    the q97 query-time plan must scan the corpus exactly ONCE — the whole
    point of the indexed path vs the inline one (which pays a second
    corpus pass to derive the fuzzy-expansion vocabulary)."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.search import (
        multi_match_bm25_indexed,
    )
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.textindex import (
        build_multimatch_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    fields = {"source": 3.0, "text": 1.0}
    vocab, stats = build_multimatch_index(docs, "doc_id", fields)
    vdir, sdir = os.path.join(TMP, "mm_vocab"), os.path.join(TMP, "mm_stats")
    for d in (vdir, sdir):
        shutil.rmtree(d, ignore_errors=True)
    write_parquet(vocab, vdir)
    write_parquet(stats, sdir)
    scored = multi_match_bm25_indexed(
        docs,
        spark.read.parquet(vdir),
        spark.read.parquet(sdir),
        "doc_id",
        fields,
        ["sprak", "window"],
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    corpus_scans = sum(
        1 for ln in plan.splitlines() if "Scan parquet" in ln and "documents" in ln
    )
    assert corpus_scans == 1, f"expected 1 corpus scan, got {corpus_scans}"
    assert scored.count() > 0
    for d in (vdir, sdir):
        shutil.rmtree(d, ignore_errors=True)


def test_semi_join_produces_no_duplicates(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    semi = R.semi_join(cust, orders, on=[cust.c_custkey == orders.o_custkey])
    assert semi.count() == semi.select("c_custkey").distinct().count()


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    """The bucketed rewrite must compile to a hash join on the bucket key,
    never the O(n*m) BroadcastNestedLoopJoin a bare inequality join gets."""
    plan = _plan(QUERIES["q84_range_join"](spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_range_join_equals_naive_inequality_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("long").alias("ts_s"), "event_id"
    )
    iv = spark.range(0, 30).select(
        (F.lit(1704067200) + F.col("id") * 86400).cast("long").alias("w_start_s"),
        (F.lit(1704067200) + F.col("id") * 86400 + 172800).cast("long").alias("w_end_s"),
    )
    bucketed = R.range_join_bucketed(ev, "ts_s", iv, "w_start_s", "w_end_s", bucket=86400)
    naive = ev.crossJoin(iv).filter(
        (F.col("ts_s") >= F.col("w_start_s")) & (F.col("ts_s") < F.col("w_end_s"))
    )
    cols = ["event_id", "w_start_s"]
    got = sorted(tuple(r) for r in bucketed.select(cols).collect())
    want = sorted(tuple(r) for r in naive.select(cols).collect())
    assert got == want and len(want) > 0


def test_range_join_timestamp_columns(spark, sf_dir):
    """The bucketed range join must also accept native timestamp columns
    (cast("long") inside the operator flooring to epoch seconds)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    iv = spark.range(0, 30).select(
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 86400).alias("w_start"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 86400 + 172800).alias("w_end"),
    )
    bucketed = R.range_join_bucketed(ev, "ts", iv, "w_start", "w_end", bucket=86400)
    naive = ev.crossJoin(iv).filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    cols = ["event_id", "w_start"]
    got = sorted(tuple(r) for r in bucketed.select(cols).collect())
    want = sorted(tuple(r) for r in naive.select(cols).collect())
    assert got == want and len(want) > 0


def test_ivf_index_persists_with_partition_pruning(spark, sf_dir):
    """The IVF cell assignment is a write-once index: persisted partitioned
    by cell, a probe query scans only its nprobe cell directories."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators import (
        similarity as SIM,
    )

    out = os.path.join(TMP, "embeddings_ivf")
    shutil.rmtree(out, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    indexed = SIM.ivf_index(emb, "vec_id", "embedding", nlist=8).select(
        "vec_id", "embedding", F.col("__cell").alias("cell")
    )
    write_parquet(indexed, out, partition_by=["cell"])
    probe = spark.read.parquet(out).filter(F.col("cell").isin(2, 5))
    plan = _plan(probe)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:120]
    got = probe.count()
    want = indexed.filter(F.col("cell").isin(2, 5)).count()
    assert got == want and 0 < got < emb.count()
    shutil.rmtree(out, ignore_errors=True)


def test_q110_boilerplate_set_broadcasts(spark, sf_dir):
    """The boilerplate 5-gram set must reach the occurrences frame as a
    broadcast — the corpus-side explode must never shuffle to join it."""
    plan = _plan(QUERIES["q110_boilerplate_ngrams"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q111_bench_ngrams_broadcast(spark, sf_dir):
    """Decontamination joins the training side against a broadcast of the
    held-out n-gram set (eval sets are tiny; the corpus is not shuffled)."""
    plan = _plan(QUERIES["q111_ngram_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q112_profile_pruned_branches_no_expand(spark, sf_dir):
    """The profile is a union of per-column branches: no Expand (the
    multi-distinct rewrite that forces a SortAggregate over n_cols×
    duplicated rows — measured 6× slower), and every branch's scan is
    pruned to a single column."""
    df = QUERIES["q112_column_profile"](spark, sf_dir)
    plan = _plan(df)
    assert "Expand" not in plan
    # each FileScan reads exactly one column (ReadSchema mentions no comma)
    for chunk in plan.split("ReadSchema: ")[1:]:
        schema = chunk.split("\n")[0]
        assert schema.count(":") == 1, f"branch scan not pruned to 1 column: {schema}"


def test_q113_merge_is_single_join(spark, sf_dir):
    """MERGE lowers to exactly one join (full outer on the key): base and
    changes must not join more than once."""
    # executedPlan only: _plan() concatenates all plan phases, which would
    # triple-count the single join
    df = QUERIES["q113_merge_upsert"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_joins = sum(plan.count(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, f"expected 1 join, plan has {n_joins}"
    assert "FullOuter" in plan


def test_q123_pipeline_broadcasts_gate_sets(spark, sf_dir):
    """The composed pre-training pipeline must broadcast both tiny gate
    sets (boilerplate 5-grams, benchmark 8-grams) — the corpus side is
    only shuffled for the dedup window and the final shard agg."""
    df = QUERIES["q123_pretraining_pipeline"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


def test_q126_pagerank_broadcasts_rank_vector(spark, sf_dir):
    """PageRank iterations must broadcast the per-node rank/degree frame
    into the edges join — the edge list is never shuffled for a join
    (the only per-iteration shuffle is the contribution aggregate)."""
    df = QUERIES["q126_pagerank_copurchase"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mlt_indexed_batch_needs_zero_corpus_scans(spark, sf_dir):
    """Once the postings index is persisted, a more-like-this batch must
    touch ONLY the index: zero scans of documents.parquet in the plan
    (the q28 per-request corpus scan is what this operator retires),
    with the tiny target side broadcast into the postings join."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.textindex import (
        build_token_postings,
        more_like_this_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    pdir = os.path.join(TMP, "mlt_postings")
    shutil.rmtree(pdir, ignore_errors=True)
    write_parquet(build_token_postings(docs, "doc_id", "text"), pdir)
    out = more_like_this_batch(spark.read.parquet(pdir), [0, 7, 42], k=5)
    plan = _plan(out)
    corpus_scans = sum(
        1 for ln in plan.splitlines() if "Scan parquet" in ln and "documents" in ln
    )
    assert corpus_scans == 0, f"expected 0 corpus scans, got {corpus_scans}"
    assert "BroadcastHashJoin" in plan
    assert out.count() > 0
    shutil.rmtree(pdir, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """q144: joining the two bucketed tables on the bucket key must be
    Exchange-free on BOTH join inputs — bucketing replaces the shuffle.
    Broadcast is disabled so the cheap path can't mask a missing bucket
    optimization; only the final single-row-ish groupBy may exchange."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.plans.resolution import (
        bucketed_table,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = bucketed_table(
            spark,
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
            "bkt_guard_orders",
            "o_custkey",
        )
        customer = bucketed_table(
            spark,
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            "bkt_guard_customer",
            "c_custkey",
        )
        joined = orders.join(customer, orders["o_custkey"] == customer["c_custkey"]).select(
            "o_orderkey", "c_mktsegment"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_guard_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_guard_customer")
