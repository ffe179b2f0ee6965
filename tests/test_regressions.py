"""Regression tests for review findings: each reproduces a bug that the
fixture data could not surface (adversarial text, NULL keys/values,
reordered field dicts) and pins the fixed behavior."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.parity import compare

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def test_pii_scrub_patterns_survive_adversarial_text(spark):
    """F.expr-embedded regexes lost backslash escapes ('\\.'→'.',
    '\\s'→'s'), so 'user@examplecom' (no TLD dot) counted as an email
    and URLs matched across whitespace. Run q103's Spark side AND its
    DuckDB oracle over an adversarial documents table and compare."""
    rows = [
        (1, "mail me at user@examplecom or not", "en", "src0", 30),
        (2, "see http://a b c and http://x then http://z", "en", "src0", 40),
        (3, "real contact: jane.doe@mail.example.org ok", "en", "src1", 40),
        (4, "no pii here at all", "en", "src1", 18),
    ]
    d = os.path.join(TMP, "adv_docs")
    shutil.rmtree(d, ignore_errors=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    sdf = entrymod.queries()["q103_pii_scrub"](spark, d)
    import duckdb

    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    try:
        odf = duck.execute(entrymod.oracle_sql()["q103_pii_scrub"]).df()
        problems = compare(sdf, odf, "q103-adversarial")
        assert not problems, "\n".join(problems)
    finally:
        duck.close()
    got = {r.doc_id: (r.n_emails, r.n_urls) for r in sdf.collect()}
    assert got[1] == (0, 0)  # missing TLD dot is not an email
    assert got[2] == (0, 3)  # URLs stop at whitespace: three of them
    assert got[3] == (2, 0)  # the real address + q103's injected one (3 % 3 == 0)
    shutil.rmtree(d, ignore_errors=True)


def test_scd2_preserves_null_validity_periods(spark):
    """attr != prev is NULL (filtered) for transitions to/from NULL, which
    dropped NULL periods and emitted duplicate consecutive versions. The
    null-safe comparison must version A → NULL → A as three versions."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.relational import (
        END_OF_TIME_S,
        scd2_history,
    )

    df = spark.createDataFrame(
        [(1, 100, "A", 10), (1, 200, None, 11), (1, 300, "A", 12),
         (2, 100, None, 20), (2, 200, None, 21)],
        "k long, ts long, attr string, tb long",
    )
    hist = {
        (r.version): (r.attr, r.valid_from_s, r.valid_to_s)
        for r in scd2_history(df, "k", "ts", "attr", "tb").filter(F.col("k") == 1).collect()
    }
    assert hist == {
        1: ("A", 100, 200),
        2: (None, 200, 300),
        3: ("A", 300, END_OF_TIME_S),
    }
    # key 2: consecutive NULLs collapse into ONE open version
    h2 = scd2_history(df, "k", "ts", "attr", "tb").filter(F.col("k") == 2).collect()
    assert len(h2) == 1 and h2[0].attr is None and h2[0].valid_to_s == END_OF_TIME_S


def test_asof_join_null_keys_never_match(spark):
    """Window.partitionBy groups NULLs, so NULL-key clicks used to be
    'attributed' to NULL-key views — any SQL join (and the DuckDB ASOF
    oracle) produces no such match."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.relational import (
        asof_join_backward,
    )

    views = spark.createDataFrame(
        [(None, 100, 1), (7, 100, 2)], "user_id long, ts long, view_id long"
    )
    clicks = spark.createDataFrame(
        [(None, 200, 10), (7, 200, 11)], "user_id long, ts long, click_id long"
    )
    got = asof_join_backward(clicks, views, on="user_id", ts="ts").collect()
    assert [(r.user_id, r.click_id, r.view_id) for r in got] == [(7, 11, 2)]
    # left semantics: the NULL-key click survives, unmatched
    left = asof_join_backward(clicks, views, on="user_id", ts="ts", how="left").collect()
    assert {(r.user_id, r.click_id, r.view_id) for r in left} == {
        (None, 10, None), (7, 11, 2),
    }


def test_multimatch_index_survives_field_reordering(spark, sf_dir):
    """A persisted index must stay correct when the query's fields dict
    is ordered differently from the build-time one — the old ordinal key
    silently scored terms against the wrong field's statistics."""
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.search import (
        multi_match_bm25_indexed,
    )
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.operators.textindex import (
        build_multimatch_index,
    )
    from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    built = {"source": 3.0, "text": 1.0}
    reordered = {"text": 1.0, "source": 3.0}
    vocab, stats = build_multimatch_index(docs, "doc_id", built)
    a = {
        r.doc_id: r.score
        for r in multi_match_bm25_indexed(
            docs, vocab, stats, "doc_id", built, ["sprak", "window"]
        ).collect()
    }
    b = {
        r.doc_id: r.score
        for r in multi_match_bm25_indexed(
            docs, vocab, stats, "doc_id", reordered, ["sprak", "window"]
        ).collect()
    }
    assert a and set(a) == set(b)
    # same contributions folded in a different (f, term) order — equal to
    # rounding tolerance
    assert all(abs(a[k] - b[k]) <= 1e-4 for k in a)
