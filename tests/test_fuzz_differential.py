"""Differential fuzzing: generated strings through the engine's text
expressions vs the DuckDB mirror of the same spec. Catches divergence in
normalization/tokenization/hash semantics that fixed testdata might miss."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.functions.text import (
    normalize_text,
    tokens,
)

# NUL is excluded: DuckDB VARCHAR cannot carry \x00 (and the engine's
# sources never produce it); quotes/backslashes are fine via register().
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_normalize_and_tokenize_match_duckdb(spark, duck, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r.id: (r.norm, r.toks, r.fp)
        for r in df.select(
            "id",
            normalize_text("text").alias("norm"),
            F.concat_ws("\x01", tokens("text")).alias("toks"),
            F.md5(normalize_text("text")).alias("fp"),
        ).collect()
    }
    import pandas as pd

    duck.register("t_view", pd.DataFrame({"id": range(len(texts)), "text": texts}))
    duck.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM t_view")
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            """
            SELECT id,
                   trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm,
                   array_to_string(regexp_split_to_array(
                     trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' +'), chr(1)) AS toks,
                   md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
            FROM t
            """
        ).fetchall()
    }
    assert got == want
