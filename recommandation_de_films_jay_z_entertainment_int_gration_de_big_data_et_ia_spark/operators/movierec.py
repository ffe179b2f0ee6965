"""The reference API's recommendation flows as engine functions.

Re-expresses ``src/api.py`` endpoint logic (Flask → Elasticsearch) as pure
DataFrame composition — the serving layer would call these and collect the
(top-k, tiny) results:

- :func:`lookup_title` — ``POST /recommend`` step 1 (api.py:91-116):
  phrase match on title, top-5, with the multi-hit disambiguation branch.
- :func:`recommend_by_genre_overlap` — step 2 genre path (api.py:138-149):
  candidates sharing ≥1 genre, excluding the source movie, top-k.
- :func:`recommend_by_title_keywords` — step 2 fallback path
  (api.py:121-135): keyword `should` clauses from title words longer than
  3 chars, minimum_should_match=1, ranked by match count.
- :func:`search_movies` — ``GET /search`` (api.py:197-221): fuzzy
  multi_match over title^3 + genres with offset pagination.

All ranking is deterministic (score desc, movieId asc).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokens
from . import search as S

_SEARCH_FIELDS: dict[str, float] = {"title": 3.0, "genres_text": 1.0}


def _sql_lit(v, typ: str) -> str:
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "string":
        esc = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{esc}'"
    return f"CAST({v} AS {typ})"


def _literal_frame(spark, rows: list[tuple], fields: list[tuple[str, str]]) -> DataFrame:
    """Tiny inline frame from literals via ONE ``inline(array(...))``
    SQL expression — NOT ``spark.createDataFrame`` (a ~0.5-1 s
    local-relation py4j round trip, the round-11 finding) and NOT
    per-value ``F.lit``/``F.struct`` Column composition (each Column
    call is its own py4j round trip: ~4 calls x ~1 ms PER ROW made the
    expanded-terms frame cost 150-200 ms of pure driver chatter per
    /search request — the r12 finding). One expr string parses
    JVM-side in one round trip."""
    structs = ", ".join(
        "named_struct("
        + ", ".join(f"'{n}', {_sql_lit(v, t)}" for v, (n, t) in zip(row, fields))
        + ")"
        for row in rows
    )
    return spark.range(1).select(
        F.expr(f"inline(array({structs}))")
    )


def _lev_le(a: str, b: str, d: int) -> bool:
    """``levenshtein(a, b) <= d`` matching Spark's built-in exactly
    (unit-cost edit distance over code points), with the standard
    length-band and row-minimum early exits."""
    if abs(len(a) - len(b)) > d:
        return False
    if a == b:
        return True
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            if v < row_min:
                row_min = v
        if row_min > d:
            return False
        prev = cur
    return prev[-1] <= d


@dataclass(frozen=True)
class MovieIndex:
    """The serving tier's persisted index (the engine's analog of the
    reference's ES ``movies`` index, elasticsearch_ingest.py:92-105):

    - ``docs`` — one row per movie with the payload columns PLUS the
      precomputed ``__title_norm`` phrase-probe column, so a title
      lookup is a substring filter on a materialized column, never a
      per-request re-normalization of the corpus;
    - ``postings`` — ``(field, term, movieId)`` distinct-token inverted
      index over title and the flattened genres text, so fuzzy search
      expands query terms against the (small) vocabulary and probes by
      term equality instead of re-tokenizing every movie per request.

    - ``vocab`` — the per-field DISTINCT TERM dictionary (round-10
      VERDICT task 4): fuzzy expansion probes this tiny frame, so the
      ``postings.distinct()`` shuffle the old path re-ran on EVERY
      ``/search`` request moves to index-build time (Lucene's terms
      dictionary is likewise a build-time structure). Optional for
      backward compatibility — ``None`` derives it per request.

    - ``terms`` — the vocab COLLECTED into serving-process memory at
      index-load time (r12, VERDICT task 10): Lucene holds its terms
      dictionary in memory too, and with it the per-request fuzzy
      expansion is pure Python (microseconds over a vocabulary-bounded
      list) instead of a per-request Spark job scanning the vocab frame
      — halving the request's job count. Optional; ``None`` falls back
      to the frame-side expansion.

    All frames are plain DataFrames: build once per corpus snapshot,
    ``write_parquet`` them (postings bucketed by term at scale), and
    serve every request from the index alone.
    """

    docs: DataFrame
    postings: DataFrame
    vocab: DataFrame | None = None
    terms: tuple[tuple[str, str], ...] | None = None


def build_movie_index_tables(movies: DataFrame) -> MovieIndex:
    """One corpus scan per frame; the postings explode is map-side."""
    docs = movies.select(
        "movieId",
        "title",
        "release_date",
        "genres",
        F.concat(F.lit(" "), normalize_text("title"), F.lit(" ")).alias("__title_norm"),
    )
    tp = movies.select(
        F.lit("title").alias("field"),
        F.explode(F.array_distinct(tokens("title"))).alias("term"),
        "movieId",
    )
    gp = movies.withColumn("genres_text", F.concat_ws(" ", "genres")).select(
        F.lit("genres_text").alias("field"),
        F.explode(F.array_distinct(tokens("genres_text"))).alias("term"),
        "movieId",
    )
    postings = tp.unionByName(gp)
    return MovieIndex(
        docs=docs,
        postings=postings,
        vocab=postings.select("field", "term").distinct(),
    )


def movie_frame(movies: DataFrame | MovieIndex) -> DataFrame:
    """The payload-columns view of either serving input."""
    if isinstance(movies, MovieIndex):
        return movies.docs.select("movieId", "title", "release_date", "genres")
    return movies


def lookup_title(
    movies: DataFrame | MovieIndex, title_query: str, size: int = 5
) -> tuple[str, DataFrame]:
    """Phrase-match a title; returns (status, frame) where status ∈
    {'none', 'ambiguous', 'unique'} mirroring api.py:95-116's branches.

    Against a :class:`MovieIndex`, the probe is a substring filter on the
    PRECOMPUTED ``__title_norm`` column (plan-guarded: no per-request
    regexp normalization); results are identical to the inline
    ``phrase_match`` path because the stored column is exactly the
    normalized haystack that path builds per request."""
    if isinstance(movies, MovieIndex):
        norm = re.sub(r"[^a-z0-9]+", " ", title_query.lower()).strip()
        hits = (
            movies.docs.filter(F.col("__title_norm").contains(f" {norm} "))
            .select("movieId", "title", "release_date", "genres")
            .orderBy(F.asc("movieId"))
            .limit(size)
        )
    else:
        hits = movies.filter(S.phrase_match("title", title_query)).select(
            "movieId", "title", "release_date", "genres"
        ).orderBy(F.asc("movieId")).limit(size)
    n = hits.count()
    status = "none" if n == 0 else ("unique" if n == 1 else "ambiguous")
    return status, hits


def recommend_by_genre_overlap(
    movies: DataFrame | MovieIndex, movie_id: int, genres: list[str], k: int = 5
) -> DataFrame:
    """bool{must: terms(genres), must_not: term(movieId)} ranked by genre
    overlap size (deterministic stand-in for ES relevance). The genres
    array is a stored column in both serving inputs — no tokenization
    either way."""
    frame = movie_frame(movies)
    pred = S.bool_query(
        must=[S.terms_overlap(F.col("genres"), genres)],
        must_not=[S.term("movieId", movie_id)],
    )
    overlap = F.size(
        F.array_intersect(F.col("genres"), F.array(*[F.lit(g) for g in genres]))
    )
    return (
        frame.filter(pred)
        .select("movieId", "title", "release_date", "genres", overlap.alias("score"))
        .orderBy(F.desc("score"), F.asc("movieId"))
        .limit(k)
    )


def recommend_by_title_keywords(
    movies: DataFrame | MovieIndex, movie_id: int, title: str, k: int = 5, min_len: int = 4
) -> DataFrame:
    """Fallback when the source movie has no genres: any long title word
    matches (minimum_should_match=1), ranked by #matching words.

    Against a :class:`MovieIndex`: exact-term probes of the title
    postings (duplicate query words keep their multiplicity, matching
    the inline path's per-word ``array_contains`` sum)."""
    words = [w for w in title.lower().replace("(", " ").replace(")", " ").split() if len(w) >= min_len]
    if isinstance(movies, MovieIndex):
        if not words:
            return movie_frame(movies).filter(F.lit(False)).withColumn(
                "score", F.lit(0)
            )
        spark = movies.docs.sparkSession
        mult: dict[str, int] = {}
        for w in words:
            mult[w] = mult.get(w, 0) + 1
        wf = _literal_frame(
            spark, list(mult.items()), [("term", "string"), ("mult", "int")]
        )
        scores = (
            movies.postings.filter(F.col("field") == "title")
            .join(F.broadcast(wf), "term")
            .groupBy("movieId")
            .agg(F.sum("mult").cast("int").alias("score"))
        )
        return (
            movies.docs.join(scores, "movieId")
            .filter((F.col("movieId") != movie_id) & (F.col("score") >= 1))
            .select("movieId", "title", "release_date", "genres", "score")
            .orderBy(F.desc("score"), F.asc("movieId"))
            .limit(k)
        )
    toks = tokens("title")
    score = S.keyword_match_count(toks, words, min_len=min_len)
    return (
        movies.filter(S.term("movieId", movie_id) == F.lit(False))  # must_not self
        .select("movieId", "title", "release_date", "genres", score.alias("score"))
        .filter(F.col("score") >= 1)
        .orderBy(F.desc("score"), F.asc("movieId"))
        .limit(k)
    )


def search_hits(movies: DataFrame | MovieIndex, query: str) -> DataFrame:
    """All docs matching the ``GET /search`` fuzzy multi_match (title^3,
    genres^1, AUTO fuzziness), score > 0, before pagination — the frame
    behind both the page window and the ``hits.total.value`` count.

    Against a :class:`MovieIndex`, this is Lucene's actual fuzzy plan:
    each query term expands against the per-field VOCABULARY (distinct
    postings terms — small) by edit distance, expanded terms probe the
    postings by equality, and a doc scores boost × (#query-term
    occurrences fuzzily present in the field). Presence-per-(field,
    query-term) semantics and 4-digit rounding are identical to the
    inline ``multi_match_score`` path (sums of 3.0/1.0 are exact in
    binary float, so fold order is immaterial); guarded equal in
    tests/test_serving.py."""
    terms = [t for t in query.lower().split() if t]
    if isinstance(movies, MovieIndex):
        if not terms:
            return movie_frame(movies).filter(F.lit(False)).withColumn(
                "score", F.round(F.lit(0.0), 4)
            )
        spark = movies.docs.sparkSession
        if movies.terms is not None:
            # r12 (VERDICT task 10): the in-memory terms dictionary makes
            # fuzzy expansion pure Python — the per-request Spark job
            # that scanned the vocab frame through a levenshtein BNLJ is
            # gone; `expanded` arrives as a broadcast literal and the
            # request runs ONE job (the postings probe + top-k).
            rows = [
                (f, term, i)
                for i, (qt, d) in enumerate(
                    (t, S.auto_fuzziness(t)) for t in terms
                )
                for f, term in movies.terms
                if _lev_le(term, qt, d)
            ]
            if not rows:
                return movie_frame(movies).filter(F.lit(False)).withColumn(
                    "score", F.round(F.lit(0.0), 4)
                )
            expanded = _literal_frame(
                spark, rows, [("field", "string"), ("term", "string"), ("qi", "int")]
            )
        else:
            qf = F.broadcast(
                _literal_frame(
                    spark,
                    [(i, t, S.auto_fuzziness(t)) for i, t in enumerate(terms)],
                    [("qi", "int"), ("qterm", "string"), ("dist", "int")],
                )
            )
            # terms dictionary: prebuilt at index time when available (the
            # round-10 serving fix — the per-request postings.distinct()
            # shuffle was the dominant /search cost), else derived ad hoc
            vocab = (
                movies.vocab
                if movies.vocab is not None
                else movies.postings.select("field", "term").distinct()
            )
            expanded = vocab.join(
                qf, F.levenshtein(F.col("term"), F.col("qterm")) <= F.col("dist")
            ).select("field", "term", "qi")
        boost = F.when(F.col("field") == "title", F.lit(_SEARCH_FIELDS["title"])).otherwise(
            F.lit(_SEARCH_FIELDS["genres_text"])
        )
        # ONE shuffle: presence-per-(field, query-term) dedup rides the
        # per-movie collect_set (boost uniquely encodes the field, so
        # (boost, qi) == (field, qi)) instead of a separate distinct
        # exchange before the aggregation
        scores = (
            movies.postings.join(F.broadcast(expanded), ["field", "term"])
            .groupBy("movieId")
            .agg(
                F.round(
                    F.aggregate(
                        F.collect_set(F.struct(boost.alias("b"), F.col("qi"))),
                        F.lit(0.0),
                        lambda acc, x: acc + x["b"],
                    ),
                    4,
                ).alias("score")
            )
        )
        return movies.docs.drop("__title_norm").join(scores, "movieId").filter(
            F.col("score") > 0
        )
    return S.multi_match_score(
        movies.withColumn("genres_text", F.concat_ws(" ", "genres")),
        {"title": _SEARCH_FIELDS["title"], "genres_text": _SEARCH_FIELDS["genres_text"]},
        terms,
        fuzzy=True,
    ).filter(F.col("score") > 0)


def search_movies(
    movies: DataFrame | MovieIndex, query: str, page: int = 1, size: int = 10
) -> DataFrame:
    """Fuzzy multi_match (title^3, genres^1, AUTO fuzziness) + pagination
    clamps (page ≥ 1, size 1..100)."""
    scored = search_hits(movies, query)
    page = max(1, page)
    size = min(max(1, size), 100)
    lo = (page - 1) * size
    return (
        scored.orderBy(F.desc("score"), F.asc("movieId"))
        .offset(lo)
        .limit(size)
        .select("movieId", "title", "release_date", "genres", "score")
    )


def write_movie_index(idx: MovieIndex, index_dir: str) -> None:
    """Persist all index frames as parquet tables under ``index_dir``
    (the offline build step; at scale postings would be bucketed by
    term)."""
    idx.docs.write.mode("overwrite").parquet(f"{index_dir}/docs.parquet")
    idx.postings.write.mode("overwrite").parquet(f"{index_dir}/postings.parquet")
    vocab = (
        idx.vocab
        if idx.vocab is not None
        else idx.postings.select("field", "term").distinct()
    )
    vocab.write.mode("overwrite").parquet(f"{index_dir}/vocab.parquet")


def load_movie_index(spark, index_dir: str, pinned: bool = True) -> MovieIndex:
    """Load a persisted MovieIndex. ``pinned=True`` (default, round-10
    VERDICT task 7) plans every frame from a ``pit_snapshot`` file
    listing, so an index rebuild or append that lands between requests —
    or between the pages of one paginated ``/search`` session — cannot
    duplicate or drop hits for readers opened on the old snapshot
    (exactly ES's PIT contract; proven against a live concurrent append
    in tests/test_serving.py)."""
    from ..sources.readers import pit_snapshot

    def rd(name: str):
        if pinned:
            return pit_snapshot(spark, index_dir, name)
        return spark.read.parquet(f"{index_dir}/{name}.parquet")

    vocab = rd("vocab")
    # terms dictionary into process memory at LOAD time (one bounded
    # collect per serving session, r12): per-request fuzzy expansion
    # then never runs a Spark job over the vocab frame.
    terms = tuple(
        sorted((r["field"], r["term"]) for r in vocab.collect())
    )
    return MovieIndex(
        docs=rd("docs"), postings=rd("postings"), vocab=vocab, terms=terms
    )
