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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from . import search as S


def lookup_title(movies: DataFrame, title_query: str, size: int = 5) -> tuple[str, DataFrame]:
    """Phrase-match a title; returns (status, frame) where status ∈
    {'none', 'ambiguous', 'unique'} mirroring api.py:95-116's branches."""
    hits = movies.filter(S.phrase_match("title", title_query)).select(
        "movieId", "title", "release_date", "genres"
    ).orderBy(F.asc("movieId")).limit(size)
    n = hits.count()
    status = "none" if n == 0 else ("unique" if n == 1 else "ambiguous")
    return status, hits


def recommend_by_genre_overlap(
    movies: DataFrame, movie_id: int, genres: list[str], k: int = 5
) -> DataFrame:
    """bool{must: terms(genres), must_not: term(movieId)} ranked by genre
    overlap size (deterministic stand-in for ES relevance)."""
    pred = S.bool_query(
        must=[S.terms_overlap(F.col("genres"), genres)],
        must_not=[S.term("movieId", movie_id)],
    )
    overlap = F.size(
        F.array_intersect(F.col("genres"), F.array(*[F.lit(g) for g in genres]))
    )
    return (
        movies.filter(pred)
        .select("movieId", "title", "release_date", "genres", overlap.alias("score"))
        .orderBy(F.desc("score"), F.asc("movieId"))
        .limit(k)
    )


def recommend_by_title_keywords(
    movies: DataFrame, movie_id: int, title: str, k: int = 5, min_len: int = 4
) -> DataFrame:
    """Fallback when the source movie has no genres: any long title word
    matches (minimum_should_match=1), ranked by #matching words."""
    words = [w for w in title.lower().replace("(", " ").replace(")", " ").split() if len(w) >= min_len]
    toks = tokens("title")
    score = S.keyword_match_count(toks, words, min_len=min_len)
    return (
        movies.filter(S.term("movieId", movie_id) == F.lit(False))  # must_not self
        .select("movieId", "title", "release_date", "genres", score.alias("score"))
        .filter(F.col("score") >= 1)
        .orderBy(F.desc("score"), F.asc("movieId"))
        .limit(k)
    )


def search_hits(movies: DataFrame, query: str) -> DataFrame:
    """All docs matching the ``GET /search`` fuzzy multi_match (title^3,
    genres^1, AUTO fuzziness), score > 0, before pagination — the frame
    behind both the page window and the ``hits.total.value`` count."""
    terms = [t for t in query.lower().split() if t]
    return S.multi_match_score(
        movies.withColumn("genres_text", F.concat_ws(" ", "genres")),
        {"title": 3.0, "genres_text": 1.0},
        terms,
        fuzzy=True,
    ).filter(F.col("score") > 0)


def search_movies(
    movies: DataFrame, query: str, page: int = 1, size: int = 10
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
