"""Serving-edge adapter: the reference's REST endpoints as pure
request→DataFrame→JSON functions.

Each function mirrors one Flask route of the reference API
(``/root/reference/src/api.py``) — same request validation, same branch
structure (400 / 404 / disambiguation / pagination clamps), same response
JSON shape — but composes the engine's DataFrame operators
(:mod:`.operators.movierec`) instead of Elasticsearch query DSL, and
collects only the final top-k rows (the one legitimate driver
materialization, SURVEY §3.3). A web framework would wrap these 1:1;
none is imported here, so the engine core stays framework-free.

Endpoint ↔ reference map:

- :func:`recommend_endpoint`  ↔ ``POST /recommend``  (api.py:74-162)
- :func:`movie_endpoint`      ↔ ``GET /movie/<id>``  (api.py:164-184)
- :func:`search_endpoint`     ↔ ``GET /search``      (api.py:186-238)
- :func:`health_endpoint`     ↔ ``GET /health``      (api.py:240-249)
- :func:`index_endpoint`      ↔ ``GET /``            (api.py:251-263)

Documents use the ES ``_source`` shape the reference indexes
(``src/elasticsearch_ingest.py:126-132``):
``{"movieId": int, "title": str, "release_date": str|None,
"genres": [str]}``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from .operators import movierec
from .operators.movierec import MovieIndex

VERSION = "1.0.0"
Response = tuple[int, dict[str, Any]]

# Every endpoint accepts either the raw movies DataFrame (ad-hoc path)
# or a prebuilt movierec.MovieIndex (the production serving path: each
# request probes the persisted index instead of re-tokenizing the
# corpus; responses are identical — tests/test_serving.py runs the
# golden answers against BOTH inputs).


def _doc(row: Row) -> dict[str, Any]:
    """Row → ES ``_source`` document, with the reference ingest's
    coercions: genres None→[] (elasticsearch_ingest.py:115-124),
    release_date falsy→None (:130)."""
    d = row.asDict()
    return {
        "movieId": int(d["movieId"]),
        "title": str(d["title"]),
        "release_date": str(d["release_date"]) if d.get("release_date") else None,
        "genres": list(d["genres"]) if d.get("genres") else [],
    }


def recommend_endpoint(movies: DataFrame | MovieIndex, body: dict | None) -> Response:
    """``POST /recommend`` (api.py:74-162): title lookup with 404 /
    disambiguation branches, then genre-overlap recommendations — or the
    title-keyword fallback when the movie has no genres, with keywords
    taken from the REQUEST title (api.py:124), words longer than 3 chars,
    minimum_should_match=1."""
    if not body:
        return 400, {"error": "Invalid JSON"}
    movie_title = body.get("title")
    if not movie_title:
        return 400, {"error": "Title is required"}

    status, hits = movierec.lookup_title(movies, movie_title, size=5)
    if status == "none":
        return 404, {"error": "Movie not found"}
    rows = hits.collect()
    if status == "ambiguous":
        return 200, {
            "message": "Multiple movies found, please select one",
            "movies": [{"movieId": int(r.movieId), "title": r.title} for r in rows],
        }
    movie = _doc(rows[0])
    if not movie["genres"]:
        recs = movierec.recommend_by_title_keywords(
            movies, movie["movieId"], movie_title, k=5, min_len=4
        )
    else:
        recs = movierec.recommend_by_genre_overlap(
            movies, movie["movieId"], movie["genres"], k=5
        )
    return 200, {
        "movie": movie,
        "recommendations": [_doc(r) for r in recs.collect()],
    }


def movie_endpoint(movies: DataFrame | MovieIndex, movie_id) -> Response:
    """``GET /movie/<id>`` (api.py:164-184): exact-id lookup. A
    non-numeric id makes the reference's ES term query throw, surfacing
    as its 500 branch — mirrored here."""
    try:
        mid = int(str(movie_id))
    except (TypeError, ValueError) as e:
        return 500, {"error": f"Error retrieving movie: {e}"}
    frame = movierec.movie_frame(movies)
    rows = (
        frame.filter(frame["movieId"] == mid)
        .select("movieId", "title", "release_date", "genres")
        .limit(1)
        .collect()
    )
    if not rows:
        return 404, {"error": "Movie not found"}
    return 200, _doc(rows[0])


def search_endpoint(movies: DataFrame | MovieIndex, args: dict) -> Response:
    """``GET /search`` (api.py:186-238): fuzzy multi_match over
    title^3 + genres with offset pagination. Clamps mirror the reference
    exactly: page < 1 → 1; size outside 1..100 → reset to the DEFAULT 10
    (not clamped to the bound); non-integer page/size hits the int() in
    the try block → the 500 branch. ``total`` is the full hit count
    (hits.total.value), independent of the page window."""
    query = args.get("q")
    if not query:
        return 400, {"error": "Query parameter 'q' is required"}
    try:
        page = int(args.get("page", 1))
        size = int(args.get("size", 10))
        if page < 1:
            page = 1
        if size < 1 or size > 100:
            size = 10

        # one multi_match evaluation AND one Spark action serve both the
        # page and the total (the ES reference gets hits + total from a
        # single query too): the full hit count rides the page rows as a
        # global count window instead of a separate count() job — at
        # serving-request latency the per-job round-trip dominates, so
        # halving the action count matters more than the single-partition
        # exchange the window costs (the hit frame is catalog-bounded).
        from pyspark.sql import Window

        hits = movierec.search_hits(movies, query)
        page_rows = (
            hits.withColumn(
                "__total", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
            )
            .orderBy(F.desc("score"), F.asc("movieId"))
            .offset((page - 1) * size)
            .limit(size)
            .select("movieId", "title", "release_date", "genres", "__total")
            .collect()
        )
        if page_rows:
            total = int(page_rows[0]["__total"])
        else:
            # page beyond the last hit (or zero hits): the window rode
            # rows that don't exist — one count() fallback, same frame
            total = hits.count()
        return 200, {
            "movies": [_doc(r) for r in page_rows],
            "page": page,
            "size": size,
            "total": total,
        }
    except Exception as e:  # noqa: BLE001 — mirrors api.py:236-238
        return 500, {"error": f"Error during search: {e}"}


def health_endpoint(movies: DataFrame | MovieIndex | None) -> Response:
    """``GET /health`` (api.py:240-249). The backend liveness probe is a
    1-row query against the movie frame (the engine's analog of
    ``es.ping()``); the response keeps the reference's keys with
    ``engine`` standing in for ``elasticsearch``."""
    try:
        ok = movies is not None and movierec.movie_frame(movies).limit(1).count() >= 0
    except Exception:  # noqa: BLE001
        ok = False
    backend = "OK" if ok else "NOT CONNECTED"
    return (200 if ok else 503), {
        "status": "OK",
        "engine": backend,
        "version": VERSION,
    }


def index_endpoint() -> Response:
    """``GET /`` (api.py:251-263): static API documentation."""
    return 200, {
        "status": "API running",
        "version": VERSION,
        "endpoints": {
            "/recommend": "POST - Get recommendations for a movie (requires title in JSON body)",
            "/movie/<id>": "GET - Get details for a specific movie",
            "/search": "GET - Search for movies (requires q parameter, optional page and size)",
            "/health": "GET - Check API and engine health",
        },
    }
