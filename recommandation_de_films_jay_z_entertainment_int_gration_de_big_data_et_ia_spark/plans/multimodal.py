"""Multimodal query catalog: binary payload plumbing + Arrow-batched
feature extraction (deterministic fake decode → fully oracle-checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.readers import load_table
from .catalog import register


@register(
    "q49_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           md5(lower(substring(hex(encode(text)), 1, 16))) AS head_fp,
           CAST(strlen(text) % 7 AS DOUBLE) AS f0,
           CAST(strlen(text) % 11 AS DOUBLE) AS f1,
           CAST(strlen(text) % 13 AS DOUBLE) AS f2
    FROM documents
    """,
)
def q49_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bin_docs = MM.to_binary_docs(docs, "doc_id", "text")
    feats = MM.extract_features(bin_docs, "doc_id")
    return feats.select(
        "doc_id",
        "n_bytes",
        "head_fp",
        F.element_at("features", 1).alias("f0"),
        F.element_at("features", 2).alias("f1"),
        F.element_at("features", 3).alias("f2"),
    )


# ---------------------------------------------------------------------------
# q91 — video frame sampling: the 1→N mapInPandas fan-out (every 24th
# frame of each fake-decoded payload). The deterministic fake decoder is
# fully specified (n_frames = n_bytes % 240 + 1, fp = md5("id:idx")) so
# the oracle replays it exactly — the Spark side still runs the real
# Arrow-batched executor fan-out a production decoder would use.
# ---------------------------------------------------------------------------
@register(
    "q91_multimodal_frames",
    oracle="""
    WITH d AS (SELECT doc_id, strlen(text) % 240 + 1 AS n_frames FROM documents),
    f AS (SELECT doc_id, unnest(range(0, n_frames, 24)) AS frame_idx FROM d)
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           md5(doc_id || ':' || frame_idx) AS frame_fp
    FROM f
    """,
)
def q91_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return MM.sample_frames(MM.to_binary_docs(docs, "doc_id", "text"), stride=24)


# ---------------------------------------------------------------------------
# q262 — audio-style windowed RMS energy: the payload is treated as
# unsigned 8-bit PCM and windowed (64 samples, hop 32, full windows
# only) inside Arrow mapInPandas; per-window sum-of-squares is EXACT
# int64, so rms = round(sqrt(ss/64), 6) is bit-identical to the oracle's
# SQL replay (ord() per char — the corpus is ASCII, so UTF-8 bytes ==
# code points). This is the audio third of the multimodal family next
# to q49 (features) and q91 (frame fan-out): same binary plumbing, 1→N
# window fan-out, numpy vectorization per batch.
# ---------------------------------------------------------------------------
_RMS_W, _RMS_H = 64, 32


@register(
    "q262_audio_rms_windows",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
    w AS (SELECT doc_id, text, u.s AS start,
                 CAST(u.s / {_RMS_H} AS BIGINT) AS window_idx
          FROM d, UNNEST(range(0, n - {_RMS_W} + 1, {_RMS_H})) AS u(s)
          WHERE n >= {_RMS_W}),
    b AS (SELECT doc_id, window_idx,
                 SUM(CAST(ord(substr(text, CAST(start + i + 1 AS INT), 1)) AS BIGINT)
                     * CAST(ord(substr(text, CAST(start + i + 1 AS INT), 1)) AS BIGINT)) AS ss
          FROM w, UNNEST(range(0, {_RMS_W})) AS v(i)
          GROUP BY doc_id, window_idx)
    SELECT doc_id, window_idx,
           ROUND(sqrt(CAST(ss AS DOUBLE) / {_RMS_W}), 6) AS rms
    FROM b ORDER BY doc_id, window_idx
    """,
)
def q262_audio_rms_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bin_docs = MM.to_binary_docs(docs, "doc_id", "text")
    return MM.audio_rms_windows(bin_docs, window=_RMS_W, hop=_RMS_H).orderBy(
        "doc_id", "window_idx"
    )


# ---------------------------------------------------------------------------
# q271 — image perceptual-hash (dHash) near-dup dedup: the multimodal
# member of the dedup family. Raw 16×16 grayscale frames (synthesized
# deterministically from doc_id — docs congruent mod 19 share a frame,
# so dup groups exist by construction) flow through the real Arrow
# mapInPandas decode → integer 2×2 downsample → 56-bit dHash, then an
# exact hash-groupBy yields duplicate groups. Every pixel is arithmetic
# in doc_id, so the DuckDB oracle re-derives the SAME fingerprints
# bit-for-bit — an exact oracle through a real binary decode path
# (operators/multimodal.py:image_dhash; PNG/JPEG ingestion swaps a PIL
# decode into the same plumbing).
#
# Shape (100 TB): hashing is one row-preserving Arrow pass, zero
# shuffles; the dedup is one hash-groupBy — identical scale shape to
# exact text dedup (q31), with the 56-bit fingerprint standing in for
# the md5.
# ---------------------------------------------------------------------------
_DH_K = 19


def _dh_px(x: str, y: str) -> str:
    return f"((7 * k + 13 * ({x}) + 31 * ({y})) % 251)"


def _dh_g(x: str, y: str) -> str:
    return (
        "(("
        + " + ".join(
            _dh_px(f"2*({x}){dx}", f"2*({y}){dy}")
            for dx in ("", "+1")
            for dy in ("", "+1")
        )
        + ") // 4)"
    )


@register(
    "q271_image_dhash_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, doc_id % {_DH_K} AS k FROM documents),
    h AS (
      SELECT doc_id,
             SUM(CASE WHEN {_dh_g('x', 'y')} < {_dh_g('x + 1', 'y')}
                 THEN CAST(1 AS BIGINT) << (y * 7 + x) ELSE CAST(0 AS BIGINT) END) AS dhash
      FROM d, UNNEST(range(0, 8)) AS uy(y), UNNEST(range(0, 7)) AS ux(x)
      GROUP BY doc_id),
    g AS (SELECT dhash, COUNT(*) AS cnt FROM h GROUP BY dhash)
    SELECT h.doc_id, CAST(h.dhash AS BIGINT) AS dhash,
           CAST(g.cnt AS BIGINT) AS group_size
    FROM h JOIN g USING (dhash)
    ORDER BY h.doc_id
    """,
)
def q271_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    frames = MM.synth_raw_frames(docs, "doc_id", n_distinct=_DH_K)
    # two consumers (fingerprints + group counts) — checkpoint so the
    # Arrow stage runs once
    h = MM.image_dhash(frames, "doc_id").select("doc_id", "dhash").localCheckpoint(
        eager=True
    )
    g = h.groupBy("dhash").agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
    return (
        h.join(F.broadcast(g), "dhash")
        .select("doc_id", "dhash", "group_size")
        .orderBy("doc_id")
    )
