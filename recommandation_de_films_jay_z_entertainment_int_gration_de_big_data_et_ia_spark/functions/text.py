"""Text column-expression library — tokenize / shingle / hash / stats.

All functions return Column expressions built from JVM-side built-ins
(whole-stage-codegen friendly; zero Python UDFs) and are specified so the
exact same computation is expressible in ANSI SQL for the DuckDB oracle:

- normalization: lowercase, non-alphanumerics → space, trim
- tokens: split normalized text on whitespace runs
- hashing: md5 hex strings (identical across engines), never engine-native
  ``hash()`` (Spark murmur3 ≠ DuckDB's hash)

These are the building blocks for the search operators (SURVEY §2.8) and
the dedup/fingerprint extensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small English stopword list used by language-ID and quality scoring.
# Fixed and public-domain; keep in sync with the oracle SQL literal.
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")


def normalize_text(col: Column | str) -> Column:
    """lower + collapse non-alphanumerics to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>).

    NB: an empty/punctuation-only input normalizes to '' and splits to
    [''] — one empty token, not an empty array (so such rows contribute
    dl=1 and '' to BM25 vocabularies). The DuckDB oracle's
    regexp_split_to_array does the same, so parity holds; do not filter
    one side without the other."""
    return F.split(normalize_text(col), r" +")


def distinct_tokens_sorted(col: Column | str) -> Column:
    return F.array_sort(F.array_distinct(tokens(col)))


def word_shingles(tok: Column, n: int) -> Column:
    """n-gram word shingles: space-joined windows of ``n`` consecutive tokens.

    SQL mirror: ``list_transform(range(1, len(t)-n+2), i -> array_to_string(t[i:i+n-1], ' '))``.
    Documents shorter than ``n`` tokens yield a single shingle of the whole text.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok) - F.lit(n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n)))


def md5_hex(col: Column) -> Column:
    """Portable content hash (md5 hex string — identical in DuckDB)."""
    return F.md5(col)


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature as an array of ``num_hashes`` hex-string minima.

    Permutation *i* is simulated by hashing ``'i|shingle'`` with md5 and
    taking the lexicographic minimum — a standard min-wise scheme that is
    exactly reproducible in SQL. Lexicographic min over uniformly
    distributed hex strings is equivalent to numeric min over the hashes.

    Hash family: permutation i = chunk ``i % 4`` (8 hex chars) of
    ``md5(str(i // 4) + '|' + shingle)`` — 4 independent 32-bit hashes per
    md5, so only ``ceil(num_hashes / 4)`` md5 evaluations per shingle,
    folded to elementwise minima in a single traversal (one transform+min
    per hash function would cost ``num_hashes`` md5 per shingle — ~3×
    slower, measured at sf0.1).

    SQL mirror (per i): ``list_sort(list_transform(sh, s ->
    substr(md5('<i//4>|' || s), <(i%4)*8 + 1>, 8)))[1]``.
    """
    n_md5 = (num_hashes + 3) // 4

    def _chunks(s: Column) -> Column:
        hashes = [F.md5(F.concat(F.lit(f"{k}|"), s)) for k in range(n_md5)]
        return F.array(
            *[F.substring(hashes[i // 4], (i % 4) * 8 + 1, 8) for i in range(num_hashes)]
        )

    init = F.array_repeat(F.lit("~"), num_hashes)  # '~' sorts after all hex chars
    return F.aggregate(
        F.transform(shingles, _chunks),
        init,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
    )


def minhash_band_keys(shingles: Column, num_hashes: int, bands: int) -> Column:
    """Array of ``bands`` LSH band keys (concatenated signature rows).

    Built inside the signature fold's ``finish`` lambda so the signature
    accumulator is bound ONCE — extracting keys from a separate
    ``minhash_signature`` column would re-inline (and re-evaluate) the
    whole fold per key under projection collapsing.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    n_md5 = (num_hashes + 3) // 4

    def _chunks(s: Column) -> Column:
        hashes = [F.md5(F.concat(F.lit(f"{k}|"), s)) for k in range(n_md5)]
        return F.array(
            *[F.substring(hashes[i // 4], (i % 4) * 8 + 1, 8) for i in range(num_hashes)]
        )

    def _keys(acc: Column) -> Column:
        return F.array(
            *[
                F.concat(*[F.element_at(acc, b * rows + r + 1) for r in range(rows)])
                for b in range(bands)
            ]
        )

    return F.aggregate(
        F.transform(shingles, _chunks),
        F.array_repeat(F.lit("~"), num_hashes),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
        _keys,
    )


def simhash_hex(tok: Column, bits: int = 16) -> Column:
    """A 16-digit hex-char SimHash variant, portable to SQL.

    Spec (ours, deterministic): for each of the first ``bits`` hex positions
    p (1-based) of md5(token), a token votes +1 if the digit at p is >= '8'
    in byte order (top bit of the nibble set — '8'..'9','a'..'f') else -1,
    weighted by the token's count. Fingerprint bit p = 1 iff the vote sum is
    positive. Returned as a ``bits``-char '0'/'1' string.

    One md5 per token (hashes materialized first, then all ``bits`` vote
    positions folded in a single traversal — versus one aggregate per bit,
    which recomputes md5 ``bits`` times per token).
    """
    hashes = F.transform(tok, lambda t: F.md5(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(1), F.lit(bits)), lambda p: F.substring(h, p, 1)),
            lambda a, d: a + F.when(d >= F.lit("8"), F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.concat_ws(
        "", F.transform(votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0")))
    )


def stopword_count(tok: Column) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))
