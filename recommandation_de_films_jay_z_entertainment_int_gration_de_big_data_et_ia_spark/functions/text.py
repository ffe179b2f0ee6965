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
    """Whitespace tokens of the normalized text (array<string>, no empties)."""
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
    exactly reproducible in SQL (``min(md5(i || '|' || s))``). Lexicographic
    min over uniformly distributed hex strings is equivalent to numeric min
    over the hash values.
    """
    def _perm(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    return F.array(*[F.array_min(F.transform(shingles, _perm(i))) for i in range(num_hashes)])


def simhash_hex(tok: Column, bits: int = 16) -> Column:
    """A 16-digit hex-char SimHash variant, portable to SQL.

    Spec (ours, deterministic): for each of the first ``bits`` hex positions
    p (1-based) of md5(token), a token votes +1 if the digit at p is >= '8'
    in byte order (top bit of the nibble set — '8'..'9','a'..'f') else -1,
    weighted by the token's count. Fingerprint bit p = 1 iff the vote sum is
    positive. Returned as a ``bits``-char '0'/'1' string.
    """

    def _voter(p: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), p, 1) >= F.lit("8"), F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for p in range(1, bits + 1):
        vote = F.aggregate(tok, F.lit(0), _voter(p))
        bit_cols.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def stopword_count(tok: Column) -> Column:
    return F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS)))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))
