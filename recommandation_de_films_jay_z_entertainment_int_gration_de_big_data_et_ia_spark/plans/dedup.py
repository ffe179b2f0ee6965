"""Dedup query catalog: exact, MinHash+LSH, n-gram Jaccard, SimHash —
each oracle-mirrored in DuckDB SQL sharing the engine's exact hash/shingle
spec (md5-hex, 3-word shingles, 8 hashes × 4 bands, 32-bit simhash)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..sources.readers import load_table
from .catalog import register

NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
TOKS_SQL = f"regexp_split_to_array({NORM_SQL}, ' +')"
# 3-word shingles over the token array `tk` (mirrors functions.text.word_shingles).
SHINGLES_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(tk)-2, 1)+1),"
    " i -> array_to_string(tk[i:i+2], ' ')))"
)
NUM_HASHES, BANDS = 8, 4
# Mega-bucket cap threaded through the operator AND the oracle (buckets
# with more than MAX_BUCKET members carry no blocking signal and cost
# quadratic pair explosion — see operators.dedup.lsh_candidate_pairs).
MAX_BUCKET = 200

# Mirror of functions.text.minhash_signature's chunked hash family:
# hash i = 8-hex-char chunk (i%4) of md5('<i//4>|' || shingle).
_SIG_COLS = ", ".join(
    f"list_sort(list_transform(sh, s -> substr(md5('{i // 4}|' || s), {(i % 4) * 8 + 1}, 8)))[1] AS h{i}"
    for i in range(NUM_HASHES)
)
_BANDS_UNION = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, h{2*b} || h{2*b+1} AS key FROM sig" for b in range(BANDS)
)
# Shared CTE prefix producing LSH candidate pairs (id_a < id_b).
LSH_PAIRS_CTE = f"""
WITH t AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
s AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM t),
sig AS (SELECT doc_id, {_SIG_COLS} FROM s),
bands AS ({_BANDS_UNION}),
bkept AS (
  SELECT bands.band, bands.key, bands.doc_id
  FROM bands JOIN (SELECT band, key FROM bands GROUP BY band, key
                   HAVING COUNT(*) BETWEEN 2 AND {MAX_BUCKET}) g
    ON bands.band = g.band AND bands.key = g.key),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bkept a JOIN bkept b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
"""


# ---------------------------------------------------------------------------
# Exact dedup — demonstrated on a doubled corpus (docs ∪ re-ingested docs)
# so survivors/copy-counts are non-trivial.
# ---------------------------------------------------------------------------
@register(
    "q31_dedup_exact",
    oracle=f"""
    WITH u AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 10000, text FROM documents)
    SELECT md5({NORM_SQL}) AS content_hash, MIN(doc_id) AS survivor_id, COUNT(*) AS n_copies
    FROM u GROUP BY content_hash
    """,
)
def q31_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionAll(docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text"))
    return D.exact_dedup_groups(doubled, "doc_id", "text")


# ---------------------------------------------------------------------------
# MinHash + LSH candidate pairs
# ---------------------------------------------------------------------------
@register(
    "q32_dedup_minhash_pairs",
    oracle=f"{LSH_PAIRS_CTE} SELECT id_a, id_b FROM pairs",
)
def q32_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.doc_shingles(docs, "doc_id", "text", n=3)
    return D.lsh_candidate_pairs(
        D.minhash_bands(sh, "doc_id", num_hashes=NUM_HASHES, bands=BANDS), "doc_id",
        max_bucket=MAX_BUCKET,
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verify on the LSH candidates
# ---------------------------------------------------------------------------
@register(
    "q33_dedup_jaccard_verify",
    oracle=f"""
    {LSH_PAIRS_CTE}
    SELECT id_a, id_b,
           ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 4) AS jaccard
    FROM pairs JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
    """,
)
def q33_dedup_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(docs, "doc_id", "text", n=3, num_hashes=NUM_HASHES,
                                 bands=BANDS, max_bucket=MAX_BUCKET)


# ---------------------------------------------------------------------------
# SimHash fingerprints + near-dup pairs (block trick + Hamming verify)
# ---------------------------------------------------------------------------
def _simhash_sql(bits: int = 32) -> str:
    votes = []
    for p in range(1, bits + 1):
        vote = (
            f"list_reduce(list_transform(tk, t -> CASE WHEN substr(md5(t), {p}, 1) >= '8'"
            f" THEN 1 ELSE -1 END), (x, y) -> x + y)"
        )
        votes.append(f"CASE WHEN {vote} > 0 THEN '1' ELSE '0' END")
    return " || ".join(votes)


@register(
    "q34_dedup_simhash",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents)
    SELECT doc_id, {_simhash_sql()} AS fingerprint FROM t
    """,
)
def q34_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_fingerprints(docs, "doc_id", "text", bits=32)


@register(
    "q35_dedup_simhash_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
    fp AS (SELECT doc_id, {_simhash_sql()} AS fingerprint FROM t),
    blocked AS (
      SELECT doc_id, fingerprint, CAST(b AS VARCHAR) || ':' || substr(fingerprint, b*8 + 1, 8) AS block
      FROM fp, UNNEST([0, 1, 2, 3]) AS u(b)),
    kept AS (
      SELECT * FROM blocked
      WHERE block IN (SELECT block FROM blocked GROUP BY block HAVING COUNT(*) BETWEEN 2 AND 200)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fingerprint AS fa, b.fingerprint AS fb
      FROM kept a JOIN kept b ON a.block = b.block AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(len(list_filter(range(1, 33), i -> substr(fa, i, 1) != substr(fb, i, 1))) AS BIGINT) AS hamming
    FROM cand
    WHERE len(list_filter(range(1, 33), i -> substr(fa, i, 1) != substr(fb, i, 1))) <= 3
    """,
)
def q35_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash_fingerprints(docs, "doc_id", "text", bits=32)
    return D.simhash_pairs(fp, "doc_id", bits=32, blocks=4, max_hamming=3)


# ---------------------------------------------------------------------------
# q78 — duplicate-cluster resolution: connected components over the LSH
# pair graph (min-label propagation; oracle = recursive-CTE transitive
# closure). The step that turns pairs into keep-one-per-cluster decisions.
# ---------------------------------------------------------------------------
@register(
    "q78_dedup_clusters",
    oracle=f"""
    {LSH_PAIRS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT a AS node, b AS reachable FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON r.reachable = e.a)
    SELECT node, LEAST(node, MIN(reachable)) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def q78_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.doc_shingles(docs, "doc_id", "text", n=3)
    pairs = D.lsh_candidate_pairs(
        D.minhash_bands(sh, "doc_id", num_hashes=NUM_HASHES, bands=BANDS), "doc_id",
        max_bucket=MAX_BUCKET,
    )
    return D.dedup_clusters(pairs)


# ---------------------------------------------------------------------------
# q81 — train/test contamination audit: LSH near-dup pairs that straddle
# the q80 hash split, with exact Jaccard evidence. The standard eval-
# hygiene check for training corpora, composed from the dedup + split
# operators.
# ---------------------------------------------------------------------------
_SPLIT_SQL = """
splits AS (
  SELECT doc_id,
         CASE WHEN h < 204 THEN 'train' WHEN h < 230 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT doc_id,
               CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) * 16
               + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS BIGINT) AS h
        FROM documents))
"""


@register(
    "q81_split_contamination",
    oracle=f"""
    {LSH_PAIRS_CTE},
    {_SPLIT_SQL}
    SELECT id_a, id_b, sa2.split AS split_a, sb2.split AS split_b,
           ROUND(CAST(len(list_intersect(sha.sh, shb.sh)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sha.sh, shb.sh))) AS DOUBLE), 4) AS jaccard
    FROM pairs
      JOIN splits sa2 ON sa2.doc_id = id_a
      JOIN splits sb2 ON sb2.doc_id = id_b
      JOIN s sha ON sha.doc_id = id_a
      JOIN s shb ON shb.doc_id = id_b
    WHERE sa2.split != sb2.split
    """,
)
def q81_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r12 NEGATIVE RESULT: pinning sh (consumed by bands + both verify
    # sides) measured FLAT in interleaved A/B (min 2.97 unpinned vs
    # 3.04 pinned) — the three replays are parallel stage inputs of one
    # job, the r11 parallel-consumer class. Deliberately unpinned.
    sh = D.doc_shingles(docs, "doc_id", "text", n=3)
    pairs = D.lsh_candidate_pairs(
        D.minhash_bands(sh, "doc_id", num_hashes=NUM_HASHES, bands=BANDS), "doc_id",
        max_bucket=MAX_BUCKET,
    )
    verified = D.jaccard_verify(pairs, sh, "doc_id")
    hexd = "0123456789abcdef"
    h1 = F.instr(F.lit(hexd), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)) - 1
    h2 = F.instr(F.lit(hexd), F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)) - 1
    h = h1.cast("bigint") * 16 + h2.cast("bigint")
    splits = docs.select(
        "doc_id",
        F.when(h < 204, "train").when(h < 230, "val").otherwise("test").alias("split"),
    )
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        verified.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# q90 — NEAR-dup dedup applied end-to-end: materialize the corpus with
# every non-keeper cluster member removed (keeper = min id per connected
# component of the LSH pair graph, q78's clustering). The final step of
# the dedup story: candidates (q32) → verify (q33) → clusters (q78) →
# APPLY (this).
# ---------------------------------------------------------------------------
@register(
    "q90_neardup_apply",
    oracle=f"""
    {LSH_PAIRS_CTE.replace("WITH ", "WITH RECURSIVE ", 1)},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT a AS node, b AS reachable FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON r.reachable = e.a),
    losers AS (
      SELECT node FROM reach GROUP BY node
      HAVING LEAST(node, MIN(reachable)) != node)
    SELECT doc_id, strlen(text) AS n_bytes FROM documents
    WHERE doc_id NOT IN (SELECT node FROM losers)
    """,
)
def q90_neardup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.doc_shingles(docs, "doc_id", "text", n=3)
    pairs = D.lsh_candidate_pairs(
        D.minhash_bands(sh, "doc_id", num_hashes=NUM_HASHES, bands=BANDS), "doc_id",
        max_bucket=MAX_BUCKET,
    )
    clusters = D.dedup_clusters(pairs)
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes")
    )


# ---------------------------------------------------------------------------
# q99 — incremental dedup: admit the new-batch docs (doc_id % 4 == 0)
# that duplicate nothing in the standing corpus (doc_id % 4 != 0) —
# exact content-hash gate, then LSH-candidate + Jaccard >= 0.5 verify
# against the corpus only. The corpus side of both gates is the
# persistable index state (hash set + band frame): a production
# increment recomputes signatures for the batch only.
# ---------------------------------------------------------------------------
@register(
    "q99_dedup_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
    s AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM t),
    bh AS (SELECT doc_id, md5({NORM_SQL}) AS h FROM documents WHERE doc_id % 4 = 0),
    ch AS (SELECT DISTINCT md5({NORM_SQL}) AS h FROM documents WHERE doc_id % 4 != 0),
    exact_ok AS (SELECT doc_id FROM bh WHERE h NOT IN (SELECT h FROM ch)),
    sig AS (SELECT doc_id, {_SIG_COLS} FROM s),
    bands AS ({_BANDS_UNION}),
    bb AS (SELECT * FROM bands WHERE doc_id IN (SELECT doc_id FROM exact_ok)),
    cbraw AS (SELECT * FROM bands WHERE doc_id % 4 != 0),
    cb AS (
      SELECT cbraw.* FROM cbraw
      JOIN (SELECT band, key FROM cbraw GROUP BY band, key
            HAVING COUNT(*) <= {MAX_BUCKET}) g
        ON cbraw.band = g.band AND cbraw.key = g.key),
    cand AS (
      SELECT DISTINCT bb.doc_id AS id_a, cb.doc_id AS id_b
      FROM bb JOIN cb ON bb.band = cb.band AND bb.key = cb.key),
    near AS (
      SELECT DISTINCT id_a FROM cand
      JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
      WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 4) >= 0.5)
    SELECT doc_id FROM exact_ok WHERE doc_id NOT IN (SELECT id_a FROM near)
    """,
)
def q99_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    return D.incremental_dedup(
        batch, corpus, "doc_id", "text",
        n=3, num_hashes=NUM_HASHES, bands=BANDS,
        threshold=0.5, max_bucket=MAX_BUCKET,
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join with PPJoin-style prefix filtering
# (Xiao et al., "Efficient Similarity Joins for Near Duplicate
# Detection"). Complements the APPROXIMATE MinHash/SimHash family above:
# same Jaccard>=t semantics, but exact and with a deterministic candidate
# bound. Candidate generation never ranks tokens globally — each doc's
# tokens are ordered by (document-frequency, token), a total order
# obtained with one df-join + per-doc array sort, so there is no global
# window / single-partition stage anywhere. Prefix length
# |x| - ceil(t|x|) + 1 guarantees any pair with J>=t shares a prefix
# token; rare-first ordering keeps prefix-token buckets small at scale.
#
# Runs over the SAME 3-word-shingle sets as the MinHash family (plain
# tokens are non-discriminative on this corpus — a shared vocabulary
# makes ~74% of all pairs J>=0.5 at token level, i.e. a quadratic
# result; shingles make this the EXACT answer the q32/q33 LSH pipeline
# approximates, directly comparable pair-for-pair).
# ---------------------------------------------------------------------------
_PP_T = 0.5


@register(
    "q237_ppjoin_exact",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, {TOKS_SQL} AS tk FROM documents),
    t AS (SELECT doc_id, {SHINGLES_SQL} AS tk FROM t0),
    tok AS (SELECT doc_id, u.t AS tok FROM t, UNNEST(tk) AS u(t)),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY tok),
    sorted_tk AS (
      SELECT tok.doc_id, list(tok.tok ORDER BY dfreq.df, tok.tok) AS stk
      FROM tok JOIN dfreq ON tok.tok = dfreq.tok
      GROUP BY tok.doc_id),
    pref AS (
      SELECT doc_id, len(stk) AS l,
             stk[1 : len(stk) - CAST(CEIL({_PP_T} * len(stk)) AS INT) + 1] AS p
      FROM sorted_tk),
    pe AS (SELECT doc_id, l, u.t AS tok FROM pref, UNNEST(p) AS u(t)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.l AS la, b.l AS lb
      FROM pe a JOIN pe b ON a.tok = b.tok AND a.doc_id < b.doc_id
      WHERE LEAST(a.l, b.l) >= {_PP_T} * GREATEST(a.l, b.l)),
    inter AS (
      SELECT c.id_a, c.id_b, c.la, c.lb,
             CAST(len(list_intersect(sa.stk, sb.stk)) AS BIGINT) AS i
      FROM cand c
      JOIN sorted_tk sa ON sa.doc_id = c.id_a
      JOIN sorted_tk sb ON sb.doc_id = c.id_b)
    SELECT id_a, id_b,
           ROUND(CAST(i AS DOUBLE) / (la + lb - i), 6) AS jaccard
    FROM inter
    WHERE CAST(i AS DOUBLE) / (la + lb - i) >= {_PP_T}
    ORDER BY id_a, id_b
    """,
)
def q237_ppjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_shingles materializes the per-doc shingle arrays (one row per
    # doc) — every branch of the PPJoin plan reuses that single
    # evaluation. The join itself is operators.dedup.ppjoin_pairs
    # (prefix filtering under a rare-first total order, array_intersect
    # verify), hypothesis-fuzzed against a brute-force cross join in
    # tests/test_properties.py.
    docs = D.doc_shingles(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id", "text", n=3, out="tk", materialize=True,
    )
    return D.ppjoin_pairs(docs, "doc_id", "tk", threshold=_PP_T).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# q252 — PPJoin at the FP-hostile threshold 0.9, TOKEN level. 0.9 is not
# binary-representable: a float ceil(t*|x|) prefix bound can land one too
# high and silently drop qualifying pairs (the round-4 advisor finding).
# ppjoin_pairs rationalizes the threshold (9/10) and computes every
# prefix/length/positional/verify bound in exact integer arithmetic; the
# oracle mirrors the rational compare (10*i >= 9*(la+lb-i)) over a
# brute-force pair join — fine at oracle scale, while the engine side
# stays prefix-filtered and pre-gated on identical sets (the corpus's
# shared 31-token vocabulary makes token sets maximally collision-heavy,
# exactly the stress the exact-dup pre-gate absorbs).
# ---------------------------------------------------------------------------
@register(
    "q252_ppjoin_high_threshold",
    oracle=f"""
    WITH t AS (SELECT doc_id, list_distinct({TOKS_SQL}) AS s FROM documents
               WHERE doc_id % 10 = 0 AND len(list_distinct({TOKS_SQL})) > 0),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS i,
                 len(a.s) AS la, len(b.s) AS lb
          FROM t a JOIN t b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / (la + lb - i), 6) AS jaccard
    FROM p WHERE 10 * i >= 9 * (la + lb - i)
    ORDER BY id_a, id_b
    """,
)
def q252_ppjoin_high_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deterministic 10% slice: token sets over the synthetic corpus's
    # 31-token vocabulary are mostly near-identical, so the TRUE answer
    # is quadratic in corpus size (~1M pairs at sf0.1 unsliced) — the
    # entry demonstrates rational-threshold exactness, not volume; q237
    # carries the scale story on discriminative shingle sets.
    from ..functions.text import tokens

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.array_distinct(tokens("text")).alias("s"))
    )
    return D.ppjoin_pairs(docs, "doc_id", "s", threshold=0.9).orderBy("id_a", "id_b")
