"""Differential tests for the round-7 catalog entries (q288–q306):
each nontrivial operator is re-derived with an independent
implementation (numpy / itertools / plain Python) on the sf0.001
fixture and compared exactly — the same strategy the dedup and ANN
families use (test_fuzz_differential.py).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from recommandation_de_films_jay_z_entertainment_int_gration_de_big_data_et_ia_spark.plans.catalog import (
    QUERIES,
    load_all,
)

from .conftest import SF_SMOKE

load_all()


def _pdf(name: str, spark) -> pd.DataFrame:
    return QUERIES[name](spark, SF_SMOKE).toPandas()


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


def _toks(text: str) -> list[str]:
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split()


def test_q295_boxplot_matches_numpy_linear(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = _pdf("q295_boxplot", spark)
    for flag, grp in li.groupby("l_returnflag"):
        want = np.percentile(grp["l_quantity"].to_numpy(), [25, 50, 75], method="linear")
        sub = got[got.l_returnflag == flag].sort_values("quartile")
        assert len(sub) == 3
        np.testing.assert_allclose(sub["q_value"].to_numpy(), want, atol=1e-6)
        assert (sub["n"] == len(grp)).all()


def test_q299_span_near_matches_bruteforce(spark):
    docs = _docs()
    want: dict[int, tuple[int, int]] = {}
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        pa = [i for i, t in enumerate(tk) if t == "hash"]
        pb = [i for i, t in enumerate(tk) if t == "join"]
        if not pa or not pb:
            continue
        gaps = [abs(x - y) - 1 for x in pa for y in pb]
        best = min(gaps)
        if best <= 3:
            want[r["doc_id"]] = (best, sum(1 for g in gaps if g <= 3))
    got = _pdf("q299_span_near", spark)
    assert {
        int(r.doc_id): (int(r.best_gap), int(r.n_pairs_within))
        for r in got.itertuples()
    } == want
    assert want, "fixture should contain span_near matches"


def test_q300_itemsets_match_itertools(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    support: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        items = sorted(set(grp["l_partkey"]))
        for k in (2, 3):
            for combo in combinations(items, k):
                support[(k, ",".join(map(str, combo)))] += 1
    want = {key: n for key, n in support.items() if n >= 2}
    got = _pdf("q300_frequent_item_sets", spark)
    assert {
        (int(r.k), r.items): int(r.support) for r in got.itertuples()
    } == want
    assert want, "fixture should contain frequent itemsets"


def test_q290_entropy_matches_python_log2(spark):
    docs = _docs()
    got = _pdf("q290_string_stats", spark).set_index("lang")
    for lang, grp in docs.groupby("lang"):
        chars = Counter("".join(grp["text"]))
        total = sum(chars.values())
        ent = -sum((k / total) * math.log2(k / total) for k in chars.values())
        assert got.loc[lang, "entropy"] == pytest.approx(ent, abs=1e-5)
        lens = grp["text"].str.len()
        assert got.loc[lang, "min_len"] == lens.min()
        assert got.loc[lang, "max_len"] == lens.max()


def test_q305_interval_choice_and_buckets(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    days = ev["ts"].dt.normalize().map(lambda d: (d - pd.Timestamp("1970-01-01")).days)
    span = days.max() - days.min()
    chosen = min(iv for iv in (1, 7, 30, 90, 365) if span // iv + 1 <= 20)
    got = _pdf("q305_auto_date_histogram", spark)
    assert set(got["interval_days"]) == {chosen}
    assert len(got) <= 20
    assert got["doc_count"].sum() == len(ev)


def test_q304_curriculum_stage_invariants(spark):
    got = _pdf("q304_quality_curriculum", spark)
    docs = _docs()
    for lang, grp in got.groupby("lang"):
        # all four stages populated, each within one max-doc of total/4
        assert sorted(grp["stage"]) == [0, 1, 2, 3]
        total = grp["tokens"].sum()
        max_doc = max(len(_toks(t)) for t in docs[docs.lang == lang]["text"])
        for tok in grp["tokens"]:
            assert abs(tok - total / 4) <= max_doc


def test_q302_batching_invariants(spark):
    got = _pdf("q302_length_batching", spark)
    docs = _docs()
    for lang, grp in got.groupby("lang"):
        n_docs_lang = (docs.lang == lang).sum()
        assert grp["n_docs"].sum() == n_docs_lang
        # every batch full except possibly the last
        full = grp.sort_values("batch")["n_docs"].to_numpy()
        assert (full[:-1] == 32).all()
        # utilization consistent with its own columns
        util = grp["real_tokens"] / (grp["n_docs"] * grp["max_len"])
        np.testing.assert_allclose(grp["utilization"], util.round(6), atol=1e-9)


def test_q293_geotile_covers_all_customers(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    got = _pdf("q293_geotile_grid", spark)
    # top-20 at sf0.001 covers every non-empty tile (<=64 possible, few
    # populated at this SF is not guaranteed — so check count sum <= total
    # and keys well-formed z/x/y in range)
    assert got["doc_count"].sum() <= len(cust)
    for t in got["tile"]:
        z, x, y = map(int, t.split("/"))
        assert z == 3 and 0 <= x < 8 and 0 <= y < 8


# ---------------------------------------------------------------------------
# batch 5 (q314-q317): boosting / dis_max / FIM split / matryoshka energy
# ---------------------------------------------------------------------------


def test_q314_boosting_matches_bruteforce(spark):
    docs = _docs()
    scored = []
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        pos = tk.count("merge")
        if pos == 0:
            continue
        demoted = "slow" in tk
        scored.append((r["doc_id"], pos, demoted, pos * (0.5 if demoted else 1.0)))
    scored.sort(key=lambda x: (-x[3], x[0]))
    want = scored[:20]
    got = _pdf("q314_boosting_query", spark)
    assert [
        (int(r.doc_id), int(r.pos_tf), bool(r.demoted), float(r.score))
        for r in got.itertuples()
    ] == want
    assert any(d for _, _, d, _ in want), "fixture should contain demoted docs"


def test_q315_dis_max_matches_bruteforce(spark):
    docs = _docs()
    scored = []
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        tfs = [tk.count(t) for t in ("sort", "window", "scan")]
        if sum(tfs) == 0:
            continue
        score = round(max(tfs) + 0.3 * (sum(tfs) - max(tfs)), 6)
        scored.append((r["doc_id"], *tfs, score))
    scored.sort(key=lambda x: (-x[4], x[0]))
    want = scored[:20]
    got = _pdf("q315_dis_max", spark)
    assert [
        (int(r.doc_id), int(r.tf0), int(r.tf1), int(r.tf2), float(r.score))
        for r in got.itertuples()
    ] == want


def test_q316_fim_split_invariants_and_md5(spark):
    import hashlib

    docs = _docs().set_index("doc_id")
    got = _pdf("q316_fim_transform", spark)
    assert len(got) == (docs["text"].map(lambda t: len(_toks(t)) >= 8)).sum()
    for r in got.itertuples():
        tk = _toks(docs.loc[r.doc_id, "text"])
        n = len(tk)
        assert r.n_tokens == n
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:4], 16)
        span = n // 4
        start = 2 + h % (n - span - 1)
        assert (r.fim_start, r.span_len) == (start, span)
        # prefix + middle + suffix partitions the token list, both ends non-empty
        assert r.prefix_len >= 1 and r.suffix_len >= 1
        assert r.prefix_len + r.span_len + r.suffix_len == n
        middle = " ".join(tk[start - 1 : start - 1 + span])
        assert r.middle_md5 == hashlib.md5(middle.encode()).hexdigest()


def test_q317_energy_monotone_and_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = _pdf("q317_matryoshka_energy", spark)
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    total = (vecs**2).sum(axis=1)
    for (label, d), grp in got.groupby(["label", "d"]):
        mask = (emb["label"] == label).to_numpy()
        frac = np.round((vecs[mask, : int(d)] ** 2).sum(axis=1) / total[mask], 6)
        assert grp["n_vec"].iloc[0] == mask.sum()
        assert grp["avg_energy_frac"].iloc[0] == pytest.approx(frac.mean(), abs=2e-6)
    # energy is monotone non-decreasing in d and exactly 1.0 at full dim
    for label, grp in got.groupby("label"):
        vals = grp.sort_values("d")["avg_energy_frac"].to_numpy()
        assert (np.diff(vals) >= -1e-12).all()
        assert vals[-1] == pytest.approx(1.0, abs=1e-9)


# ---------------------------------------------------------------------------
# batch 6 (q318-q321): intervals / distance_feature / matrix_stats / sign-quant
# ---------------------------------------------------------------------------


def test_q318_intervals_matches_bruteforce(spark):
    docs = _docs()
    want = {}
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        pa = [i for i, t in enumerate(tk) if t == "scan"]
        pb = [i for i, t in enumerate(tk) if t == "filter"]
        pc = [i for i, t in enumerate(tk) if t == "merge"]
        best = None
        for a in pa:  # exhaustive over ALL ordered triples, not greedy
            for b in pb:
                if b <= a:
                    continue
                for c in pc:
                    if c <= b:
                        continue
                    g = c - a - 2
                    best = g if best is None else min(best, g)
        if best is not None and best <= 4:
            want[r["doc_id"]] = best
    got = _pdf("q318_intervals_query", spark)
    assert {int(r.doc_id): int(r.min_gaps) for r in got.itertuples()} == want
    assert want, "fixture should contain interval matches"


def test_q319_distance_feature_matches_pandas(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    o = orders[orders.o_orderstatus == "O"].copy()
    dist = (o["o_orderdate"].dt.normalize() - pd.Timestamp("1998-01-01")).dt.days.abs()
    score = (2.0 * 30.0 / (30 + dist)).round(6)
    want = sorted(
        zip(o["o_orderkey"], dist, score), key=lambda x: (-x[2], x[0])
    )[:20]
    got = _pdf("q319_distance_feature", spark)
    assert [
        (int(r.o_orderkey), int(r.dist_days), float(r.score))
        for r in got.itertuples()
    ] == [(int(k), int(d), float(s)) for k, d, s in want]


def test_q320_matrix_stats_matches_numpy(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    got = _pdf("q320_matrix_stats", spark)
    fields = ("l_quantity", "l_extendedprice", "l_discount")
    for flag, grp in li.groupby("l_returnflag"):
        x = grp[list(fields)].to_numpy(np.float64)
        cov = np.cov(x, rowvar=False, bias=True)
        sd = np.sqrt(np.diag(cov))
        for i, j in ((0, 1), (0, 2), (1, 2)):
            row = got[
                (got.l_returnflag == flag)
                & (got.fx == fields[i])
                & (got.fy == fields[j])
            ].iloc[0]
            assert row["n"] == len(grp)
            assert row["covariance"] == pytest.approx(cov[i, j], rel=1e-6, abs=1e-5)
            assert row["correlation"] == pytest.approx(
                cov[i, j] / (sd[i] * sd[j]), abs=1e-6
            )


def test_q321_sign_quantization_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").set_index("vec_id")
    vecs = {i: np.asarray(v, np.float64) for i, v in emb["embedding"].items()}
    qv = vecs[0]
    rows = []
    for i, v in vecs.items():
        if i == 0:
            continue
        ham = int(((v >= 0) != (qv >= 0)).sum())
        cos = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        rows.append((i, ham, cos))
    rows.sort(key=lambda x: (x[1], x[0]))
    want = rows[:20]
    got = _pdf("q321_sign_quantization", spark)
    assert [(int(r.vec_id), int(r.hamming)) for r in got.itertuples()] == [
        (i, h) for i, h, _ in want
    ]
    for g, (_, _, c) in zip(got.itertuples(), want):
        assert g.cos == pytest.approx(c, abs=1e-6)


# ---------------------------------------------------------------------------
# batch 7 (q322-q325): t_test / sibling bucket aggs / combined_fields / span_not
# ---------------------------------------------------------------------------


def test_q322_t_test_matches_scipy_formula(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    got = _pdf("q322_t_test", spark).set_index("o_orderpriority")
    for prio, grp in orders.groupby("o_orderpriority"):
        a = grp[grp.o_orderstatus == "O"]["o_totalprice"].to_numpy(np.float64)
        b = grp[grp.o_orderstatus == "F"]["o_totalprice"].to_numpy(np.float64)
        if len(a) < 2 or len(b) < 2:
            assert prio not in got.index
            continue
        t = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        assert got.loc[prio, "t_stat"] == pytest.approx(t, abs=1e-5)
        assert got.loc[prio, "n1"] == len(a) and got.loc[prio, "n2"] == len(b)


def test_q323_sibling_aggs_match_numpy(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    rev = (
        orders.groupby(orders["o_orderdate"].dt.to_period("M"))["o_totalprice"]
        .apply(lambda s: float(round(s.round(2).sum(), 2)))
        .to_numpy()
    )
    got = dict(zip(_pdf("q323_sibling_bucket_aggs", spark)["metric"],
                   _pdf("q323_sibling_bucket_aggs", spark)["value"]))
    assert got["count"] == len(rev)
    assert got["min"] == pytest.approx(rev.min(), abs=1e-4)
    assert got["max"] == pytest.approx(rev.max(), abs=1e-4)
    assert got["sum"] == pytest.approx(rev.sum(), abs=1e-2)
    assert got["avg"] == pytest.approx(rev.mean(), abs=1e-4)
    for q, name in ((25, "p25"), (50, "p50"), (75, "p75")):
        want = np.percentile(rev, q, method="linear")
        assert got[name] == pytest.approx(want, abs=1e-4)


def test_q324_combined_fields_matches_bruteforce(spark):
    docs = _docs()
    rows = []
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        c0 = tk.count("fast") + (1 if r["lang"] == "fast" else 0)
        c1 = tk.count("en") + (1 if r["lang"] == "en" else 0)
        if c0 > 0 and c1 > 0:
            rows.append((r["doc_id"], c0, c1, c0 + c1))
    rows.sort(key=lambda x: (-x[3], x[0]))
    want = rows[:20]
    got = _pdf("q324_combined_fields", spark)
    assert [
        (int(r.doc_id), int(r.ctf0), int(r.ctf1), int(r.score))
        for r in got.itertuples()
    ] == want
    # the lang keyword field must actually contribute (term 'en' absent
    # from some matched docs' text)
    assert any(
        "en" not in _toks(docs.set_index("doc_id").loc[d, "text"]) for d, *_ in want
    )


def test_q325_span_not_matches_bruteforce(spark):
    docs = _docs()
    want = {}
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        pa = [i + 1 for i, t in enumerate(tk) if t == "hash"]
        pb = [i + 1 for i, t in enumerate(tk) if t == "join"]
        kept = [a for a in pa if all(abs(a - b) > 2 for b in pb)]
        if kept:
            want[r["doc_id"]] = (len(kept), kept[0])
    got = _pdf("q325_span_not", spark)
    assert {
        int(r.doc_id): (int(r.n_kept), int(r.first_kept)) for r in got.itertuples()
    } == want
    # exclusion must bite somewhere: some doc has hash occurrences dropped
    dropped = False
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        pa = [i + 1 for i, t in enumerate(tk) if t == "hash"]
        pb = [i + 1 for i, t in enumerate(tk) if t == "join"]
        if any(any(abs(a - b) <= 2 for b in pb) for a in pa):
            dropped = True
    assert dropped


# ---------------------------------------------------------------------------
# batch 8 (q326-q329): geo_bounds / moving_percentiles / rank_eval / prefix-cache
# ---------------------------------------------------------------------------


def test_q326_geo_bounds_matches_pandas(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    cust["x"] = (cust.c_custkey * 104729) % 3000
    cust["y"] = (cust.c_custkey * 7919) % 3000
    got = _pdf("q326_geo_bounds", spark).set_index("nationkey")
    for nk, grp in cust.groupby("c_nationkey"):
        row = got.loc[nk]
        assert (
            row["n_points"], row["min_x"], row["max_x"], row["min_y"], row["max_y"]
        ) == (len(grp), grp.x.min(), grp.x.max(), grp.y.min(), grp.y.max())
    assert len(got) == cust.c_nationkey.nunique()


def test_q327_moving_percentiles_match_numpy(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.date).size().sort_index()
    got = _pdf("q327_moving_percentiles", spark).set_index("day")
    assert len(got) == max(0, len(daily) - 6)
    vals = daily.to_numpy()
    for i in range(6, len(daily)):
        day = str(daily.index[i])
        win = vals[i - 6 : i + 1]
        for q, name in ((25, "p25"), (50, "p50"), (75, "p75")):
            want = np.percentile(win, q, method="linear")
            assert got.loc[day, name] == pytest.approx(want, abs=1e-9), (day, name)


def test_q328_rank_eval_matches_bruteforce(spark):
    docs = _docs()
    got = _pdf("q328_rank_eval", spark).set_index("term")
    for term in ("merge", "sort", "scan"):
        scored = []
        for _, r in docs.iterrows():
            tf = _toks(r["text"]).count(term)
            if tf > 0:
                scored.append((-tf, r["doc_id"], r["lang"] == "en"))
        scored.sort()
        top = scored[:10]
        rels = [rel for _, _, rel in top]
        prec = sum(rels) / len(top)
        mrr = 0.0
        for rank, rel in enumerate(rels, start=1):
            if rel:
                mrr = 1.0 / rank
                break
        assert got.loc[term, "n_ret"] == len(top)
        assert got.loc[term, "precision_at_k"] == pytest.approx(prec, abs=1e-6)
        assert got.loc[term, "mrr"] == pytest.approx(mrr, abs=1e-6)


def test_q329_prefix_cache_matches_bruteforce(spark):
    docs = _docs().sort_values(["source", "doc_id"])
    want = {}
    for src, grp in docs.groupby("source"):
        toks = [(_toks(t)) for t in grp["text"]]
        n_prompts = n_hit = cached = 0
        fracs = []
        for prev, cur in zip(toks, toks[1:]):
            cp = 0
            for a, b in zip(prev, cur):
                if a != b:
                    break
                cp += 1
            n_prompts += 1
            n_hit += cp > 0
            cached += cp
            fracs.append(round(cp / len(cur), 6))
        want[src] = (n_prompts, n_hit, cached, round(sum(fracs) / len(fracs), 6))
    got = _pdf("q329_prefix_cache_audit", spark)
    for r in got.itertuples():
        w = want[r.source]
        assert (int(r.n_prompts), int(r.n_hit), int(r.cached_tokens)) == w[:3]
        assert r.avg_shared_frac == pytest.approx(w[3], abs=1e-6)
    assert set(got["source"]) == set(want)


# ---------------------------------------------------------------------------
# batch 9 (q330-q333): rollup / range agg / simple_query_string / children agg
# ---------------------------------------------------------------------------


def test_q330_rollup_levels_consistent(spark):
    docs = _docs()
    got = _pdf("q330_rollup_totals", spark)
    toks_per_doc = docs["text"].map(lambda t: len(_toks(t)))
    # level 0: per (source, lang); level 1: per source; level 3: grand total
    lvl0 = got[got.lvl == 0]
    assert len(lvl0) == docs.groupby(["source", "lang"]).ngroups
    for r in lvl0.itertuples():
        sub = docs[(docs.source == r.source) & (docs.lang == r.lang)]
        assert r.n_docs == len(sub)
        assert r.tokens == toks_per_doc[sub.index].sum()
    lvl1 = got[got.lvl == 1]
    assert len(lvl1) == docs["source"].nunique()
    assert (lvl1["lang"] == "(all)").all()
    assert lvl1["n_docs"].sum() == len(docs)
    lvl3 = got[got.lvl == 3]
    assert len(lvl3) == 1
    assert lvl3.iloc[0]["n_docs"] == len(docs)
    assert lvl3.iloc[0]["tokens"] == toks_per_doc.sum()
    # rollup never emits lang-only buckets (that's CUBE)
    assert set(got["lvl"]) == {0, 1, 3}


def test_q331_range_buckets_match_pandas(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    got = _pdf("q331_range_agg", spark).set_index("bucket")
    bounds = [(0, 125_000), (125_000, 250_000), (250_000, 375_000),
              (375_000, None)]
    seen = 0
    for lo, hi in bounds:
        sub = orders[
            (orders.o_totalprice >= lo)
            & ((orders.o_totalprice < hi) if hi else True)
        ]
        key = f"{lo}-{hi}" if hi else f"{lo}-*"
        if len(sub) == 0:
            assert key not in got.index
            continue
        seen += len(sub)
        assert got.loc[key, "doc_count"] == len(sub)
        assert got.loc[key, "avg_price"] == pytest.approx(
            sub.o_totalprice.round(2).mean(), abs=1e-4
        )
    assert seen == len(orders)


def test_q332_sqs_matches_bruteforce(spark):
    docs = _docs()
    rows = []
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        plus = tk.count("fast")
        if plus == 0 or "slow" in tk:
            continue
        phrase = sum(
            1 for i in range(len(tk) - 1) if tk[i] == "hash" and tk[i + 1] == "join"
        )
        if phrase == 0:
            continue
        rows.append((r["doc_id"], plus, phrase, plus + phrase))
    rows.sort(key=lambda x: (-x[3], x[0]))
    want = rows[:20]
    got = _pdf("q332_simple_query_string", spark)
    assert [
        (int(r.doc_id), int(r.plus_tf), int(r.phrase_tf), int(r.score))
        for r in got.itertuples()
    ] == want
    assert want, "fixture should contain sqs matches"


def test_q333_children_agg_matches_pandas(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    got = _pdf("q333_children_agg", spark).set_index("o_orderpriority")
    for prio, grp in j.groupby("o_orderpriority"):
        assert got.loc[prio, "n_children"] == len(grp)
        assert got.loc[prio, "avg_child_price"] == pytest.approx(
            grp.l_extendedprice.round(2).mean(), abs=1e-4
        )


# ---------------------------------------------------------------------------
# batch 10 (q334-q337): span_or / maxsim / filters agg / edit-distance pairs
# ---------------------------------------------------------------------------


def test_q334_span_or_matches_bruteforce(spark):
    docs = _docs()
    want = {}
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        pu = [i for i, t in enumerate(tk) if t in ("hash", "merge")]
        pj = [i for i, t in enumerate(tk) if t == "join"]
        if not pu or not pj:
            continue
        gaps = [abs(u - j) - 1 for u in pu for j in pj]
        if min(gaps) <= 3:
            want[r["doc_id"]] = (min(gaps), sum(g <= 3 for g in gaps))
    got = _pdf("q334_span_or_near", spark)
    assert {
        int(r.doc_id): (int(r.best_gap), int(r.n_pairs_within))
        for r in got.itertuples()
    } == want
    assert want


def test_q335_maxsim_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    probe_idx = emb.index[emb.vec_id.isin([0, 1, 2])].to_numpy()
    got = _pdf("q335_colbert_maxsim", spark)
    labels = emb["label"].to_numpy()
    want = {}
    for lab in np.unique(labels):
        mask = labels == lab
        score = 0.0
        for q in probe_idx:
            cos = vecs[mask] @ vecs[q] / (norms[mask] * norms[q])
            score += np.round(cos, 6).max()
        want[lab] = round(score, 6)
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(int(r.label), float(r.maxsim_score)) for r in got.itertuples()] == [
        (int(l), pytest.approx(s, abs=2e-6)) for l, s in ranked
    ]
    assert (got["n_probes"] == 3).all()


def test_q336_filters_agg_matches_pandas(spark):
    import json as _json

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    k = ev["props"].map(lambda p: _json.loads(p)["k"])
    f0 = k >= 50
    f1 = ev.event_type == "purchase"
    f2 = ev.event_type == "error"
    got = dict(
        zip(*(lambda d: (d["bucket"], d["doc_count"]))(_pdf("q336_filters_agg", spark)))
    )
    assert got == {
        "big_k": f0.sum(),
        "purchase": f1.sum(),
        "errors": f2.sum(),
        "_other_": (~(f0 | f1 | f2)).sum(),
    }
    # buckets overlap (a purchase with big k) and other_bucket is non-empty
    assert (f0 & (f1 | f2)).any() and got["_other_"] > 0


def test_q337_edit_pairs_match_python(spark):
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    names = sorted(set(part["p_name"]))

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if abs(len(a) - len(b)) <= 1 and lev(a, b) <= 2:
                want.append((a, b, lev(a, b)))
    want.sort()
    got = _pdf("q337_name_edit_pairs", spark)
    assert [(r.name_a, r.name_b, int(r.dist)) for r in got.itertuples()] == want
    assert want, "fixture should contain close name pairs"


# ---------------------------------------------------------------------------
# batch 11 (q338-q339): max repeat run / histogram with empty buckets
# ---------------------------------------------------------------------------


def test_q338_max_repeat_run_matches_bruteforce(spark):
    docs = _docs()
    want = {}
    for _, r in docs.iterrows():
        tk = _toks(r["text"])
        best_len, best_tok, cur = 0, None, 0
        prev = None
        for t in tk:
            cur = cur + 1 if t == prev else 1
            if cur > best_len:
                best_len, best_tok = cur, t
            prev = t
        if best_len >= 2:
            want[r["doc_id"]] = (best_len, best_tok)
    got = _pdf("q338_max_repeat_run", spark)
    assert {
        int(r.doc_id): (int(r.max_run), r.rep_token) for r in got.itertuples()
    } == want
    assert want, "fixture should contain adjacent repeats"


def test_q339_histogram_grid_is_gapfree(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    sub = ev[ev.event_type == "signup"]
    bk = ((sub["value"] * 100).round().astype("int64") // 1000)
    counts = bk.value_counts()
    got = _pdf("q339_histogram_empty_buckets", spark)
    # gap-free integer grid over the populated extent
    keys = got["bucket_key"].to_numpy()
    assert (np.diff(keys) == 10).all()
    assert keys[0] == bk.min() * 10 and keys[-1] == bk.max() * 10
    assert got["doc_count"].sum() == len(sub)
    for r in got.itertuples():
        assert r.doc_count == counts.get(r.bucket_key // 10, 0)
    assert (got["doc_count"] == 0).any(), "fixture should contain empty buckets"


# ---------------------------------------------------------------------------
# batch 12 (q340-q341, post-sweep): geohash grid / significant_text
# ---------------------------------------------------------------------------


def test_q340_geohash_matches_python_bit_interleave(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    counts = {}
    for key in cust["c_custkey"]:
        gx = ((key * 104729) % 3000) * (1 << 15) // 3000
        gy = ((key * 7919) % 3000) * (1 << 15) // 3000
        code = 0
        for i in range(15):
            code |= ((gx >> i) & 1) << (2 * i + 1)
            code |= ((gy >> i) & 1) << (2 * i)
        code10 = code >> 20
        gh = "".join(alpha[(code10 >> (5 * (1 - k))) & 31] for k in range(2))
        counts[gh] = counts.get(gh, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = _pdf("q340_geohash_grid", spark)
    assert [(r.geohash, int(r.doc_count)) for r in got.itertuples()] == want
    assert all(len(g) == 2 and all(c in alpha for c in g) for g, _ in want)


def test_q341_significant_text_matches_bruteforce(spark):
    docs = _docs()
    fg_total = (docs.lang == "en").sum()
    bg_total = len(docs)
    df: dict[str, list[int]] = {}
    for _, r in docs.iterrows():
        for t in set(_toks(r["text"])):
            e = df.setdefault(t, [0, 0])
            e[0] += r["lang"] == "en"
            e[1] += 1
    rows = []
    for t, (fg, bg) in df.items():
        fgp, bgp = fg / fg_total, bg / bg_total
        if fgp > bgp:
            rows.append((t, fg, bg, round((fgp - bgp) * fgp / bgp, 6)))
    rows.sort(key=lambda x: (-x[3], -x[2], x[0]))
    want = rows[:20]
    got = _pdf("q341_significant_text", spark)
    assert [(r.token, int(r.fg_df), int(r.bg_df)) for r in got.itertuples()] == [
        (t, fg, bg) for t, fg, bg, _ in want
    ]
    for g, (_, _, _, j) in zip(got.itertuples(), want):
        assert g.jlh == pytest.approx(j, abs=1e-6)


# ---------------------------------------------------------------------------
# batch 13 (q342-q343, post-sweep): filtered kNN / multi-function score
# ---------------------------------------------------------------------------


def test_q342_filtered_knn_excludes_probe_label(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = {int(r.vec_id): np.asarray(r.embedding, np.float64) for r in emb.itertuples()}
    labels = dict(zip(emb.vec_id.astype(int), emb.label.astype(int)))
    qv, qlabel = vecs[0], labels[0]
    rows = []
    for i, v in vecs.items():
        if labels[i] == qlabel:
            continue
        rows.append((i, labels[i],
                     round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6)))
    rows.sort(key=lambda x: (-x[2], x[0]))
    want = rows[:10]
    got = _pdf("q342_filtered_knn", spark)
    assert [(int(r.vec_id), int(r.label)) for r in got.itertuples()] == [
        (i, l) for i, l, _ in want
    ]
    assert (got["label"] != qlabel).all()
    for g, (_, _, s) in zip(got.itertuples(), want):
        assert g.score == pytest.approx(s, abs=2e-6)


def test_q343_function_score_matches_bruteforce(spark):
    import math

    docs = _docs()
    rows = []
    for _, r in docs.iterrows():
        tf = _toks(r["text"]).count("query")
        if tf == 0:
            continue
        fval = math.sqrt(r["n_chars"]) + (2.0 if r["lang"] == "en" else 0.0)
        rows.append((r["doc_id"], tf, round(tf * fval, 6)))
    rows.sort(key=lambda x: (-x[2], x[0]))
    want = rows[:20]
    got = _pdf("q343_function_score_multi", spark)
    assert [(int(r.doc_id), int(r.tf)) for r in got.itertuples()] == [
        (d, t) for d, t, _ in want
    ]
    for g, (_, _, s) in zip(got.itertuples(), want):
        assert g.score == pytest.approx(s, abs=1e-6)


# ---------------------------------------------------------------------------
# batch 14 (q344-q345, post-sweep): packing manifest / epoch shuffle
# ---------------------------------------------------------------------------


def test_q344_packing_manifest_invariants(spark):
    docs = _docs().sort_values(["source", "doc_id"])
    got = _pdf("q344_packing_manifest", spark)
    assert len(got) == len(docs)
    for src, grp in got.groupby("source"):
        grp = grp.sort_values("doc_id")
        # offsets are the exact running sum of preceding token counts
        run = 0
        sub = docs[docs.source == src]
        for (_, d), (_, g) in zip(sub.iterrows(), grp.iterrows()):
            n = len(_toks(d["text"]))
            assert g["n_toks"] == n and g["offset"] == run
            assert g["context_id"] == run // 128
            assert g["spans_boundary"] == (run // 128 != (run + n - 1) // 128)
            run += n
    assert got["spans_boundary"].any(), "fixture should contain boundary spans"


def test_q345_epoch_shuffle_reproducible_and_distinct(spark):
    import hashlib

    docs = _docs()
    got = _pdf("q345_epoch_shuffle", spark)
    orders = {}
    for epoch in range(3):
        ranked = sorted(
            docs["doc_id"],
            key=lambda d: (hashlib.md5(f"{epoch}:{d}".encode()).hexdigest(), d),
        )[:5]
        sub = got[got.epoch == epoch].sort_values("rank")
        assert list(sub["doc_id"]) == ranked
        orders[epoch] = tuple(ranked)
    # different epochs give different orders
    assert len(set(orders.values())) == 3
