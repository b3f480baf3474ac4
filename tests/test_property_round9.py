"""Seeded property-fuzz of the round-9 operators (the
test_property_round8.py strategy): random inputs, engine output checked
against pure-Python oracles.

- ``pq_encode``: codes equal the brute-force per-subspace argmin (ties
  to the lowest index) for ARBITRARY codebooks, including tie-heavy and
  degenerate ones.
- ``pq_adc_topk``: distances equal the Python ADC sum and the ranking
  respects the rounded-distance/vec_id order.
- ``dsir_gumbel_topk`` + ``dsir_log_weights`` end-to-end: the selected
  set equals the Python replay of the full pipeline.
- ``kn_trigram_logprob_scores`` degenerate shapes: empty train corpus,
  score==train, single-doc train.
"""

from __future__ import annotations

import hashlib
import math
import random

import pytest


def _py_encode(vec, books):
    codes = []
    sub = len(books[0][0])
    for s, book in enumerate(books):
        seg = vec[s * sub : (s + 1) * sub]
        best = min(
            (sum((a - b) * (a - b) for a, b in zip(seg, c)), i)
            for i, c in enumerate(book)
        )
        codes.append(best[1])
    return codes


@pytest.mark.parametrize("seed", [9, 41])
def test_pq_encode_matches_python_argmin(spark, seed):
    from hds_functions_spark.operators.similarity import pq_encode

    rng = random.Random(seed)
    d, m, k = 12, 3, 4
    # tie-heavy codebooks: values drawn from a tiny grid so equal
    # distances happen and the lowest-index tie-break is exercised
    books = [
        [[rng.choice([-1.0, 0.0, 1.0]) for _ in range(d // m)]
         for _ in range(k)]
        for _ in range(m)
    ]
    rows = [
        (i, [rng.choice([-1.0, -0.5, 0.0, 0.5, 1.0]) for _ in range(d)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: [r.code_0, r.code_1, r.code_2]
        for r in pq_encode(df, books).collect()
    }
    for i, vec in rows:
        assert got[i] == _py_encode(vec, books), i


@pytest.mark.parametrize("seed", [23])
def test_pq_adc_distances_match_python(spark, seed):
    from hds_functions_spark.operators.similarity import pq_adc_topk, pq_encode

    rng = random.Random(seed)
    d, m, k = 8, 2, 3
    books = [
        [[rng.uniform(-1, 1) for _ in range(d // m)] for _ in range(k)]
        for _ in range(m)
    ]
    rows = [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = pq_encode(df, books)
    queries = df.filter("vec_id < 3").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    out = pq_adc_topk(codes, queries, books, k=40).collect()
    vecs = dict(rows)
    sub = d // m
    for r in out:
        q = vecs[r.query_id]
        cs = _py_encode(vecs[r.vec_id], books)
        exp = 0.0
        for s in range(m):
            cent = books[s][cs[s]]
            seg = q[s * sub : (s + 1) * sub]
            exp += sum((a - b) * (a - b) for a, b in zip(seg, cent))
        assert r.adc_dist == pytest.approx(round(exp, 6), abs=2e-6)
    # ranking: ascending (dist, vec_id) per query, self excluded
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.adc_dist, r.vec_id))
    for q, lst in by_q.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        assert [(d_, v) for _, d_, v in lst] == sorted(
            (d_, v) for _, d_, v in lst
        )
        assert all(v != q for _, _, v in lst)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.mark.parametrize("seed", [5])
def test_dsir_pipeline_end_to_end_python_replay(spark, seed):
    """weights -> gumbel top-k, replayed fully in Python: the selected
    (doc_id, rank) sequence must match exactly."""
    from hds_functions_spark.operators.selection import (
        dsir_gumbel_topk,
        dsir_log_weights,
    )

    rng = random.Random(seed)
    B = 32
    vocab = ["aa", "bb", "cc", "dd", "ee", "xx", "yy"]
    raw = {i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
           for i in range(40)}
    tgt = {100 + i: " ".join(rng.choice(vocab[:4]) for _ in range(5))
           for i in range(8)}
    rdf = spark.createDataFrame(list(raw.items()), "doc_id long, text string")
    tdf = spark.createDataFrame(list(tgt.items()), "doc_id long, text string")
    w = dsir_log_weights(rdf, tdf, buckets=B, alpha=1.0)
    sel = [(r.doc_id, r.rank)
           for r in dsir_gumbel_topk(w, k=10, salt="pz").collect()]

    # ---- python replay ----
    def grams(t):
        toks = [x.lower() for x in t.split()]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bag(t):
        out = {}
        for g in grams(t):
            b = _h60(g) % B
            out[b] = out.get(b, 0) + 1
        return out

    cr, ct = {}, {}
    for t in raw.values():
        for b, c in bag(t).items():
            cr[b] = cr.get(b, 0) + c
    for t in tgt.values():
        for b, c in bag(t).items():
            ct[b] = ct.get(b, 0) + c
    tr, tt = sum(cr.values()), sum(ct.values())
    keys = []
    for d, t in raw.items():
        lw = sum(
            c * (math.log((ct.get(b, 0) + 1.0) / (tt + B))
                 - math.log((cr[b] + 1.0) / (tr + B)))
            for b, c in bag(t).items()
        )
        lw = round(lw, 6)
        u = (_h60(f"{d}pz") % 1_000_000 + 0.5) / 1_000_000
        keys.append((round(lw - math.log(-math.log(u)), 6), -d))
    keys.sort(reverse=True)
    exp = [(-nd, i + 1) for i, (_k, nd) in enumerate(keys[:10])]
    assert sel == exp


def test_kn_degenerate_shapes(spark):
    from hds_functions_spark.operators.profiling import (
        kn_trigram_logprob_scores,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    score = spark.createDataFrame(
        [(0, "a b c d"), (1, "xy")], "doc_id long, text string"
    )
    # empty train corpus: nothing is scoreable -> empty result
    assert kn_trigram_logprob_scores(empty, score).count() == 0
    # single-doc train, score == train: every trigram is in-vocab and
    # the model assigns it positive probability
    one = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    rows = kn_trigram_logprob_scores(one, one).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_trigrams == 2 and r.n_scored == 2 and r.coverage == 1.0
    assert r.avg_logprob < 0
    with pytest.raises(ValueError, match="discount"):
        kn_trigram_logprob_scores(one, one, discount=1.5)
