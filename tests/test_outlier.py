"""knn_outlier_scores (operators/similarity.py): pure-Python parity on
a tiny corpus with a planted outlier, plus the short-corpus fallback."""

from __future__ import annotations

import math

import pytest

from hds_functions_spark.operators.similarity import knn_outlier_scores

# 2-d vectors: a tight cluster around (1, 0) plus one planted outlier
VECS = [
    (1, [1.0, 0.0]),
    (2, [0.99, 0.05]),
    (3, [0.98, -0.05]),
    (4, [1.0, 0.02]),
    (5, [-1.0, 0.0]),  # planted outlier (opposite direction)
]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(d / (na * nb), 6)


def _py_kth(qid, k):
    qvec = dict(VECS)[qid]
    sims = sorted(
        (( _cos(qvec, v), -i) for i, v in VECS if i != qid), reverse=True
    )
    k_eff = min(k, len(sims))
    return sims[k_eff - 1][0], k_eff


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_matches_pure_python_and_flags_planted_outlier(spark, emb):
    queries = emb.selectExpr("vec_id as query_id", "embedding")
    out = {
        r["query_id"]: r
        for r in knn_outlier_scores(emb, queries, k=3).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    for qid in out:
        kth, n = _py_kth(qid, 3)
        assert out[qid]["kth_sim"] == pytest.approx(kth, abs=1e-6)
        assert out[qid]["n_neighbors"] == n
        assert out[qid]["outlier_score"] == pytest.approx(
            round(1.0 - kth, 6), abs=1e-6
        )
    scores = {q: r["outlier_score"] for q, r in out.items()}
    assert max(scores, key=scores.get) == 5  # the planted outlier wins


def test_short_corpus_falls_back_to_farthest_neighbor(spark, emb):
    queries = emb.selectExpr("vec_id as query_id", "embedding")
    out = {
        r["query_id"]: r
        for r in knn_outlier_scores(emb, queries, k=100).collect()
    }
    for qid, r in out.items():
        kth, n = _py_kth(qid, 100)
        assert n == 4  # only 4 other vectors exist
        assert r["n_neighbors"] == 4
        assert r["kth_sim"] == pytest.approx(kth, abs=1e-6)


def test_k_validation(spark, emb):
    with pytest.raises(ValueError):
        knn_outlier_scores(emb, emb, k=0)
