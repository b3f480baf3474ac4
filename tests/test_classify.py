"""Multinomial Naive Bayes classifier (operators/classify.py): parity
with a pure-Python oracle, golden hand-computed values, and the edge
contracts (tokenless docs, OOV-only docs, deterministic tie-break)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.classify import (
    nb_class_stats,
    nb_predict,
    nb_token_loglik,
)

ALPHA = 1.0

TRAIN = [
    # (doc_id, text, label)
    (1, "apple banana apple", "fruit"),
    (2, "banana cherry", "fruit"),
    (3, "carrot potato carrot carrot", "veg"),
    (4, "potato", "veg"),
    (5, "", "veg"),  # tokenless training doc: counted in ndocs only
]
SCORE = [
    (10, "apple apple banana"),  # clearly fruit
    (11, "carrot potato"),  # clearly veg
    (12, ""),  # tokenless -> prior argmax
    (13, "zzz qqq"),  # all-OOV -> prior argmax
    (14, "banana potato"),  # mixed
]


def _py_model():
    """Pure-Python oracle for stats + loglik + scores."""
    from collections import Counter, defaultdict

    cnt = defaultdict(Counter)  # label -> token counts
    docs_per = Counter()
    for _, text, lab in TRAIN:
        toks = [t.lower() for t in text.split()]
        if toks:
            docs_per[lab] += 1
        cnt[lab].update(toks)
    vocab = {t for c in cnt.values() for t in c}
    v = len(vocab)
    ndocs = len(TRAIN)
    stats = {}
    for lab, c in cnt.items():
        n_tok = sum(c.values())
        stats[lab] = {
            "n_tokens": n_tok,
            "log_prior": math.log(docs_per[lab] / ndocs),
            "floor_ll": math.log(ALPHA / (n_tok + ALPHA * v)),
        }
    ll = {
        (t, lab): math.log((c[t] + ALPHA) / (stats[lab]["n_tokens"] + ALPHA * v))
        for lab, c in cnt.items()
        for t in c
    }
    return stats, ll, vocab


def _py_scores(doc_text: str, stats, ll, vocab):
    toks = [t.lower() for t in doc_text.split()]
    inv = [t for t in toks if t in vocab]
    out = {}
    for lab, s in stats.items():
        score = s["log_prior"] + len(inv) * s["floor_ll"]
        for t in inv:
            if (t, lab) in ll:
                score += ll[(t, lab)] - s["floor_ll"]
        out[lab] = round(score, 6)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text", "lang"])
    score = spark.createDataFrame(SCORE, ["doc_id", "text"])
    stats = nb_class_stats(train, alpha=ALPHA)
    model = nb_token_loglik(train, stats, alpha=ALPHA)
    pred = nb_predict(score, model, stats)
    return stats, model, pred


def test_class_stats_match_oracle(frames):
    stats_df, _, _ = frames
    py_stats, _, vocab = _py_model()
    rows = {r["label"]: r for r in stats_df.collect()}
    assert set(rows) == set(py_stats)
    for lab, s in py_stats.items():
        r = rows[lab]
        assert r["vocab_size"] == len(vocab)
        assert r["n_tokens"] == s["n_tokens"]
        assert r["log_prior"] == pytest.approx(s["log_prior"])
        assert r["floor_ll"] == pytest.approx(s["floor_ll"])


def test_tokenless_training_doc_counts_toward_prior_denominator(frames):
    # doc 5 has no tokens: excluded from n_docs(veg) numerator but the
    # prior denominator is ALL training docs (5), so priors don't sum to 1.
    stats_df, _, _ = frames
    rows = {r["label"]: r["log_prior"] for r in stats_df.collect()}
    assert rows["fruit"] == pytest.approx(math.log(2 / 5))
    assert rows["veg"] == pytest.approx(math.log(2 / 5))


def test_token_loglik_sparse_and_correct(frames):
    _, model_df, _ = frames
    _, py_ll, _ = _py_model()
    rows = {(r["token"], r["label"]): r["log_lik"] for r in model_df.collect()}
    assert set(rows) == set(py_ll)  # sparse: observed pairs only
    for k, v in py_ll.items():
        assert rows[k] == pytest.approx(v)


def test_predictions_match_pure_python_argmax(frames):
    _, _, pred_df = frames
    py_stats, py_ll, vocab = _py_model()
    got = {r["doc_id"]: r for r in pred_df.collect()}
    assert set(got) == {d for d, _ in SCORE}
    for doc_id, text in SCORE:
        scores = _py_scores(text, py_stats, py_ll, vocab)
        best = min(sorted(scores), key=lambda lab: (-scores[lab], lab))
        r = got[doc_id]
        assert r["label_pred"] == best, (doc_id, scores)
        assert r["score"] == pytest.approx(scores[best], abs=1e-6)
        assert r["n_invocab"] == sum(
            1 for t in text.lower().split() if t in vocab
        )


def test_tokenless_and_oov_docs_score_prior_only(frames):
    _, _, pred_df = frames
    py_stats, _, _ = _py_model()
    got = {r["doc_id"]: r for r in pred_df.collect()}
    for doc_id in (12, 13):
        r = got[doc_id]
        assert r["n_invocab"] == 0
        # equal priors here -> tie broken by label asc
        assert r["label_pred"] == "fruit"
        assert r["score"] == pytest.approx(
            round(py_stats["fruit"]["log_prior"], 6)
        )


def test_alpha_validation():
    with pytest.raises(ValueError):
        nb_class_stats(None, alpha=0.0)
    with pytest.raises(ValueError):
        nb_token_loglik(None, None, alpha=-1.0)


def test_prediction_is_one_row_per_doc(frames):
    _, _, pred_df = frames
    assert pred_df.count() == len(SCORE)
    assert pred_df.select("doc_id").distinct().count() == len(SCORE)


def test_soft_weights_semantics(spark):
    """Soft-dedup weighting: a family of k near-dups contributes ~1
    effective doc; singletons contribute exactly 1 (registry-level
    semantics checked on in-memory frames)."""
    from pyspark.sql import functions as F

    comp = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20)],
        ["doc_id", "component"],
    )
    docs = spark.createDataFrame(
        [(i, "a" if i <= 3 else "b") for i in range(1, 8)],
        ["doc_id", "source"],
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    doc_sz = (
        docs.join(comp, on="doc_id", how="left")
        .join(sizes, on="component", how="left")
        .select("source", F.coalesce(F.col("size"), F.lit(1)).alias("size"))
    )
    out = {
        r["source"]: r
        for r in doc_sz.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum(1.0 / F.col("size")), 6).alias("effective_docs"),
        )
        .collect()
    }
    # source a: docs 1,2,3 all in one 3-cluster -> 1.0 effective
    assert out["a"]["n_docs"] == 3
    assert out["a"]["effective_docs"] == 1.0
    # source b: docs 4,5 in a 2-cluster (1.0) + singletons 6,7 (2.0)
    assert out["b"]["n_docs"] == 4
    assert out["b"]["effective_docs"] == 3.0
