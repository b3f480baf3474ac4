"""Seeded property-fuzz of the round-9 continuation operators (the
test_property_round9.py strategy): random corpora, engine output
checked against pure-Python oracles.

- Naive Bayes: the full train+predict pipeline replayed in Python —
  priors, floors, sparse log-likelihoods, the sparse-delta scoring
  identity and the (score desc, label asc) argmax — on random corpora
  with tokenless docs, OOV-only docs and class-unseen tokens mixed in.
- ``ngram_novelty``: first-occurrence replay over random repetitive
  token streams (duplicates common by construction).
- ``mixture_epoch_plan``: closed-form replay including the
  ``sample_rate`` cap.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest

VOCAB = ["aa", "bb", "cc", "dd", "ee", "zz"]
LABELS = ["x", "y", "z"]


def _rand_docs(rng, n, allow_empty=True):
    out = []
    for i in range(n):
        if allow_empty and rng.random() < 0.1:
            out.append((i, ""))
        else:
            out.append(
                (i, " ".join(rng.choices(VOCAB, k=rng.randint(1, 12))))
            )
    return out


def _py_nb(train, score, alpha=1.0):
    cnt = defaultdict(Counter)
    docs_per = Counter()
    for _, text, lab in train:
        toks = text.lower().split()
        if toks:
            docs_per[lab] += 1
        cnt[lab].update(toks)
    vocab = {t for c in cnt.values() for t in c}
    v, ndocs = len(vocab), len(train)
    stats, ll = {}, {}
    for lab in cnt:
        n_tok = sum(cnt[lab].values())
        stats[lab] = (
            math.log(docs_per[lab] / ndocs),
            math.log(alpha / (n_tok + alpha * v)),
        )
        for t, c in cnt[lab].items():
            ll[(t, lab)] = math.log((c + alpha) / (n_tok + alpha * v))
    preds = {}
    for doc_id, text in score:
        toks = [t for t in text.lower().split() if t in vocab]
        best = None
        for lab in sorted(stats):
            prior, floor = stats[lab]
            s = prior + len(toks) * floor
            for t in toks:
                if (t, lab) in ll:
                    s += ll[(t, lab)] - floor
            s = round(s, 6)
            if best is None or s > best[0] or (s == best[0] and lab < best[1]):
                best = (s, lab)
        preds[doc_id] = (best[1], best[0], len(toks))
    return preds


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_nb_pipeline_matches_python_replay(spark, seed):
    from hds_functions_spark.operators.classify import (
        nb_class_stats,
        nb_predict,
        nb_token_loglik,
    )

    rng = random.Random(seed)
    train = [
        (i, t, rng.choice(LABELS)) for i, t in _rand_docs(rng, 40)
    ]
    score = [(100 + i, t) for i, t in _rand_docs(rng, 25)]
    # inject an OOV-heavy doc explicitly
    score.append((999, "qqqq wwww"))
    train_df = spark.createDataFrame(train, ["doc_id", "text", "lang"])
    score_df = spark.createDataFrame(score, ["doc_id", "text"])
    stats = nb_class_stats(train_df)
    model = nb_token_loglik(train_df, stats)
    got = {
        r["doc_id"]: (r["label_pred"], r["score"], r["n_invocab"])
        for r in nb_predict(score_df, model, stats).collect()
    }
    want = _py_nb(train, score)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-6)
        assert got[d][2] == want[d][2]


@pytest.mark.parametrize("seed", [3, 17])
def test_ngram_novelty_matches_python_replay(spark, seed):
    from hds_functions_spark.operators.profiling import ngram_novelty

    rng = random.Random(seed)
    docs = _rand_docs(rng, 30)
    n = 2
    first, per_doc = {}, {}
    for doc_id, text in sorted(docs):
        toks = text.lower().split()
        grams = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
        novel = 0
        for g in sorted(grams):
            if g not in first:
                first[g] = doc_id
            if first[g] == doc_id:
                novel += 1
        per_doc[doc_id] = (len(grams), novel)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(df, ngram=n).collect()
    }
    assert set(got) == {d for d, _ in docs}
    for d, (ng, nv) in per_doc.items():
        assert got[d][0] == ng and got[d][1] == nv, (d, got[d], (ng, nv))
        want_nov = round(nv / ng, 6) if ng else 0.0
        assert got[d][2] == pytest.approx(want_nov, abs=1e-6)


@pytest.mark.parametrize("seed", [5, 31])
def test_mixture_plan_matches_python_replay(spark, seed):
    from hds_functions_spark.operators.sampling import mixture_epoch_plan

    rng = random.Random(seed)
    rows = [
        (f"s{i}", rng.randint(1, 500))
        for i in range(rng.randint(2, 8))
        for _ in range(rng.randint(1, 3))
    ]
    alpha, mult = rng.choice([0.0, 0.5, 0.7, 1.0]), rng.choice([0.5, 2.0])
    agg = defaultdict(lambda: [0, 0])
    for s, t in rows:
        agg[s][0] += 1
        agg[s][1] += t
    total = sum(v[1] for v in agg.values())
    z = sum(v[1] ** alpha for v in agg.values())
    df = spark.createDataFrame(rows, ["source", "n_tokens"])
    got = {
        r["source"]: r
        for r in mixture_epoch_plan(
            df, alpha=alpha, budget_multiplier=mult
        ).collect()
    }
    assert set(got) == set(agg)
    for s, (nd, nt) in agg.items():
        w = nt**alpha / z
        epochs = w * total * mult / nt
        r = got[s]
        assert r["n_docs"] == nd and r["n_tokens"] == nt
        assert r["weight"] == pytest.approx(round(w, 6), abs=1e-6)
        assert r["epochs"] == pytest.approx(round(epochs, 6), abs=1e-6)
        assert r["sample_rate"] == pytest.approx(
            round(min(epochs, 1.0), 6), abs=1e-6
        )
