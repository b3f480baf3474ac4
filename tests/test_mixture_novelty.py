"""mixture_epoch_plan (operators/sampling.py) and ngram_novelty
(operators/profiling.py): pure-Python parity + edge contracts."""

from __future__ import annotations

import math

import pytest

from hds_functions_spark.operators.profiling import ngram_novelty
from hds_functions_spark.operators.sampling import mixture_epoch_plan


def test_mixture_epoch_plan_matches_hand_computation(spark):
    rows = [
        ("a", 100),
        ("a", 300),  # a: 400 tokens
        ("b", 100),  # b: 100 tokens
    ]
    df = spark.createDataFrame(rows, ["source", "n_tokens"])
    out = {
        r["source"]: r
        for r in mixture_epoch_plan(
            df, alpha=0.5, budget_multiplier=2.0
        ).collect()
    }
    z = math.sqrt(400) + math.sqrt(100)
    w_a, w_b = math.sqrt(400) / z, math.sqrt(100) / z
    budget = 500 * 2.0
    assert out["a"]["n_docs"] == 2 and out["a"]["n_tokens"] == 400
    assert out["a"]["natural_share"] == pytest.approx(0.8)
    assert out["a"]["weight"] == pytest.approx(round(w_a, 6))
    assert out["a"]["tokens_needed"] == pytest.approx(round(w_a * budget, 1))
    assert out["a"]["epochs"] == pytest.approx(round(w_a * budget / 400, 6))
    # b is low-resource: alpha=0.5 up-weights it past its natural share
    assert out["b"]["weight"] > out["b"]["natural_share"]
    assert out["b"]["epochs"] == pytest.approx(round(w_b * budget / 100, 6))
    # epochs > 1 -> sample_rate caps at 1
    assert out["b"]["sample_rate"] == 1.0
    assert out["a"]["sample_rate"] == min(1.0, out["a"]["epochs"])


def test_mixture_alpha_one_recovers_natural_shares(spark):
    df = spark.createDataFrame(
        [("a", 300), ("b", 100)], ["source", "n_tokens"]
    )
    out = {
        r["source"]: r
        for r in mixture_epoch_plan(
            df, alpha=1.0, budget_multiplier=1.0
        ).collect()
    }
    for s in ("a", "b"):
        assert out[s]["weight"] == pytest.approx(out[s]["natural_share"])
        assert out[s]["epochs"] == pytest.approx(1.0)


def test_mixture_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["source", "n_tokens"])
    with pytest.raises(ValueError):
        mixture_epoch_plan(df, alpha=-0.1)
    with pytest.raises(ValueError):
        mixture_epoch_plan(df, budget_multiplier=0.0)


NOV_DOCS = [
    (1, "a b c d e f"),  # grams: "a b c", "b c d", "c d e", "d e f" — all new
    (2, "a b c d x"),  # "a b c", "b c d" seen in doc 1; "c d x" new
    (3, "a b"),  # too short for 3-grams
    (4, ""),  # empty
    (5, "c d x y z"),  # "c d x" first seen in doc 2; "d x y","x y z" new
]


def test_ngram_novelty_matches_hand_computation(spark):
    df = spark.createDataFrame(NOV_DOCS, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in ngram_novelty(df, ngram=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert (out[1]["n_grams"], out[1]["n_novel"]) == (4, 4)
    assert out[1]["novelty"] == 1.0
    assert (out[2]["n_grams"], out[2]["n_novel"]) == (3, 1)
    assert out[2]["novelty"] == pytest.approx(round(1 / 3, 6))
    # gramless docs carry explicit zeros, not nulls
    for d in (3, 4):
        assert (out[d]["n_grams"], out[d]["n_novel"], out[d]["novelty"]) == (
            0,
            0,
            0.0,
        )
    assert (out[5]["n_grams"], out[5]["n_novel"]) == (3, 2)


def test_ngram_novelty_distinct_grams_within_doc(spark):
    # a self-repeating doc counts each distinct gram once
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    out = ngram_novelty(df, ngram=2).collect()[0]
    # distinct 2-grams: "a b", "b a"
    assert out["n_grams"] == 2 and out["n_novel"] == 2


def test_ngram_novelty_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        ngram_novelty(df, ngram=0)


def test_incremental_novelty_slice_identity(spark):
    """When every corpus id precedes every batch id, the incremental
    build equals the full build restricted to batch docs."""
    from hds_functions_spark.operators.profiling import (
        ngram_novelty_incremental,
    )

    import random

    rng = random.Random(11)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(0, 10))))
        for i in range(40)
    ]
    corpus = [d for d in docs if d[0] < 25]
    batch = [d for d in docs if d[0] >= 25]
    full = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(
            spark.createDataFrame(docs, ["doc_id", "text"]), ngram=2
        ).collect()
        if r["doc_id"] >= 25
    }
    inc = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty_incremental(
            spark.createDataFrame(batch, ["doc_id", "text"]),
            spark.createDataFrame(corpus, ["doc_id", "text"]),
            ngram=2,
        ).collect()
    }
    assert inc == full


def test_incremental_novelty_corpus_hit_never_novel(spark):
    from hds_functions_spark.operators.profiling import (
        ngram_novelty_incremental,
    )

    batch = spark.createDataFrame(
        [(100, "x y z"), (101, "x y q")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in ngram_novelty_incremental(batch, corpus, ngram=2).collect()
    }
    # "x y" is in the corpus -> never novel; "y z" novel in 100;
    # "y q" novel in 101
    assert out[100] == (2, 1)
    assert out[101] == (2, 1)


def test_epoch_expand_copies_match_python_replay(spark):
    import hashlib

    from hds_functions_spark.operators.sampling import epoch_expand

    docs = [(i, "a" if i < 6 else "b") for i in range(10)]
    plan = [("a", 2.5), ("b", 0.5)]
    df = spark.createDataFrame(docs, ["doc_id", "source"])
    plan_df = spark.createDataFrame(plan, ["source", "epochs"])
    out = epoch_expand(df, plan_df, salt="s").collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["epoch_idx"])
    exp = {}
    for doc_id, src in docs:
        e = dict(plan)[src]
        h = int(hashlib.md5(f"{doc_id}\x1fs".encode()).hexdigest()[:15], 16)
        u = (h % 10_000 + 0.5) / 10_000
        n = int(e) + (1 if u < e - int(e) else 0)
        if n > 0:
            exp[doc_id] = list(range(n))
    assert {k: sorted(v) for k, v in got.items()} == exp
    # every 'a' doc appears at least floor(2.5)=2 times
    for doc_id, src in docs:
        if src == "a":
            assert len(got[doc_id]) >= 2


def test_epoch_expand_drops_unplanned_sources(spark):
    from hds_functions_spark.operators.sampling import epoch_expand

    df = spark.createDataFrame([(1, "a"), (2, "zz")], ["doc_id", "source"])
    plan_df = spark.createDataFrame([("a", 1.0)], ["source", "epochs"])
    out = epoch_expand(df, plan_df).collect()
    assert {r["doc_id"] for r in out} == {1}
