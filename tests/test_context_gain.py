"""kn_context_gain_scores (operators/profiling.py): the trigram side
must agree exactly with the trusted kn_trigram_logprob_scores, the
contrast must be internally consistent, and context-rich text must
out-gain shuffled text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.profiling import (
    kn_context_gain_scores,
    kn_trigram_logprob_scores,
)

TRAIN = [
    (2, "the cat sat on the mat and the cat ran"),
    (4, "the dog sat on the mat and the dog ran"),
    (6, "a cat and a dog sat on a mat"),
]
SCORE = TRAIN + [
    (1, "the cat sat on the mat"),  # context-faithful
    (3, "mat the on sat cat the"),  # same vocab, shuffled order
    (5, "zz qq ww"),  # all OOV -> no scoreable trigram, dropped
]


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    score = spark.createDataFrame(SCORE, ["doc_id", "text"])
    gain = kn_context_gain_scores(train, score)
    tri = kn_trigram_logprob_scores(train, score)
    return gain, tri


def test_trigram_side_matches_trusted_operator(frames):
    gain, tri = frames
    g = {r["doc_id"]: r for r in gain.collect()}
    t = {r["doc_id"]: r for r in tri.collect()}
    assert set(g) == set(t)  # same docs survive the >=1-scoreable gate
    for d in t:
        assert g[d]["n_scored"] == t[d]["n_scored"]
        assert g[d]["avg_lp3"] == pytest.approx(t[d]["avg_logprob"], abs=2e-4)


def test_all_oov_doc_dropped(frames):
    gain, _ = frames
    assert 5 not in {r["doc_id"] for r in gain.collect()}


def test_gain_is_diff_of_averages(frames):
    gain, _ = frames
    for r in gain.collect():
        assert r["context_gain"] == pytest.approx(
            r["avg_lp3"] - r["avg_lp2"], abs=2e-4
        )


def test_context_faithful_text_gains_more_than_shuffled(frames):
    gain, _ = frames
    g = {r["doc_id"]: r["context_gain"] for r in gain.collect()}
    assert g[1] > g[3]


def test_discount_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        kn_context_gain_scores(df, df, discount=1.0)
