"""Distributed BPE training: exact parity with a pure-Python reference
trainer, greedy-merge semantics, tie-breaks, validation."""

import collections

import pytest

from hds_functions_spark.operators.bpe import (
    bpe_train_merges,
    word_frequency_table,
)


def _ref_merges(words, n_merges):
    """Classic in-memory BPE trainer (Sennrich-style) for parity checks."""
    dic = collections.Counter(tuple(w) for w in words)
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for syms, c in dic.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new = collections.Counter()
        for syms, c in dic.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        dic = new
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_frequency_table(spark):
    wf = {
        r["word"]: r["n"]
        for r in word_frequency_table(
            _docs(spark, ["Low low NEW", "low"])
        ).collect()
    }
    assert wf == {"low": 3, "new": 1}


def test_matches_reference_trainer(spark):
    texts = ["low low low lower lowest", "new newer newest low"]
    out = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_train_merges(_docs(spark, texts), n_merges=6)
        .orderBy("step")
        .collect()
    ]
    words = " ".join(texts).split()
    assert out == _ref_merges(words, 6)


def test_greedy_nonoverlapping_merge(spark):
    # 'aaaa' with top pair (a,a): greedy left-to-right gives aa|aa, so
    # step 2's top pair must be (aa, aa)
    out = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_train_merges(_docs(spark, ["aaaa"]), n_merges=2)
        .orderBy("step")
        .collect()
    ]
    assert out == [("a", "a"), ("aa", "aa")]


def test_tie_breaks_to_lexicographic_pair(spark):
    # 'ba' and 'dc': both pairs count 1; (b,a) < (d,c) lexicographically
    out = bpe_train_merges(_docs(spark, ["ba dc"]), n_merges=1).collect()
    assert (out[0]["merge_left"], out[0]["merge_right"]) == ("b", "a")


def test_merged_symbol_participates_next_step(spark):
    # after (l,o)->lo the pair (lo,w) must be countable and win
    out = [
        (r["merge_left"], r["merge_right"])
        for r in bpe_train_merges(
            _docs(spark, ["low low low"]), n_merges=2
        ).orderBy("step").collect()
    ]
    assert out == [("l", "o"), ("lo", "w")]


def test_validates_n_merges(spark):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(_docs(spark, ["x"]), n_merges=0)


def test_word_segmentation_after_merges(spark):
    from hds_functions_spark.operators.bpe import bpe_word_segmentation

    seg = {
        r["word"]: (list(r["subwords"]), r["n_subwords"])
        for r in bpe_word_segmentation(
            _docs(spark, ["low low low lower"]), n_merges=2
        ).collect()
    }
    # merges learned: (l,o) then (lo,w) -> 'low' is one token
    assert seg["low"] == (["low"], 1)
    assert seg["lower"] == (["low", "e", "r"], 3)


def test_encode_stats_compression(spark):
    from hds_functions_spark.operators.bpe import bpe_encode_stats

    docs = _docs(spark, ["low low lower", "low"])
    out = {r["doc_id"]: r for r in bpe_encode_stats(docs, n_merges=2).collect()}
    # doc 0: words low(1) low(1) lower(3) -> 5 subwords / 3 words
    assert out[0]["n_words"] == 3 and out[0]["n_subwords"] == 5
    assert out[0]["subwords_per_word"] == round(5 / 3, 6)
    assert out[1]["n_words"] == 1 and out[1]["n_subwords"] == 1


def test_encode_drops_empty_docs(spark):
    from hds_functions_spark.operators.bpe import bpe_encode_stats

    docs = _docs(spark, ["low", ""])
    out = bpe_encode_stats(docs, n_merges=1).collect()
    assert {r["doc_id"] for r in out} == {0}


def test_exhaustion_stops_early_single_char_words(spark):
    """No adjacent pairs anywhere (every word is one char): the trainer
    must emit ZERO merges — not an all-NULL row that would corrupt the
    dictionary rewrite — mirroring the reference trainer's `if not pc`
    early exit."""
    out = bpe_train_merges(_docs(spark, ["a b c a", "b c"]), n_merges=3)
    assert out.count() == 0
    # matches the in-memory reference on the same corpus
    assert _ref_merges("a b c a b c".split(), 3) == []


def test_exhaustion_mid_training_keeps_valid_prefix(spark):
    """Pairs run out after some merges: emit exactly the valid prefix and
    leave segmentation/encoding usable (sym not NULLed)."""
    from hds_functions_spark.operators.bpe import (
        bpe_encode_stats,
        bpe_word_segmentation,
    )

    texts = ["ab ab ab"]
    out = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_train_merges(_docs(spark, texts), n_merges=5)
        .orderBy("step")
        .collect()
    ]
    assert out == _ref_merges("ab ab ab".split(), 5) == [("a", "b", 3)]
    seg = {
        r["word"]: list(r["subwords"])
        for r in bpe_word_segmentation(_docs(spark, texts), n_merges=5)
        .collect()
    }
    assert seg == {"ab": ["ab"]}
    enc = bpe_encode_stats(_docs(spark, texts), n_merges=5).collect()
    assert enc[0]["n_subwords"] == 3
