"""WordPiece training: exact parity with a pure-Python likelihood-scored
reference trainer, divergence from the count-scored BPE argmax, ties,
exhaustion, validation."""

import collections

import pytest

from hds_functions_spark.operators.wordpiece import (
    wordpiece_encode_stats,
    wordpiece_train_merges,
    wordpiece_word_segmentation,
)


def _ref_merges(words, n_merges):
    """Classic in-memory WordPiece trainer: merge argmax by
    count(ab) / (count(a) * count(b)), ties to the smallest pair."""
    dic = collections.Counter(tuple(w) for w in words)
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        sc = collections.Counter()
        for syms, c in dic.items():
            for s in syms:
                sc[s] += c
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(),
            key=lambda kv: (
                -(kv[1] / (float(sc[kv[0][0]]) * float(sc[kv[0][1]]))),
                kv[0],
            ),
        )
        merges.append((a, b, cnt, sc[a], sc[b]))
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


def _expand(texts):
    words = []
    for t in texts:
        words.extend(t.lower().split())
    return words


def test_matches_reference_trainer(spark):
    texts = ["low low low lower lowest", "new newer newest low"]
    out = [
        (
            r["merge_left"], r["merge_right"], r["pair_count"],
            r["count_left"], r["count_right"],
        )
        for r in wordpiece_train_merges(_docs(spark, texts), n_merges=5)
        .orderBy("step")
        .collect()
    ]
    assert out == _ref_merges(_expand(texts), 5)


def test_diverges_from_count_scored_bpe(spark):
    """'aa' is the most FREQUENT pair but 'a' is ubiquitous, so its
    likelihood score is tiny; the rare-but-exclusive 'xy' pair must win
    under WordPiece while BPE would pick ('a','a')."""
    from hds_functions_spark.operators.bpe import bpe_train_merges

    texts = ["aaaa aaaa aaaa aaaa xy"]
    docs = _docs(spark, texts)
    wp = wordpiece_train_merges(docs, n_merges=1).collect()[0]
    bpe = bpe_train_merges(docs, n_merges=1).collect()[0]
    assert (wp["merge_left"], wp["merge_right"]) == ("x", "y")
    assert (bpe["merge_left"], bpe["merge_right"]) == ("a", "a")


def test_score_arithmetic(spark):
    # one word 'ab' (n=1): count(a)=1, count(b)=1, pair=1 -> score 1.0
    row = wordpiece_train_merges(
        _docs(spark, ["ab"]), n_merges=1
    ).collect()[0]
    assert row["pair_count"] == 1
    assert row["count_left"] == 1 and row["count_right"] == 1
    assert row["score"] == pytest.approx(1.0)


def test_tie_breaks_lexicographically(spark):
    # 'xy' and 'ab' both score 1/(1*1); the smaller pair must win
    row = wordpiece_train_merges(
        _docs(spark, ["xy ab"]), n_merges=1
    ).collect()[0]
    assert (row["merge_left"], row["merge_right"]) == ("a", "b")


def test_exhaustion_stops_early(spark):
    # single-char words: no adjacent pair anywhere -> zero merge rows
    out = wordpiece_train_merges(_docs(spark, ["a b c"]), n_merges=3)
    assert out.count() == 0
    assert out.columns == [
        "step", "merge_left", "merge_right", "pair_count",
        "count_left", "count_right", "score",
    ]


def test_segmentation_and_encode(spark):
    texts = ["ab ab ab cd"]
    seg = {
        r["word"]: (list(r["subwords"]), r["n_subwords"])
        for r in wordpiece_word_segmentation(
            _docs(spark, texts), n_merges=1
        ).collect()
    }
    # 'cd' merges first (c,d rarer than a,b? counts: a=3,b=3,c=1,d=1;
    # score(ab)=3/9, score(cd)=1/1 -> cd wins)
    assert seg["cd"] == (["cd"], 1)
    assert seg["ab"] == (["a", "b"], 2)
    enc = wordpiece_encode_stats(_docs(spark, texts), n_merges=1).collect()
    assert enc[0]["n_words"] == 4
    assert enc[0]["n_subwords"] == 2 * 3 + 1  # ab->2 subwords x3, cd->1
    assert enc[0]["subwords_per_word"] == pytest.approx(7 / 4)


def test_validation(spark):
    docs = _docs(spark, ["ab"])
    with pytest.raises(ValueError, match="n_merges"):
        wordpiece_train_merges(docs, n_merges=0)
    with pytest.raises(ValueError, match="n_merges"):
        wordpiece_word_segmentation(docs, n_merges=0)
