"""Text-analysis function tests."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.functions.text import (
    add_fingerprint,
    add_language_id,
    add_quality_score,
    add_text_stats,
    char_ngrams,
    token_count,
    tokens,
    word_ngrams,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, ""),
            (3, "  spaced   out  "),
            (4, "le chat est sur la table et il ne dort pas"),
            (5, "1234 5678!!!"),
        ],
        "doc_id: long, text: string",
    )


def test_tokens_and_count(spark, docs):
    out = docs.select("doc_id", tokens("text").alias("t"), token_count("text").alias("n"))
    got = {r["doc_id"]: (r["t"], r["n"]) for r in out.collect()}
    assert got[1][1] == 9
    assert got[2] == ([], 0)
    assert got[3] == (["spaced", "out"], 2)


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("",)], ["s"])
    out = df.select(char_ngrams(F.col("s"), 3).alias("g")).collect()
    assert out[0]["g"] == ["abc", "bcd"]
    assert out[1]["g"] == []  # shorter than n
    assert out[2]["g"] == []


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a",)], ["s"])
    out = df.select(word_ngrams(tokens("s"), 2).alias("g")).collect()
    assert out[0]["g"] == ["a b", "b c", "c d"]
    assert out[1]["g"] == []


def test_text_stats(docs):
    out = add_text_stats(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 9
    assert rows[1]["punct_ratio"] == 0.0
    assert rows[2]["avg_token_len"] is None  # empty text
    assert rows[5]["digit_ratio"] == pytest.approx(8 / 12)
    assert rows[5]["punct_ratio"] == pytest.approx(3 / 12)


def test_quality_score(docs):
    out = add_quality_score(docs)
    rows = {r["doc_id"]: r["quality_score"] for r in out.collect()}
    assert rows[2] == 0.0  # empty: fails everything
    assert rows[1] == 0.75  # 44 chars -> fails length band; rest pass
    assert 0.0 <= rows[5] <= 0.5


def test_language_id(docs):
    out = add_language_id(docs)
    rows = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert rows[1] == "en"
    assert rows[4] == "fr"
    assert rows[2] == "und"  # no tokens
    assert rows[5] == "und"  # no stopword hits


def test_fingerprint_normalisation(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "different")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in add_fingerprint(df).collect()}
    assert out[1] == out[2]  # case + whitespace normalised
    assert out[1] != out[3]
    assert all(v >= 0 for v in out.values())  # portable hash is non-negative


def test_bpe_token_count(spark):
    from hds_functions_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [
            (1, "it's 42 degrees, really!"),
            (2, ""),
            (3, "hello"),
            (4, "a+b=c"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", bpe_token_count("text").alias("n")).collect()
    }
    # it|'s|42|degrees|,|really|! -> 7 ; ''->0 ; hello->1 ; a|+|b|=|c -> 5
    assert out == {1: 7, 2: 0, 3: 1, 4: 5}


# --- repetition stats -----------------------------------------------------

def test_repetition_stats(spark):
    from hds_functions_spark.functions.text import add_repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # heavy bigram repetition
            (2, "all tokens differ here"),
            (3, "line\nline\nother"),    # duplicate lines
            (4, ""),                     # empty -> all null
        ],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in add_repetition_stats(df).collect()}
    # doc 1: tokens [a b a b a b] -> 2 distinct / 6 -> dup 2/3
    assert rows[1]["dup_token_ratio"] == pytest.approx(2 / 3)
    # bigrams: [a b, b a, a b, b a, a b] -> top 'a b' 3/5
    assert rows[1]["top_bigram_ratio"] == pytest.approx(0.6)
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[3]["dup_line_ratio"] == pytest.approx(1 / 3)
    assert rows[4]["dup_line_ratio"] is None
    assert rows[4]["dup_token_ratio"] is None
    assert rows[4]["top_bigram_ratio"] is None


def test_key_skew_profile(spark):
    from hds_functions_spark.operators.profiling import key_skew_profile

    df = spark.createDataFrame(
        [(i % 7,) for i in range(100)] + [(99,)] * 50 + [(None,)] * 5,
        "user_id: int",
    )
    out = key_skew_profile(df, ["user_id"], top_n=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    top = out[0]
    assert top["user_id"] == 99 and top["key_rows"] == 50
    assert top["total_rows"] == 155 and top["n_keys"] == 9  # null is a key
    assert abs(top["share"] - 50 / 155) < 1e-6
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        key_skew_profile(df, [])


def test_bigram_logprob_scores(spark):
    import math

    from hds_functions_spark.operators.profiling import bigram_logprob_scores

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "x"), (4, ""), (5, None)],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
    # docs with < 2 tokens produce no score rows
    assert set(out) == {1, 2}
    # context 'a' has 2 corpus bigrams, each observed once: P = 1/2
    for d in (1, 2):
        assert out[d]["n_bigrams"] == 1
        assert abs(out[d]["avg_logprob"] - round(math.log(0.5), 4)) < 1e-9
    # a doc whose transitions are corpus-typical scores higher than an
    # outlier: make 'a b' dominate, 'a z' rare
    df2 = spark.createDataFrame(
        [(i, "a b") for i in range(9)] + [(99, "a z")],
        "doc_id: long, text: string",
    )
    out2 = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob_scores(df2).collect()}
    assert out2[0] > out2[99]
    assert abs(out2[99] - round(math.log(1 / 10), 4)) < 1e-9


def test_char_entropy_scores(spark):
    import math

    from hds_functions_spark.operators.profiling import char_entropy_scores

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in char_entropy_scores(df).collect()}
    # empty/null docs emit no row
    assert set(out) == {1, 2, 3}
    assert out[1]["entropy"] == 0.0  # degenerate: single symbol
    assert abs(out[2]["entropy"] - round(math.log(2), 4)) < 1e-9  # two equiprobable
    assert abs(out[3]["entropy"] - round(math.log(4), 4)) < 1e-9  # uniform over 4
    assert out[3]["n_chars"] == 4


def test_add_script_ratios(spark):
    from hds_functions_spark.functions.text import add_script_ratios

    df = spark.createDataFrame(
        [
            (1, "abcd 12"),          # 4 latin, 2 digit, 1 space
            (2, "Привет мир"),       # cyrillic + 1 space
            (3, "你好ab"),            # 2 han, 2 latin
            (4, ""),                 # empty -> null ratios
            (5, "!!!"),              # all 'other'
        ],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in add_script_ratios(df).collect()}
    assert rows[1]["latin_ratio"] == pytest.approx(4 / 7, abs=1e-6)
    assert rows[1]["digit_ratio"] == pytest.approx(2 / 7, abs=1e-6)
    assert rows[1]["space_ratio"] == pytest.approx(1 / 7, abs=1e-6)
    assert rows[1]["other_ratio"] == pytest.approx(0.0, abs=1e-6)
    assert rows[2]["cyrillic_ratio"] == pytest.approx(9 / 10, abs=1e-6)
    assert rows[3]["han_ratio"] == pytest.approx(0.5, abs=1e-6)
    assert rows[3]["latin_ratio"] == pytest.approx(0.5, abs=1e-6)
    assert rows[4]["latin_ratio"] is None and rows[4]["other_ratio"] is None
    assert rows[5]["other_ratio"] == pytest.approx(1.0, abs=1e-6)


def test_build_vocabulary(spark):
    from hds_functions_spark.operators.profiling import build_vocabulary

    df = spark.createDataFrame(
        [("the cat sat",), ("the cat ran",), ("THE dog",), ("",)],
        "text: string",
    )
    rows = {r["token"]: r for r in build_vocabulary(df, min_count=2).collect()}
    # 'the' x3 (case-folded), 'cat' x2 survive min_count=2
    assert set(rows) == {"the", "cat"}
    assert rows["the"]["count"] == 3 and rows["the"]["vocab_id"] == 0
    assert rows["cat"]["count"] == 2 and rows["cat"]["vocab_id"] == 1
    # min_count=1: ties rank deterministically by token asc after count desc
    all_rows = build_vocabulary(df, min_count=1).collect()
    ordered = sorted(all_rows, key=lambda r: r["vocab_id"])
    keys = [(r["count"], r["token"]) for r in ordered]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    assert [r["vocab_id"] for r in ordered] == list(range(len(ordered)))

    import pytest

    with pytest.raises(ValueError, match="min_count"):
        build_vocabulary(df, min_count=0)


def test_profile_columns_approx_mode(spark):
    from hds_functions_spark.operators.profiling import profile_columns

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    exact = {r["column_name"]: r for r in profile_columns(df).collect()}
    approx = {
        r["column_name"]: r
        for r in profile_columns(df, approx_distinct=True).collect()
    }
    assert set(approx) == set(exact)
    for c in exact:
        assert approx[c]["n_rows"] == exact[c]["n_rows"]
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
        assert approx[c]["min_value"] == exact[c]["min_value"]
        assert approx[c]["max_value"] == exact[c]["max_value"]
        # HLL default rsd is 5%; allow ~2 sigma
        e, a = exact[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(a - e) <= max(1, 0.10 * e)
    # approx path has NO per-value exchange wider than the single aggregate
    plan = profile_columns(df, approx_distinct=True)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0


def _py_kn(train, score, D=0.75):
    """Pure-Python interpolated Kneser-Ney trigram oracle."""
    import collections, math

    def tris(text):
        t = text.split()
        return [(t[i], t[i+1], t[i+2]) for i in range(len(t) - 2)]

    c3 = collections.Counter()
    for txt in train.values():
        for g in tris(txt):
            c3[g] += 1
    c3ctx, t3 = collections.Counter(), collections.Counter()
    n2 = collections.Counter()
    for (u, v, w), c in c3.items():
        c3ctx[(u, v)] += c
        t3[(u, v)] += 1
        n2[(v, w)] += 1
    ctx2, t2, n1 = collections.Counter(), collections.Counter(), collections.Counter()
    for (v, w), c in n2.items():
        ctx2[v] += c
        t2[v] += 1
        n1[w] += 1
    tot1 = sum(n1.values())
    out = {}
    for d, txt in score.items():
        lps, n = [], 0
        for (u, v, w) in tris(txt):
            n += 1
            if w not in n1:
                continue
            p1 = n1[w] / tot1
            if v in ctx2:
                p2 = max(n2.get((v, w), 0) - D, 0.0) / ctx2[v] \
                     + D * t2[v] / ctx2[v] * p1
            else:
                p2 = p1
            if (u, v) in c3ctx:
                p3 = max(c3.get((u, v, w), 0) - D, 0.0) / c3ctx[(u, v)] \
                     + D * t3[(u, v)] / c3ctx[(u, v)] * p2
            else:
                p3 = p2
            lps.append(math.log(p3))
        if lps:
            out[d] = (n, len(lps), round(len(lps) / n, 4),
                      round(sum(lps) / len(lps), 4))
    return out


def test_kn_trigram_matches_python_oracle(spark):
    import random

    from hds_functions_spark.operators.profiling import (
        kn_trigram_logprob_scores,
    )

    rng = random.Random(17)
    vocab = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far", "san",
             "francisco"]
    def doc():
        words = []
        for _ in range(rng.randint(0, 15)):
            w = rng.choice(vocab)
            words.append(w)
            if w == "san":
                words.append("francisco")  # the KN showcase collocation
        return " ".join(words)

    train = {i: doc() for i in range(40)}
    score = {100 + i: doc() for i in range(20)}
    score[200] = "completely novel tokens here"       # all-OOV -> no row
    score[201] = "the cat xyzzy"                      # OOV w excluded
    tdf = spark.createDataFrame(list(train.items()), "doc_id long, text string")
    sdf = spark.createDataFrame(list(score.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.n_scored, r.coverage, r.avg_logprob)
        for r in kn_trigram_logprob_scores(tdf, sdf).collect()
    }
    exp = _py_kn(train, score)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][:3] == exp[d][:3], d
        assert got[d][3] == pytest.approx(exp[d][3], abs=2e-4), d
    assert 200 not in got  # all trigrams OOV -> filtered


def test_kn_trigram_continuation_beats_raw_frequency(spark):
    """The KN property: 'francisco' is frequent but occurs after ONE
    context type, so as a continuation elsewhere it must score below a
    word with many context types of equal frequency."""
    import math

    from hds_functions_spark.operators.profiling import (
        kn_trigram_logprob_scores,
    )

    # 'common' follows 6 distinct contexts; 'francisco' only 'san' — at
    # similar raw frequency
    rows = [(i, f"w{i} x{i} common extra") for i in range(6)]
    rows += [(10 + i, "a b san francisco") for i in range(6)]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    probe = spark.createDataFrame(
        [(0, "q r common"), (1, "q r francisco")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.avg_logprob
        for r in kn_trigram_logprob_scores(train, probe).collect()
    }
    assert got[0] > got[1], got
