"""BM25 retrieval: hand-computed scores, self-retrieval, the df stopword
valve, determinism, and validation."""

import math

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    doc_postings,
    retrieval_decontam,
)


def _corpus(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple date"),
        (2, "banana date elder fig"),
        (3, "grape grape grape grape"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_postings_tf_and_dl(spark):
    post = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_postings(_corpus(spark)).collect()
    }
    assert post[(1, "apple")] == (2, 3)
    assert post[(0, "banana")] == (1, 3)
    assert post[(3, "grape")] == (4, 4)


def test_bm25_matches_hand_computation(spark):
    docs = _corpus(spark)
    queries = _queries(spark, [(100, "apple")])
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(docs, queries).collect()
    }
    # N=4, df(apple)=2, idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    # avgdl = (3+3+4+4)/4 = 3.5
    idf = math.log(2.0)

    def s(tf, dl):
        return round(
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.5)), 6
        )

    assert got == {(100, 0): s(1, 3), (100, 1): s(2, 3)}
    assert got[(100, 1)] > got[(100, 0)]  # higher tf, same length -> higher


def test_query_terms_are_distinct(spark):
    docs = _corpus(spark)
    once = bm25_scores(docs, _queries(spark, [(1, "apple")])).collect()
    thrice = bm25_scores(
        docs, _queries(spark, [(1, "apple apple apple")])
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, thrice))


def test_df_cap_drops_stopword_terms(spark):
    # 'date' appears in 2/4 docs = exactly the 0.5 frac -> kept;
    # drop the cap to 0.25 and it disappears
    docs = _corpus(spark)
    q = _queries(spark, [(1, "date")])
    assert bm25_scores(docs, q).count() == 2
    assert bm25_scores(docs, q, max_df_frac=0.25).count() == 0


def test_topk_rank_and_ties(spark):
    docs = _corpus(spark)
    q = _queries(spark, [(7, "apple banana")])
    out = bm25_topk(docs, q, k=2).orderBy("rank").collect()
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["score"] >= out[1]["score"]


def test_self_retrieval_ranks_first(spark):
    # each doc queried with its own full text must retrieve itself at rank 1
    docs = _corpus(spark)
    q = docs.select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    top1 = bm25_topk(docs, q, k=1).collect()
    assert {r["query_id"]: r["doc_id"] for r in top1} == {
        0: 0, 1: 1, 2: 2, 3: 3
    }


def test_bigram_terms(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "b c d"), (2, "x y z")],
        "doc_id long, text string",
    )
    q = _queries(spark, [(9, "b c")])
    # "b c" has df 2/3 > the default 0.5 cap; lift the cap to score it
    got = {
        r["doc_id"]
        for r in bm25_scores(
            docs, q, term_ngram=2, max_df_frac=1.0
        ).collect()
    }
    assert got == {0, 1}  # only docs containing the bigram "b c"


def test_decontam_threshold_and_hits(spark):
    docs = _corpus(spark)
    q = _queries(spark, [(1, "apple"), (2, "apple date")])
    out = {
        r["doc_id"]: (r["n_hits"], r["max_score"])
        for r in retrieval_decontam(docs, q, threshold=0.0).collect()
    }
    assert out[1][0] == 2  # doc 1 matches both queries
    assert all(v[1] > 0 for v in out.values())
    high = retrieval_decontam(docs, q, threshold=1e9)
    assert high.count() == 0


def test_validation_errors(spark):
    docs = _corpus(spark)
    q = _queries(spark, [(1, "apple")])
    with pytest.raises(ValueError, match="max_df_frac"):
        bm25_scores(docs, q, max_df_frac=0.0)
    with pytest.raises(ValueError, match="k1"):
        bm25_scores(docs, q, k1=-1)
    with pytest.raises(ValueError, match="term_ngram"):
        bm25_scores(docs, q, term_ngram=0)
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, q, k=0)


def test_scoring_join_broadcasts_queries(spark):
    docs = _corpus(spark)
    q = _queries(spark, [(1, "apple")])
    plan = (
        bm25_scores(docs, q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # query terms never shuffle the corpus


# --- MaxScore dynamic pruning: exactness vs the full scorer --------------

def _assert_same_topk(spark, docs, queries, k, **kw):
    from hds_functions_spark.operators.retrieval import bm25_topk_pruned

    full = sorted(
        tuple(r) for r in bm25_topk(docs, queries, k=k, **kw).collect()
    )
    pruned = sorted(
        tuple(r)
        for r in bm25_topk_pruned(docs, queries, k=k, **kw).collect()
    )
    assert pruned == full


def test_pruned_equals_full_small_corpus(spark):
    qs = _queries(spark, [(10, "apple date"), (11, "grape fig banana")])
    for k in (1, 2, 4):
        _assert_same_topk(spark, _corpus(spark), qs, k)


def test_pruned_equals_full_real_documents(spark):
    """The real documents table with the registry's bigram config: the
    pruning path must reproduce the full top-k byte-for-byte."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    queries = docs.filter(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 60).alias("query_text"),
    )
    _assert_same_topk(
        spark, docs, queries, 5, term_ngram=2, max_df_frac=0.5
    )


def test_pruned_fallback_fewer_than_k_matches(spark):
    # one rare term; only 1 doc matches but k=3 -> no theta, unpruned
    qs = _queries(spark, [(1, "elder")])
    _assert_same_topk(spark, _corpus(spark), qs, 3)


def test_pruned_all_terms_df_capped(spark):
    # every query term above the df cap: empty output from both paths
    docs = spark.createDataFrame(
        [(i, "common word") for i in range(4)], "doc_id long, text string"
    )
    qs = _queries(spark, [(1, "common word")])
    _assert_same_topk(spark, docs, qs, 2, max_df_frac=0.4)


def test_pruned_validation(spark):
    from hds_functions_spark.operators.retrieval import bm25_topk_pruned

    qs = _queries(spark, [(1, "apple")])
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk_pruned(_corpus(spark), qs, k=0)
    with pytest.raises(ValueError, match="seed_terms"):
        bm25_topk_pruned(_corpus(spark), qs, seed_terms=0)


# --- TF-IDF all-pairs document similarity --------------------------------

def _ref_tfidf_topk(texts, k, ngram, max_df_frac):
    """Pure-Python APSS reference mirroring tfidf_doc_topk."""
    import math

    def terms(t):
        toks = t.lower().split()
        if ngram == 1:
            return toks
        return [" ".join(toks[i:i + ngram]) for i in range(len(toks) - ngram + 1)]

    n = len(texts)
    tf = {i: {} for i in texts}
    for i, t in texts.items():
        for g in terms(t):
            tf[i][g] = tf[i].get(g, 0) + 1
    df = {}
    for i in tf:
        for g in tf[i]:
            df[g] = df.get(g, 0) + 1
    kept = {g for g, d in df.items() if d <= n * max_df_frac}
    w = {
        i: {g: c * math.log(1 + n / df[g]) for g, c in tf[i].items() if g in kept}
        for i in tf
    }
    norm = {i: math.sqrt(sum(x * x for x in w[i].values())) for i in w}
    out = {}
    for a in w:
        sims = []
        for b in w:
            if a == b:
                continue
            dot = sum(w[a][g] * w[b][g] for g in w[a] if g in w[b])
            if dot > 0:
                sims.append((round(dot / (norm[a] * norm[b]), 6), b))
        sims.sort(key=lambda x: (-x[0], x[1]))
        if sims:
            out[a] = [(b, c) for c, b in sims[:k]]
    return out


def test_tfidf_topk_matches_reference(spark):
    from hds_functions_spark.operators.retrieval import tfidf_doc_topk

    texts = {
        0: "alpha beta gamma delta",
        1: "alpha beta gamma epsilon",
        2: "zeta eta theta iota",
        3: "zeta eta theta kappa",
        4: "alpha zeta unrelated words here",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id: long, text: string"
    )
    got = {}
    for r in tfidf_doc_topk(
        df, k=3, term_ngram=1, max_df_frac=0.9
    ).orderBy("doc_id", "rank").collect():
        got.setdefault(r["doc_id"], []).append(
            (r["neighbor_id"], r["cosine"])
        )
    assert got == _ref_tfidf_topk(texts, 3, 1, 0.9)


def test_tfidf_topk_symmetric_pairs(spark):
    from hds_functions_spark.operators.retrieval import tfidf_doc_topk

    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb dd"), (3, "ee ff gg")],
        "doc_id: long, text: string",
    )
    rows = {
        (r["doc_id"], r["neighbor_id"]): r["cosine"]
        for r in tfidf_doc_topk(
            df, k=1, term_ngram=1, max_df_frac=0.7
        ).collect()
    }
    assert rows[(1, 2)] == rows[(2, 1)] > 0


def test_tfidf_topk_df_cap_is_vocabulary_scoped(spark):
    from hds_functions_spark.operators.retrieval import tfidf_doc_topk

    # 'common' is in every doc -> dropped by the cap; docs sharing only
    # 'common' never pair
    df = spark.createDataFrame(
        [(1, "common unique1"), (2, "common unique2"), (3, "common unique1")],
        "doc_id: long, text: string",
    )
    rows = {
        (r["doc_id"], r["neighbor_id"])
        for r in tfidf_doc_topk(
            df, k=2, term_ngram=1, max_df_frac=0.7
        ).collect()
    }
    assert rows == {(1, 3), (3, 1)}


def test_tfidf_topk_validation(spark):
    from hds_functions_spark.operators.retrieval import tfidf_doc_topk

    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="k must be"):
        tfidf_doc_topk(df, k=0)
    with pytest.raises(ValueError, match="max_df_frac"):
        tfidf_doc_topk(df, max_df_frac=0.0)


def test_bm25_auto_dispatch_regimes(spark):
    """The probe sends flat-ub queries to the full scorer and
    stopword-tailed ones to the pruned scorer — and rows are identical
    to bm25_topk either way."""
    from hds_functions_spark.operators.retrieval import (
        bm25_prune_volume_ratio,
        bm25_topk,
        bm25_topk_auto,
    )

    # flat: every term appears in exactly 2 of 40 docs — uniform ub, so
    # the ascending-ub running total crosses theta-hat at the first
    # term, nothing is non-essential, and the predicted ratio >= 1
    # (the seed pass is counted as pure overhead)
    flat = spark.createDataFrame(
        [(i, f"t{i % 20} u{i % 20}") for i in range(40)],
        "doc_id long, text string",
    )
    flat_qs = spark.createDataFrame(
        [(1, "t3 u4 t5"), (2, "t7 u7 u9")],
        "query_id long, query_text string",
    )
    # zipf-ish: six filler terms in half the docs (df = N/2 — under the
    # df cap so the probe sees them; a true every-doc stopword is
    # already removed by max_df_frac) plus a rare topic term per doc;
    # queries mix the rare topic term with the frequent tail, so the
    # tail is predicted non-essential and its df mass drops out
    zipf = spark.createDataFrame(
        [
            (i, ("f0 f1 f2 f3 f4 f5 " if i % 2 == 0 else "")
                + f"topic{i % 100}")
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    zipf_qs = spark.createDataFrame(
        [(1, "topic4 f0 f1 f2 f3"), (2, "topic9 f1 f2 f4 f5")],
        "query_id long, query_text string",
    )
    r_flat = bm25_prune_volume_ratio(flat, flat_qs)
    r_zipf = bm25_prune_volume_ratio(zipf, zipf_qs)
    assert r_zipf < 0.8 <= r_flat, (r_flat, r_zipf)

    for corpus, queries in ((flat, flat_qs), (zipf, zipf_qs)):
        want = sorted(
            tuple(r) for r in bm25_topk(corpus, queries, k=3).collect()
        )
        got = sorted(
            tuple(r) for r in bm25_topk_auto(corpus, queries, k=3).collect()
        )
        assert got == want


# --- reciprocal-rank fusion ------------------------------------------------


def _leg(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank int")


def test_rrf_fuse_scores_and_overlap(spark):
    from hds_functions_spark.operators.retrieval import rrf_fuse

    # doc 10 is rank 1 in BOTH legs; doc 20 only sparse r2; doc 30 only
    # dense r2 -> 10 must fuse first with 2 legs, 20/30 tie broken by id
    sparse = _leg(spark, [(1, 10, 1), (1, 20, 2)])
    dense = _leg(spark, [(1, 10, 1), (1, 30, 2)])
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_legs"], r["rank"])
        for r in rrf_fuse([sparse, dense], k=5, k_rrf=60).collect()
    }
    assert out[10] == (pytest.approx(round(2 / 61, 6)), 2, 1)
    assert out[20] == (pytest.approx(round(1 / 62, 6)), 1, 2)
    assert out[30] == (pytest.approx(round(1 / 62, 6)), 1, 3)


def test_rrf_fuse_rank_beats_leg_count(spark):
    from hds_functions_spark.operators.retrieval import rrf_fuse

    # a strong single-leg rank-1 doc (1/61 ~ .0164) outranks a doc that
    # is weak (rank 200) in both legs (2/260 ~ .0077): fusion is
    # score-, not vote-based
    sparse = _leg(spark, [(1, 10, 1), (1, 20, 200)])
    dense = _leg(spark, [(1, 30, 1), (1, 20, 200)])
    rows = rrf_fuse([sparse, dense], k=5, k_rrf=60).collect()
    ranked = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranked == [10, 30, 20]


def test_rrf_fuse_three_legs_and_k(spark):
    from hds_functions_spark.operators.retrieval import rrf_fuse

    legs = [
        _leg(spark, [(1, d, r) for r, d in enumerate(perm, start=1)])
        for perm in ([10, 20, 30], [20, 10, 30], [30, 20, 10])
    ]
    out = rrf_fuse(legs, k=2, k_rrf=60).collect()
    assert len(out) == 2
    by_rank = {r["rank"]: r for r in out}
    # doc 20: ranks (2,1,2) -> 1/62+1/61+1/62 beats 10 (1,2,3) and 30 (3,3,1)
    assert by_rank[1]["doc_id"] == 20
    assert by_rank[1]["n_legs"] == 3


def test_rrf_fuse_validation(spark):
    from hds_functions_spark.operators.retrieval import rrf_fuse

    leg = _leg(spark, [(1, 10, 1)])
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse([leg, leg], k=0)
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([leg, leg], k_rrf=-1)
    with pytest.raises(ValueError, match="at least 2"):
        rrf_fuse([leg])
