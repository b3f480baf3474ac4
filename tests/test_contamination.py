"""Decontamination + chunking operator tests (golden mini-DataFrames)."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.contamination import ngram_contamination
from hds_functions_spark.operators.packing import chunk_documents


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with different words"),
            (3, "the quick brown cat sits"),
            (4, ""),
        ],
        "doc_id: long, text: string",
    )


def test_ngram_contamination_counts(spark, corpus):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox runs"), (101, "quick brown cat here")],
        "eval_id: long, text: string",
    )
    out = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_eval_docs"])
        for r in ngram_contamination(corpus, eval_df, ngram=3).collect()
    }
    # doc 1 shares 'the quick brown' + 'quick brown fox' (eval 100 only)
    assert out[1] == (2, 1)
    # doc 3 shares 'the quick brown' (eval 100) + 'quick brown cat' (eval 101)
    assert out[3] == (2, 2)
    # doc 2 and the empty doc are clean -> absent
    assert set(out) == {1, 3}


def test_ngram_contamination_min_shared(spark, corpus):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox runs")], "eval_id: long, text: string"
    )
    out = ngram_contamination(corpus, eval_df, ngram=3, min_shared=2).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_ngram_contamination_errors(spark, corpus):
    with pytest.raises(ValueError, match="ngram"):
        ngram_contamination(corpus, corpus, ngram=0)
    with pytest.raises(ValueError, match="min_shared"):
        ngram_contamination(corpus, corpus, min_shared=0)


def test_chunk_documents_boundaries(spark):
    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, words), (2, "a b"), (3, "")],
                               "doc_id: long, text: string")
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    )
    # doc 1: stride 3, ceil((10-1)/3) = 3 chunks covering every token
    assert rows == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w3 w4 w5 w6"),
        (1, 2, 4, "w6 w7 w8 w9"),
        (2, 0, 2, "a b"),  # shorter than one chunk -> single short chunk
        # doc 3 (token-less) produces no chunks
    ]


def test_chunk_documents_no_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id: long, text: string"
    )
    rows = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=2, overlap=0).collect()
    )
    assert rows == [(0, "a b"), (1, "c d"), (2, "e")]


def test_chunk_documents_errors(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_ngram_contamination_max_eval_df(spark, corpus):
    # 'the quick brown' appears in 3 eval docs; cap at 2 removes it
    eval_df = spark.createDataFrame(
        [
            (100, "the quick brown fox runs"),
            (101, "the quick brown cat here"),
            (102, "the quick brown dog barks"),
        ],
        "eval_id: long, text: string",
    )
    uncapped = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in ngram_contamination(corpus, eval_df, ngram=3).collect()
    }
    capped = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in ngram_contamination(
            corpus, eval_df, ngram=3, max_eval_df=2
        ).collect()
    }
    assert uncapped[1] >= 2
    # doc 1's only surviving shared gram is 'quick brown fox' (df=1)
    assert capped[1] == 1
    with pytest.raises(ValueError, match="max_eval_df"):
        ngram_contamination(corpus, eval_df, max_eval_df=0)


def test_round2_operators_on_empty_input(spark):
    """Degenerate-input sweep: every round-2 operator must handle an empty
    frame (no crash, zero rows) — the partition-empty case every task sees
    at scale."""
    from hds_functions_spark.operators.cleaning import filter_lines, scrub_pii
    from hds_functions_spark.operators.sampling import mixture_sample

    empty = spark.createDataFrame([], "doc_id: long, text: string, lang: string")
    eval_df = spark.createDataFrame(
        [(1, "some eval text here")], "eval_id: long, text: string"
    )
    assert ngram_contamination(empty, eval_df).count() == 0
    assert ngram_contamination(
        spark.createDataFrame([(1, "a b c d")], "doc_id: long, text: string"),
        empty.select(F.col("doc_id").alias("eval_id"), "text"),
    ).count() == 0
    assert chunk_documents(empty).count() == 0
    assert scrub_pii(empty).count() == 0
    assert filter_lines(empty).count() == 0
    assert mixture_sample(empty, "doc_id", "lang", {"en": 1.0}).count() == 0


def test_pipeline_pretrain_prep_invariants(spark):
    """The composite pretrain-prep query: splits partition the clean set,
    every benchmark doc (id % 97 == 0) is excluded, and token totals are
    consistent with doc counts."""
    from hds_functions_spark.registry import QUERIES
    import hds_functions_spark.registry_ext  # noqa: F401

    out = QUERIES["pipeline_pretrain_prep"](spark, "/root/testdata/sf0.001")
    rows = {r["split"]: r for r in out.collect()}
    assert set(rows) <= {"train", "val", "test"}
    n_total = sum(r["n_docs"] for r in rows.values())
    assert rows["train"]["n_docs"] > 0.7 * n_total  # 90% weight dominates
    assert all(r["total_tokens"] > r["n_docs"] for r in rows.values())
