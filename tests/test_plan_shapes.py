"""Structural plan assertions for the round-5 operators: the docstrings
make plan-shape claims (zero-shuffle, broadcast, bounded exchanges) —
these tests pin them so a refactor that silently degrades the plan fails
CI, not a 100 TB run."""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_char_entropy_zero_shuffle(docs):
    from hds_functions_spark.operators.profiling import char_entropy_scores

    assert "Exchange" not in _plan(char_entropy_scores(docs))


def test_script_ratios_zero_shuffle(docs):
    from hds_functions_spark.functions.text import add_script_ratios

    assert "Exchange" not in _plan(add_script_ratios(docs))


def test_strip_markup_zero_shuffle(docs):
    from hds_functions_spark.operators.cleaning import strip_markup

    assert "Exchange" not in _plan(strip_markup(docs))


def test_random_projection_zero_shuffle(emb):
    from hds_functions_spark.operators.similarity import random_projection

    assert "Exchange" not in _plan(random_projection(emb, out_dim=8))


def test_quantize_zero_shuffle(emb):
    from hds_functions_spark.operators.similarity import quantize_embeddings

    assert "Exchange" not in _plan(quantize_embeddings(emb))


def test_quantized_topk_broadcasts_queries(emb):
    from hds_functions_spark.operators.similarity import quantized_cosine_topk

    qs = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(quantized_cosine_topk(emb, qs, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # top-k prunes map-side before the final per-query sort
    assert "WindowGroupLimit" in plan


def test_substring_signal_no_gram_text_in_shuffle(docs):
    """Grams hash to longs BEFORE the exchange: no string gram column may
    appear in any Exchange's output schema."""
    from hds_functions_spark.operators.dedup import duplicated_ngram_stats

    plan = _plan(duplicated_ngram_stats(docs, ngram=5))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_gram" not in line, line


def test_k_anonymity_single_aggregate_exchange(spark):
    from hds_functions_spark.operators.privacy import k_anonymity_violations

    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    plan = _plan(
        k_anonymity_violations(
            cust.select("c_mktsegment", "c_nationkey"),
            ["c_mktsegment", "c_nationkey"],
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1
