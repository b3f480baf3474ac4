"""Sequence-packing operator tests."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.packing import pack_sequences


def test_pack_sequences_offsets(spark):
    # one shard so the tape is a single ordered run
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in
           pack_sequences(df, budget=4, n_shards=1).collect()}
    # tape (id order): doc1 tokens 0-2, doc2 3-4, doc3 5-8, doc4 9
    assert (out[1]["seq_id"], out[1]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_id"], out[2]["seq_offset"]) == (0, 3)
    assert (out[3]["seq_id"], out[3]["seq_offset"]) == (1, 1)
    assert (out[4]["seq_id"], out[4]["seq_offset"]) == (2, 1)
    assert all(r["shard"] == 0 for r in out.values())


def test_pack_sequences_deterministic_and_sharded(spark):
    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(200)],
        "doc_id: long, text: string",
    )
    a = pack_sequences(df, budget=16, n_shards=4)
    b = pack_sequences(df, budget=16, n_shards=4)
    assert a.subtract(b).count() == 0  # pure function of ids+counts
    shards = [r["shard"] for r in a.select("shard").distinct().collect()]
    assert set(shards) <= set(range(4)) and len(shards) > 1
    # offsets never reach the budget
    assert a.filter(F.col("seq_offset") >= 16).count() == 0


def test_pack_sequences_custom_token_col(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "doc_id: long, my_tokens: long"
    )
    out = {r["doc_id"]: r["seq_id"] for r in
           pack_sequences(df, budget=16, n_shards=1,
                          tokens_col="my_tokens").collect()}
    assert out == {1: 0, 2: 0, 3: 1}  # 0,10,20 tokens before


def test_pack_sequences_errors(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, n_shards=0)


def test_pack_sequences_auto_shards(spark):
    # auto mode derives n_shards from total tokens: bounded per-task work
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("one two three four").alias("text"),
    )
    out = pack_sequences(df, budget=8, tokens_per_shard=100)
    shards = [r["shard"] for r in out.select("shard").distinct().collect()]
    # 200 docs * 4 tokens = 800 tokens -> >= 8 shards (and >= parallelism)
    par = spark.sparkContext.defaultParallelism
    assert len(shards) > 1
    assert max(shards) < max(par, 8)
    # every offset stays inside the budget
    assert out.filter((F.col("seq_offset") < 0) | (F.col("seq_offset") >= 8)).count() == 0
