"""Fuzzy record linkage: pair generation, blocking recall semantics,
transitive canonicalisation, validation."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.linkage import (
    canonical_name_map,
    fuzzy_name_pairs,
)


def _names(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_near_pairs_found_exact_distance(spark):
    df = _names(spark, ["gray widget", "grey widget", "blue bolt"])
    out = {
        (r["name_a"], r["name_b"]): r["distance"]
        for r in fuzzy_name_pairs(df, "name").collect()
    }
    assert out == {("gray widget", "grey widget"): 1}


def test_normalisation_collapses_case_and_space(spark):
    df = _names(spark, ["Gray Widget", "  gray widget  ", "grey widget"])
    pairs = fuzzy_name_pairs(df, "name").collect()
    # the two 'gray widget' spellings normalise to ONE dictionary entry
    assert len(pairs) == 1
    assert pairs[0]["distance"] == 1


def test_blocking_requires_shared_token(spark):
    # 'cat' vs 'bat': distance 1 but no shared token -> not a candidate
    # (documented recall trade of token blocking)
    df = _names(spark, ["cat", "bat"])
    assert fuzzy_name_pairs(df, "name").count() == 0


def test_token_df_cap_prunes_common_blocks(spark):
    names = [f"common uniq{i}" for i in range(10)]
    df = _names(spark, names)
    # 'common' (df 10) is every pair's only shared token
    uncapped = fuzzy_name_pairs(df, "name", max_distance=3)
    capped = fuzzy_name_pairs(df, "name", max_distance=3, max_token_df=5)
    assert uncapped.count() > 0
    assert capped.count() == 0


def test_canonical_map_is_transitive(spark):
    # chain: x aaaa ~ x aaab ~ x aabb (shared block token 'x'); the ends
    # are distance 2 apart but belong to one entity via the chain;
    # canonical = lexicographic min
    df = _names(spark, ["x aaaa", "x aaab", "x aabb", "zzzz"])
    cmap = {
        r["name"]: r["canonical_name"]
        for r in canonical_name_map(df, "name", max_distance=1).collect()
    }
    assert cmap == {
        "x aaaa": "x aaaa", "x aaab": "x aaaa", "x aabb": "x aaaa",
        "zzzz": "zzzz",
    }


def test_corpus_rows_rejoin_by_exact_key(spark):
    rows = [("gray widget",)] * 3 + [("grey widget",)] * 2 + [("blue bolt",)]
    df = spark.createDataFrame(rows, "name string")
    cmap = canonical_name_map(df, "name", max_distance=1)
    counts = {
        r["canonical_name"]: r["n"]
        for r in df.select(F.lower(F.trim("name")).alias("name"))
        .join(cmap, on="name")
        .groupBy("canonical_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {"gray widget": 5, "blue bolt": 1}


def test_validation(spark):
    df = _names(spark, ["a b"])
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_name_pairs(df, "name", max_distance=0)
    with pytest.raises(ValueError, match="max_token_df"):
        fuzzy_name_pairs(df, "name", max_token_df=0)


def test_nulls_and_empty_names_dropped(spark):
    df = spark.createDataFrame(
        [("gray widget",), (None,), ("   ",), ("grey widget",)],
        "name: string",
    )
    assert fuzzy_name_pairs(df, "name").count() == 1
    cmap = canonical_name_map(df, "name")
    assert cmap.filter(F.col("name").isNull()).count() == 0
