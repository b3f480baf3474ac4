"""Salted-join and bucketed-save tests."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.joins import salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90%), a few cold keys
    left = spark.range(0, 1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("key"),
        F.col("id").alias("left_id"),
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3), ("missing", 9)], ["key", "right_val"]
    )
    return left, right


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, on="key", how="inner")
    salted = salted_join(left, right, on="key", how="inner", salt_partitions=8)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_left_matches_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, on="key", how="left")
    salted = salted_join(left, right, on="key", how="left", salt_partitions=8)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_join_validation(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="how="):
        salted_join(left, right, on="key", how="full")
    with pytest.raises(ValueError, match="missing"):
        salted_join(left, right, on="nope")


def test_salted_join_spreads_hot_key(spark, skewed):
    left, right = skewed
    # the hot key's rows land on several distinct salt values
    salted = left.withColumn(
        "_s",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(8)),
    )
    n_salts = (
        salted.filter(F.col("key") == "hot").select("_s").distinct().count()
    )
    assert n_salts > 1


def test_save_table_bucketed_path(spark, tmp_path):
    from hds_functions_spark.sources.tables import save_table

    df = spark.range(0, 100).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    td = {"t": {"path": str(tmp_path / "bucketed"), "format": "parquet"}}
    save_table(df, "t", table_directory=td, bucket_by=(4, "k"))
    back = spark.read.parquet(str(tmp_path / "bucketed"))
    assert back.count() == 100
    # clustered layout: every k lives in exactly one file
    files = back.select(
        "k", F.input_file_name().alias("f")
    ).groupBy("k").agg(F.countDistinct("f").alias("nf"))
    assert files.filter(F.col("nf") > 1).count() == 0
