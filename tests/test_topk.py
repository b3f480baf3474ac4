"""Top-N-per-group tests: ties, null ordering, global top-N, plan shape."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark import (
    first_dense_rank,
    first_rank,
    first_row,
    select_top_rows,
)

DATA = [("A", 1), ("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]


@pytest.fixture()
def grouped(spark):
    return spark.createDataFrame(DATA, ["group", "value"])


def rows_set(df):
    return sorted((r["group"], r["value"]) for r in df.collect())


def test_first_row_exactly_n(grouped):
    out = first_row(grouped, n=2, partition_by=["group"], order_by=["value"])
    # row_number: exactly 2 per group; the duplicate (A,1) ties broken arbitrarily
    counts = {}
    for g, _ in rows_set(out):
        counts[g] = counts.get(g, 0) + 1
    assert counts == {"A": 2, "B": 2}
    assert all(v <= 2 or g == "B" for g, v in rows_set(out))


def test_first_rank_includes_ties(grouped):
    out = first_rank(grouped, n=2, partition_by=["group"], order_by=["value"])
    # rank: (A,1) twice has rank 1,1 then (A,2) rank 3 -> excluded for n=2
    assert rows_set(out) == [("A", 1), ("A", 1), ("B", 4), ("B", 5)]


def test_first_dense_rank_distinct_values(grouped):
    out = first_dense_rank(grouped, n=2, partition_by=["group"], order_by=["value"])
    # dense_rank: values {1,2} for A (3 rows), {4,5} for B
    assert rows_set(out) == [("A", 1), ("A", 1), ("A", 2), ("B", 4), ("B", 5)]


def test_global_top_n_without_partition(grouped):
    out = first_row(grouped, n=3, order_by=[F.col("value").desc()])
    assert rows_set(out) == [("A", 3), ("B", 4), ("B", 5), ("B", 6)][1:]


def test_nulls_sort_first_by_default(spark):
    df = spark.createDataFrame(
        [("A", None), ("A", 1), ("A", 2)], "group: string, value: int"
    )
    out = first_row(df, n=1, partition_by=["group"], order_by=["value"])
    assert out.collect()[0]["value"] is None


def test_explicit_nulls_last(spark):
    df = spark.createDataFrame(
        [("A", None), ("A", 1), ("A", 2)], "group: string, value: int"
    )
    out = first_row(
        df, n=1, partition_by=["group"], order_by=[F.col("value").asc_nulls_last()]
    )
    assert out.collect()[0]["value"] == 1


def test_index_column_returned(grouped):
    out = first_rank(
        grouped,
        n=1,
        partition_by=["group"],
        order_by=["value"],
        return_index_column=True,
        index_column_name="rank_index",
    )
    assert "rank_index" in out.columns
    assert {r["rank_index"] for r in out.collect()} == {1}


def test_invalid_method_and_n(grouped):
    with pytest.raises(AssertionError, match="Invalid method"):
        select_top_rows(grouped, method="percent_rank")
    with pytest.raises(AssertionError, match="positive"):
        select_top_rows(grouped, method="rank", n=0)


def test_dummy_column_collision(spark):
    df = spark.createDataFrame([(1, 1)], ["_dummy_column", "value"])
    with pytest.raises(ValueError, match="_dummy_column"):
        select_top_rows(df, method="row_number", order_by=["value"])


def test_window_group_limit_in_plan(grouped):
    """rank<=n must compile to WindowGroupLimit (map-side top-k pruning)."""
    out = first_row(grouped, n=2, partition_by=["group"], order_by=["value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
