"""Global dense-id assignment: contiguity, order, determinism, plan shape."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.ids import assign_dense_ids


@pytest.fixture()
def scattered(spark):
    # write through parquet shuffled so input order != key order
    rows = [(k, f"v{k}") for k in range(200)]
    import random

    random.Random(3).shuffle(rows)
    return spark.createDataFrame(rows, "k: long, v: string").repartition(7)


def test_dense_ids_contiguous_and_ordered(scattered):
    out = assign_dense_ids(scattered, ["k"], num_partitions=5).collect()
    by_k = sorted(out, key=lambda r: r["k"])
    assert [r["dense_id"] for r in by_k] == list(range(200))
    assert {r["v"] for r in out} == {f"v{k}" for k in range(200)}


def test_dense_ids_start_and_desc_order(scattered):
    out = assign_dense_ids(
        scattered, [F.col("k").desc()], num_partitions=4, start=1000
    ).collect()
    by_k = sorted(out, key=lambda r: r["k"], reverse=True)
    assert [r["dense_id"] for r in by_k] == list(range(1000, 1200))


def test_dense_ids_deterministic_across_runs(scattered):
    a = {r["k"]: r["dense_id"]
         for r in assign_dense_ids(scattered, ["k"], num_partitions=6).collect()}
    b = {r["k"]: r["dense_id"]
         for r in assign_dense_ids(scattered, ["k"], num_partitions=6).collect()}
    assert a == b


def test_dense_ids_no_global_window(scattered):
    """The data-carrying window must partition by the materialised pid —
    a SINGLE-partition window over the data is the anti-pattern this
    operator exists to avoid."""
    out = assign_dense_ids(scattered, ["k"], num_partitions=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_hds_pid" in plan  # data window is per-partition-id
    # the only unpartitioned window is the offsets prefix sum (rows == #parts)
    assert plan.count("Window") >= 2


def test_dense_ids_validation(scattered):
    with pytest.raises(ValueError, match="order_by"):
        assign_dense_ids(scattered, [])
    with pytest.raises(ValueError, match="already exists"):
        assign_dense_ids(scattered, ["k"], id_col="v")
