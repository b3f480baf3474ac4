"""Partitioning helpers shared by compute-heavy operators.

Spark parallelises narrow (pre-shuffle) work by *input split*, so a small
single-file table runs every upstream projection — shingle hashing, md5
fingerprints, per-plane dot products — on one core no matter how many are
available. Pair-generating operators therefore widen thin inputs before
their expensive projection. At production scale inputs already arrive in
thousands of splits and the round-robin repartition is skipped entirely, so
this never adds a shuffle of a 100 TB table. A welcome side effect for
self-join operators: both join branches hang off the *same* repartition
exchange, which Spark reuses (ReusedExchange), computing the expensive
projection once instead of once per branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_partitions"]


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to ``min_partitions`` (default: the
    session's default parallelism) when it currently has fewer partitions;
    no-op (and no shuffle) otherwise."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
