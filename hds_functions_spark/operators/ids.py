"""Global ID assignment — contiguous row numbers at corpus scale.

``row_number() OVER (ORDER BY ...)`` plans a single-partition window: the
whole table funnels through one task — the canonical scale anti-pattern.
``monotonically_increasing_id`` is distributed but neither contiguous nor
order-respecting. This module provides the production shape: dense,
contiguous, order-respecting ids with no global funnel.

Extension layer (SURVEY.md §7/§8): every training-data pipeline needs
stable contiguous ids (shard addressing, sample bookkeeping, resumable
cursors) over corpora that cannot pass through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_dense_ids"]


def assign_dense_ids(
    df: DataFrame,
    order_by,
    id_col: str = "dense_id",
    num_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Assign contiguous ids ``start..start+N-1`` in ``order_by`` order.

    Plan (no single-partition data movement):

    1. ``repartitionByRange`` on the sort key — each partition holds a
       disjoint, ordered key range;
    2. the partition id is materialised as a COLUMN (so later exchanges
       cannot re-map it), and per-partition row counts feed a prefix-sum
       window over ``#partitions`` rows — the only unpartitioned window,
       bounded by the partition count, never the data;
    3. offsets broadcast-join back; ``row_number`` windows partition by
       the materialised partition id — each window task handles one key
       range, data-parallel.

    The range-partitioned frame is persisted so the counts pass and the
    numbering pass see identical partition boundaries (range sampling is
    not otherwise guaranteed stable across re-evaluations).

    ``order_by`` must be a TOTAL order (add a unique tie-break column) for
    the assignment to be deterministic. Accepts a name, a Column, or a
    list of either.
    """
    if isinstance(order_by, (str, Column)):
        order_by = [order_by]
    order_cols = [
        F.col(c) if isinstance(c, str) else c for c in order_by
    ]
    if not order_cols:
        raise ValueError("order_by must name at least one column")
    if id_col in df.columns:
        raise ValueError(f"Column '{id_col}' already exists")

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    from ..caching import tracked_persist

    ranged = tracked_persist(
        df.repartitionByRange(n_parts, *order_cols).withColumn(
            "_hds_pid", F.spark_partition_id()
        )
    )
    counts = ranged.groupBy("_hds_pid").agg(F.count("*").alias("_hds_n"))
    # prefix sum over #partitions rows — tiny by construction
    offsets = counts.withColumn(
        "_hds_offset",
        F.coalesce(
            F.sum("_hds_n").over(
                Window.orderBy("_hds_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_hds_pid", "_hds_offset")
    within = Window.partitionBy("_hds_pid").orderBy(*order_cols)
    out = (
        ranged.join(F.broadcast(offsets), on="_hds_pid")
        .withColumn(
            id_col,
            (
                F.row_number().over(within).cast("long")
                - F.lit(1)
                + F.col("_hds_offset")
                + F.lit(start)
            ),
        )
        .drop("_hds_pid", "_hds_offset")
    )
    return out
