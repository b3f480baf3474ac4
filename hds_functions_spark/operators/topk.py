"""Top-N-per-group selection via window ranking functions.

Parity target: ``/root/reference`` ``data_aggregation.py:15-246``.

Physical plan note (why rank-then-filter is the right Spark-first shape):
Catalyst's ``InferWindowGroupLimit`` rule (Spark >= 3.5) rewrites
``rank()/row_number()/dense_rank() <= n`` filters into
``WindowGroupLimitExec`` with a *Partial* mode before the exchange — each map
task prunes to n rows per group before shuffling, then a *Final* pass prunes
again. So even the unpartitioned (global top-N) case only shuffles ~n rows
per input partition into the single final partition, not the whole table.
Verified via ``.explain("formatted")`` in ``tests/test_topk.py``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["select_top_rows", "first_row", "first_rank", "first_dense_rank"]

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}

_DUMMY = "_dummy_column"


def select_top_rows(
    df: DataFrame,
    method: str,
    n: int = 1,
    partition_by: Sequence | None = None,
    order_by: Sequence | None = None,
    return_index_column: bool = False,
    index_column_name: str = "row_index",
) -> DataFrame:
    """Keep the top ``n`` rows per partition under a ranking method.

    Args mirror the reference (``data_aggregation.py:15-101``):
    ``method`` in ``{'row_number', 'rank', 'dense_rank'}``; ``n`` a positive
    int; ``partition_by=None`` means a single global partition (implemented
    with an injected constant ``_dummy_column``, ValueError if that name
    already exists); ``order_by=None`` builds an unordered window, which
    Spark's ranking functions reject at analysis time (AnalysisException
    "requires window to be ordered") — identical in the reference, which
    passes the same unordered spec. Nulls sort FIRST by default
    (ascending); callers pass ``F.col(c).asc_nulls_last()`` etc. in
    ``order_by`` for explicit placement.
    """
    assert method in _RANKERS, (
        "Invalid method. Allowed values are 'row_number', 'rank', and 'dense_rank'."
    )
    assert isinstance(n, int) and n > 0, "n must be a positive, non-zero integer"

    drop_dummy = False
    if partition_by is None:
        if _DUMMY in df.columns:
            raise ValueError(
                "DataFrame already contains '_dummy_column', "
                "cannot add dummy partition column."
            )
        df = df.withColumn(_DUMMY, F.lit(1))
        partition_by = [_DUMMY]
        drop_dummy = True

    window = Window.partitionBy(*partition_by)
    if order_by is not None:
        window = window.orderBy(*order_by)

    df = df.withColumn(index_column_name, _RANKERS[method]().over(window))
    df = df.filter(F.col(index_column_name) <= n)

    if not return_index_column:
        df = df.drop(index_column_name)
    if drop_dummy:
        df = df.drop(_DUMMY)
    return df


def first_row(
    df: DataFrame,
    n: int = 1,
    partition_by: Sequence | None = None,
    order_by: Sequence | None = None,
    return_index_column: bool = False,
    index_column_name: str = "row_index",
) -> DataFrame:
    """Exactly the first ``n`` rows per partition (``row_number`` ranking).

    Parity: reference ``data_aggregation.py:104-148``.
    """
    return select_top_rows(
        df,
        method="row_number",
        n=n,
        partition_by=partition_by,
        order_by=order_by,
        return_index_column=return_index_column,
        index_column_name=index_column_name,
    )


def first_rank(
    df: DataFrame,
    n: int = 1,
    partition_by: Sequence | None = None,
    order_by: Sequence | None = None,
    return_index_column: bool = False,
    index_column_name: str = "rank_index",
) -> DataFrame:
    """Rows whose ``rank()`` <= n per partition — ties included, rank gaps.

    Parity: reference ``data_aggregation.py:151-194``.
    """
    return select_top_rows(
        df,
        method="rank",
        n=n,
        partition_by=partition_by,
        order_by=order_by,
        return_index_column=return_index_column,
        index_column_name=index_column_name,
    )


def first_dense_rank(
    df: DataFrame,
    n: int = 1,
    partition_by: Sequence | None = None,
    order_by: Sequence | None = None,
    return_index_column: bool = False,
    index_column_name: str = "dense_rank_index",
) -> DataFrame:
    """Rows in the top ``n`` *distinct* order-by values per partition.

    Parity: reference ``data_aggregation.py:197-246``.
    """
    return select_top_rows(
        df,
        method="dense_rank",
        n=n,
        partition_by=partition_by,
        order_by=order_by,
        return_index_column=return_index_column,
        index_column_name=index_column_name,
    )
