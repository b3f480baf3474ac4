"""Skew-aware join helpers.

AQE's skew-join splitting handles most hot-key cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on by default in
``plans.session``), but it only splits *sort-merge* join partitions. When a
handful of keys dominate a shuffled hash join — the classic curation case:
90% of events belong to one null-ish or default key — explicit salting
spreads one hot key over ``salt_partitions`` reducers at the cost of
replicating the (small) right side that many times.

The salt is **deterministic** (xxhash64 of the whole left row, not
``rand()``), so plans are reproducible run to run and under task retries —
a correctness requirement at scale, where a retried task with a different
salt would double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

_SALT = "_hds_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_partitions: int = 16,
) -> DataFrame:
    """Equi-join with key salting for skew mitigation.

    Semantically identical to ``left.join(right, on, how)`` for ``how`` in
    {'inner', 'left'}: each left row gets a deterministic salt in
    ``[0, salt_partitions)``; the right side is replicated once per salt
    value; the join runs on ``on + [salt]`` so a single hot key's rows land
    on ``salt_partitions`` different reducers instead of one.

    Use when the right side is broadcast-too-big but replication-small
    (replicated bytes = right * salt_partitions). For a broadcastable right
    side just use ``F.broadcast`` — salting is pointless there.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    on = [on] if isinstance(on, str) else list(on)
    for c in on:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"Join column '{c}' missing from an input")
    if _SALT in left.columns or _SALT in right.columns:
        raise ValueError(f"Inputs must not contain the column '{_SALT}'")

    salted_left = left.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])),
               F.lit(salt_partitions)).cast("int"),
    )
    replicated_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_partitions - 1)))
    )
    return salted_left.join(replicated_right, on=on + [_SALT], how=how).drop(_SALT)
