"""Distinct-count sketching (KMV / k-minimum-values).

The cardinality primitive a 100 TB profiler needs when exact
``count(DISTINCT x)`` is too expensive: the KMV estimator keeps only the
``k`` smallest hash values per group and estimates ``n_distinct ~
(k - 1) / u_k`` where ``u_k`` is the k-th smallest hash normalised to
[0, 1) — standard error ~ 1/sqrt(k - 2) (Bar-Yossef et al. 2002; the
theta-sketch family's base estimator). Spark ships HyperLogLog behind
``approx_count_distinct``, but its binary sketch is not
oracle-reproducible; KMV with an md5-derived hash is EXACTLY computable
in any SQL engine, so the estimate itself sits under the correctness
gate — the estimator's arithmetic is verified, not trusted.

Spark-first shape (per group):

- distinct ``(group, value)`` pairs first — ONE map-side-combinable
  aggregate; the shuffle carries distinct pairs, never raw rows;
- the k smallest hashes via rank-then-filter, which Catalyst rewrites
  to WindowGroupLimit (each shuffle partition pre-prunes to its local
  top-k before the exchange — the distributed k-minimum selection);
- one tiny aggregate emits (kth hash, count) per group.

At scale the only data-proportional stage is the distinct-pair shuffle,
which any exact distinct count pays too; everything after is bounded by
``k * n_groups`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_hash",
    "kmv_distinct",
]

#: Hash domain: 15 hex digits of md5 = 60 bits, exact in int64 AND in a
#: SQL DOUBLE (2^60 < 2^63; the [0,1) normalisation divides by 2^60).
_KMV_BITS = 60
_KMV_DOMAIN = float(1 << _KMV_BITS)


def kmv_hash(col: Column | str) -> Column:
    """Uniform deterministic hash of a value to [0, 1): the first 15 hex
    digits of md5, as an int64, over 2^60. Oracle-identical in DuckDB:
    ``('0x' || substr(md5(v::VARCHAR), 1, 15))::BIGINT / 2^60``. Values
    hash via their string form so heterogeneous engines agree; NULL
    hashes to NULL (and never enters the sketch)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
        .cast("long")
        / F.lit(_KMV_DOMAIN)
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    round_digits: int = 4,
) -> DataFrame:
    """KMV distinct-count estimate of ``value_col`` per group.

    Output per group: ``n_kept`` (hashes retained, <= k), ``kth_u`` (the
    k-th smallest normalised hash; the sketch threshold) and
    ``estimate``. Groups with fewer than ``k`` distinct values return
    the EXACT count (the sketch holds every value — standard KMV
    behaviour), so small groups are never approximated.

    Rounding to ``round_digits`` happens only on the final estimate; the
    rank runs on exact int64 hash order, so engines agree on WHICH
    values form the sketch (no float tie ambiguity).
    """
    if k < 3:
        raise ValueError(f"k must be >= 3 (got {k})")
    gcols = list(group_cols or [])
    distinct = df.filter(F.col(value_col).isNotNull()).select(
        *gcols, value_col
    ).distinct()
    hashed = distinct.select(
        *gcols, kmv_hash(value_col).alias("_u")
    )
    if gcols:
        w = Window.partitionBy(*gcols).orderBy("_u")
        sketch = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
        )
    else:
        # global sketch: sort+limit is TakeOrderedAndProject — a
        # distributed top-k, NOT the single-partition window the
        # ungrouped row_number spelling would force
        sketch = hashed.orderBy("_u").limit(k)
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_u").alias("kth_u"),
    )
    return agg.select(
        *gcols,
        "n_kept",
        F.round("kth_u", 9).alias("kth_u"),
        F.round(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise((F.lit(k) - 1) / F.col("kth_u")),
            round_digits,
        ).alias("estimate"),
    )
