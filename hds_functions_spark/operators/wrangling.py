"""Data-wrangling operators: column-name sanitisation and value mapping.

Parity target: ``/root/reference`` ``data_wrangling.py:15-120``.
Both operators are metadata-only / narrow projections — zero shuffle.
"""

from __future__ import annotations

from itertools import chain
from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "clean_column_names",
    "map_column_values",
    "align_to_schema",
    "winsorize_columns",
    "mad_outlier_flags",
    "pivot_counts",
    "unpivot_columns",
]

# Above this many entries a literal `create_map` expression gets unwieldy for
# Catalyst (huge expression tree); switch to a broadcast-join lookup table.
_MAP_LITERAL_MAX_ENTRIES = 1000


def _clean_name(name: str) -> str:
    """Sanitise one column name (reference ``data_wrangling.py:38-44``)."""
    cleaned = "".join(c if c.isalnum() or c == "_" else "_" for c in name)
    if cleaned and cleaned[0].isdigit():
        cleaned = "_" + cleaned
    return cleaned.lower()


def clean_column_names(df: DataFrame) -> DataFrame:
    """Sanitise all column names; dedupe with ``_2``, ``_3``, ... suffixes.

    Non-``[alnum_]`` characters become ``_``; a leading digit gains a ``_``
    prefix; everything is lowercased. Duplicates (post-cleaning) are renamed
    in occurrence order: first keeps the name, later ones get ``_2``, ``_3``.
    Pure rename via ``toDF`` — a metadata-only projection, no execution cost.
    Parity: reference ``data_wrangling.py:15-61``.
    """
    cleaned = [_clean_name(c) for c in df.columns]
    seen: dict[str, int] = {}
    unique: list[str] = []
    for name in cleaned:
        if name in seen:
            seen[name] += 1
            unique.append(f"{name}_{seen[name]}")
        else:
            seen[name] = 1
            unique.append(name)
    return df.toDF(*unique)


def map_column_values(
    df: DataFrame,
    map_dict: Mapping,
    column: str,
    new_column: str = "",
) -> DataFrame:
    """Map values of ``column`` through a Python dict; misses become null.

    With ``new_column=""`` the source column is overwritten. Errors: missing
    source column, empty dict, pre-existing destination column (ValueError).
    Parity: reference ``data_wrangling.py:64-120``.

    Scale note: small dicts compile to a literal ``F.create_map(...)[col]``
    expression (evaluated JVM-side inside whole-stage codegen, no shuffle).
    Dicts larger than 1000 entries are applied as a broadcast left join
    against an in-memory lookup DataFrame — identical semantics including
    null for unmapped keys — keeping the Catalyst expression tree small.
    """
    if column not in df.columns:
        raise ValueError(f"Column '{column}' does not exist in the DataFrame.")
    if not map_dict:
        raise ValueError("Empty mapping dictionary provided.")
    if new_column and new_column in df.columns:
        raise ValueError(f"Column '{new_column}' already exists in the DataFrame.")

    target = new_column or column

    if len(map_dict) <= _MAP_LITERAL_MAX_ENTRIES:
        literal_map = F.create_map(*[F.lit(x) for x in chain(*map_dict.items())])
        return df.withColumn(target, literal_map[df[column]])

    # Broadcast-join path for large dictionaries.
    spark = df.sparkSession
    lookup = spark.createDataFrame(
        [(k, v) for k, v in map_dict.items()], ["_hds_map_key", "_hds_map_value"]
    )
    joined = df.join(
        F.broadcast(lookup), df[column] == F.col("_hds_map_key"), "left"
    )
    return joined.withColumn(target, F.col("_hds_map_value")).drop(
        "_hds_map_key", "_hds_map_value"
    )


def align_to_schema(df: DataFrame, schema, strict: bool = False) -> DataFrame:
    """Project ``df`` onto ``schema`` (a ``StructType`` or a DataFrame to
    copy the schema from): missing columns appear as typed nulls,
    mismatched types are cast, extra columns are dropped, and the output
    column order matches the target — the alignment every append-style
    sink needs when upstream schemas drift (e.g. archive snapshots taken
    over months).

    ``strict=True`` raises instead of silently adding/dropping columns
    (casts still apply). Pure projection: zero execution cost.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    target: StructType = schema.schema if hasattr(schema, "schema") else schema
    missing = [f.name for f in target.fields if f.name not in df.columns]
    extra = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if strict and (missing or extra):
        raise ValueError(
            f"schema mismatch: missing={missing} extra={extra}"
        )
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def winsorize_columns(
    df: DataFrame,
    columns: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    group_by: list[str] | None = None,
    round_digits: int = 6,
    method: str = "exact",
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Clip each listed numeric column to its [``lower``, ``upper``]
    quantiles — per group when ``group_by`` is given, else globally.
    Only clipped values are rounded to ``round_digits``; unclipped values
    pass through bit-exact (the output column is still double — the
    percentile bounds are double, so the conditional coerces). Nulls pass
    through, and rows whose ``group_by`` key is null match no bounds row
    and pass through unclipped.

    Training-data featurisation step: length/score distributions have
    heavy tails, and clipping at exact percentiles (type-7 linear
    interpolation — the R/NumPy/DuckDB ``quantile_cont`` default, matching
    Spark's exact ``percentile``) bounds them without dropping rows.

    Plan shape: ONE aggregate computes every bound (two ``percentile``
    aggs per column, grouped or global), then re-attaches — grouped via an
    equi-join on the group key (bounds table has one row per group;
    planner/AQE broadcasts when small), global via a 1-row broadcast
    crossJoin. The clip itself is a codegen ``when`` projection.

    ``method='exact'`` (default) sorts each group's values inside the
    aggregate — measured fine to 16x sf0.1 (BASELINE.md round 5).
    ``method='approx'`` swaps in ``percentile_approx`` with
    ``approx_accuracy`` (bounded-memory sketch, error <= 1/accuracy
    of rank) — the switch for group value-counts far beyond that
    envelope, where the exact sort's per-group memory becomes the
    bottleneck. Approx bounds differ from exact at the quantile
    boundaries, so results are not bit-identical between methods.
    """
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx' (got {method!r})")
    if not columns:
        raise ValueError("columns must name at least one column")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")

    if method == "exact":
        def pct(c: str, q: float):
            return F.percentile(F.col(c), F.lit(q))
    else:
        def pct(c: str, q: float):
            return F.percentile_approx(
                F.col(c), F.lit(q), F.lit(approx_accuracy)
            ).cast("double")

    aggs = []
    for c in columns:
        aggs.append(pct(c, lower).alias(f"_hds_lo_{c}"))
        aggs.append(pct(c, upper).alias(f"_hds_hi_{c}"))
    if group_by:
        bounds = df.groupBy(*group_by).agg(*aggs)
        joined = df.join(bounds, on=list(group_by), how="left")
    else:
        bounds = df.agg(*aggs)
        joined = df.crossJoin(F.broadcast(bounds))

    clipped = {
        c: F.when(
            F.col(c) < F.col(f"_hds_lo_{c}"),
            F.round(F.col(f"_hds_lo_{c}"), round_digits),
        )
        .when(
            F.col(c) > F.col(f"_hds_hi_{c}"),
            F.round(F.col(f"_hds_hi_{c}"), round_digits),
        )
        .otherwise(F.col(c).cast("double"))
        for c in columns
    }
    drop = [f"_hds_lo_{c}" for c in columns] + [f"_hds_hi_{c}" for c in columns]
    return joined.withColumns(clipped).drop(*drop)


def mad_outlier_flags(
    df: DataFrame,
    column: str,
    group_by: list[str] | None = None,
    threshold: float = 3.5,
    round_digits: int = 6,
) -> DataFrame:
    """Robust outlier flagging by modified z-score: ``z = 0.6745 * (x -
    median) / MAD`` with ``MAD = median(|x - median|)`` (the Iglewicz-
    Hoaglin rule; |z| > 3.5 is the conventional cut). Median/MAD resist
    the very outliers a mean/stddev rule would absorb — the right default
    for heavy-tailed quality and length features.

    Adds ``{column}_robust_z`` (rounded) and ``{column}_is_outlier``.
    Degenerate groups (MAD = 0: over half the values identical) yield
    null z and ``false`` flags — no robust scale estimate exists there.
    Null values and rows whose ``group_by`` key is null pass through with
    null z / false flag.

    Plan shape: two grouped aggregates (median, then MAD of residuals —
    MAD's nesting is irreducibly two-pass), each re-attached by equi-join
    on the group key (1 row/group; planner broadcasts small bounds
    tables), global variant via 1-row broadcast crossJoin. Flag and z are
    codegen projections. Exact ``percentile`` inside both aggregates —
    same scale envelope as :func:`winsorize_columns` (BASELINE.md 16x).
    """
    if column not in df.columns:
        raise ValueError(f"column not in DataFrame: {column}")
    if threshold <= 0:
        raise ValueError("threshold must be positive")

    med_col, mad_col = f"_hds_med_{column}", f"_hds_mad_{column}"
    med_agg = F.percentile(F.col(column), F.lit(0.5)).alias(med_col)
    if group_by:
        med = df.groupBy(*group_by).agg(med_agg)
        with_med = df.join(med, on=list(group_by), how="left")
    else:
        with_med = df.crossJoin(F.broadcast(df.agg(med_agg)))

    resid = F.abs(F.col(column) - F.col(med_col))
    mad_agg = F.percentile(resid, F.lit(0.5)).alias(mad_col)
    if group_by:
        mad = with_med.groupBy(*group_by).agg(mad_agg)
        joined = with_med.join(mad, on=list(group_by), how="left")
    else:
        joined = with_med.crossJoin(F.broadcast(with_med.agg(mad_agg)))

    z = F.when(
        F.col(mad_col) > 0,
        F.round(
            F.lit(0.6745) * (F.col(column) - F.col(med_col)) / F.col(mad_col),
            round_digits,
        ),
    )
    return (
        joined.withColumn(f"{column}_robust_z", z)
        .withColumn(
            f"{column}_is_outlier",
            F.coalesce(
                F.abs(F.col(f"{column}_robust_z")) > threshold, F.lit(False)
            ),
        )
        .drop(med_col, mad_col)
    )


def pivot_counts(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    values: list[str],
    count_col_prefix: str = "",
) -> DataFrame:
    """Long-to-wide: one row per key with a count column per ``values``
    entry of ``pivot_col`` (absent combinations -> 0, values outside the
    list ignored).

    ``values`` is REQUIRED, not discovered: ``pivot()`` without explicit
    values runs a hidden collect-distinct job over the whole input
    before planning — an extra full pass at 100 TB, and an unbounded
    output schema if the column is dirty. With the list given, this is
    ONE map-side-combinable aggregate whose exchange carries (key,
    |values| longs).
    """
    if not values:
        raise ValueError("values must be a non-empty explicit list")
    agged = (
        df.groupBy(key_col)
        .pivot(pivot_col, values)
        .agg(F.count(F.lit(1)))
    )
    return agged.select(
        key_col,
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(
                f"{count_col_prefix}{v}"
            )
            for v in values
        ],
    )


def unpivot_columns(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Wide-to-long melt: one output row per (input row, entry of
    ``value_cols``), with the source column name in ``var_col`` — the
    inverse of :func:`pivot_counts`. Values are cast to double (the
    melted column must be one type).

    Implemented with the built-in ``unpivot`` (Expand under the hood:
    ONE scan emitting len(value_cols) rows per input row, no
    join/shuffle; the row multiplication is the operator's contract,
    not overhead).
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    casted = df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in value_cols]
    )
    return casted.unpivot(id_cols, value_cols, var_col, value_col)
