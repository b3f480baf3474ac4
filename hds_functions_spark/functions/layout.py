"""Physical-layout functions: Z-order (Morton) encoding for
multi-dimensional data clustering.

A table sorted by ONE column skips files well for predicates on that
column and badly for everything else. Interleaving the bits of two
quantized sort dimensions into one Morton code and sorting by THAT
clusters rows that are close in BOTH dimensions into the same files, so
parquet min/max row-group statistics prune scans for 2-D predicates
(time x key, price x region, lat x lon) — the technique behind Delta /
Iceberg Z-ORDER, here as a plain column expression usable with
``save_table(sort_by=...)`` on any format.

Pure JVM bit arithmetic (shift / and / or — whole-stage codegen, no UDF,
no shuffle), and deterministic: the same (value, bounds, bits) always
produces the same code on any engine, so the DuckDB oracle reproduces
codes bit-for-bit.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "quantize_to_bins",
    "morton_code",
    "zorder_column",
    "bucket_by_quantiles",
    "bucket_by_quantiles_desc",
    "pruning_simulation",
    "plan_compaction",
]


def quantize_to_bins(
    col: Column | str, lo: float, hi: float, bits: int = 16
) -> Column:
    """Map a numeric column into integer bins ``[0, 2**bits)`` by linear
    scaling over ``[lo, hi]`` (values outside clamp to the edge bins;
    nulls stay null). ``floor`` semantics, double arithmetic — identical
    IEEE evaluation on any engine."""
    if not lo < hi:
        raise ValueError(f"need lo < hi (got {lo}, {hi})")
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31] (got {bits})")
    c = F.col(col) if isinstance(col, str) else col
    n_bins = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(n_bins))
    )
    clamped = F.least(F.greatest(scaled, F.lit(0)), F.lit(n_bins))
    # greatest/least IGNORE nulls (they'd clamp null to the edge bin);
    # a null measurement must stay null
    return F.when(c.isNotNull(), clamped.cast("long"))


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Morton (Z-order) code: bit ``i`` of ``a`` lands at
    position ``2i``, bit ``i`` of ``b`` at ``2i + 1``. Null in either
    input -> null code."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31] (got {bits})")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_column(
    col_a: Column | str,
    col_b: Column | str,
    lo_a: float,
    hi_a: float,
    lo_b: float,
    hi_b: float,
    bits: int = 16,
) -> Column:
    """Convenience: quantize two numeric columns over their bounds and
    Morton-interleave them — the expression to pass as ``sort_by`` (via a
    projected column) so the written file layout clusters in both
    dimensions. Bounds are explicit (not computed) so the code is stable
    as data grows; derive them once from a profile
    (:func:`~hds_functions_spark.operators.profiling.profile_columns`)."""
    return morton_code(
        quantize_to_bins(col_a, lo_a, hi_a, bits),
        quantize_to_bins(col_b, lo_b, hi_b, bits),
        bits,
    )


def bucket_by_quantiles(
    df,
    col: str,
    n_buckets: int,
    bucket_col: str = "bucket",
    round_digits: int = 6,
    exact: bool = True,
):
    """Assign each row to one of ``n_buckets`` equal-frequency buckets of
    ``col`` — the range-partitioning a sorted write produces (Spark's
    RangePartitioner does the same with sampled bounds; here the bounds
    are exact type-7 percentiles so an oracle reproduces them, with the
    documented ``percentile_approx`` switch if the exact sort ever
    matters at scale).

    ONE aggregate computes all cut points (rounded to ``round_digits``
    so engines agree at boundaries), attached by 1-row-broadcast
    crossJoin; the bucket id is then a pure codegen filter-count over
    the literal cuts array — no global sort, no one-partition window.

    ``exact=False`` switches the cut computation to
    ``percentile_approx`` (mergeable sketch): the exact ``percentile``
    holds every value in the final aggregation buffer, which is the one
    stage here that grows with data — flip the switch when the bucketed
    column has billions of rows (bucket boundaries move by at most the
    sketch error; assignment stays a codegen filter-count).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    perc = (
        F.percentile(F.col(col), F.lit(fracs))
        if exact
        else F.percentile_approx(F.col(col), F.lit(fracs))
    )
    cuts = df.agg(
        F.transform(perc, lambda x: F.round(x, round_digits)).alias("_cuts")
    )
    # NULL input -> NULL bucket: without the guard the filter predicate
    # `c <= NULL` is NULL, every cut drops, and size()=0 silently conflates
    # NULLs with the lowest-quantile bucket
    bucket = F.when(
        F.col(col).isNotNull(),
        F.size(F.filter(F.col("_cuts"), lambda c: c <= F.col(col))),
    ).cast("int")
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(bucket_col, bucket)
        .drop("_cuts")
    )


def bucket_by_quantiles_desc(
    df,
    col: str,
    n_buckets: int,
    group_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    round_digits: int = 6,
    exact: bool = True,
):
    """1-based DESCENDING equal-frequency buckets of ``col`` (bucket 1 =
    the highest-value head, bucket ``n_buckets`` = the tail) — the
    scale-safe re-spelling of ``ntile(n) OVER ([PARTITION BY g]
    ORDER BY col DESC)``: per-group (or global) percentile cuts in ONE
    combinable aggregate, broadcast back, then a pure codegen
    filter-count — no sort, no single-partition Window exchange.

    ``group_cols`` partitions the bucketing (the CCNet per-language
    shape); ``None`` buckets globally via a 1-row broadcast crossJoin.
    A NULL group key is a real group (null-safe join back), matching
    the ntile ``PARTITION BY`` this replaces — null-keyed rows are
    bucketed among themselves, never dropped.

    Boundary-tie policy (differs from ntile, deliberately): ``col`` is
    rounded to ``round_digits`` and compared against cuts rounded the
    same way, so ties on the rounded value NEVER split across buckets —
    a rounded score equal to a cut lands in the BETTER (lower-numbered)
    bucket, and bucket populations are equal only up to tie mass.
    ntile's row-number determinism (splitting ties by a tiebreak
    column) is exactly what forces the all-rows-through-one-partition
    sort this function exists to avoid. Groups smaller than
    ``n_buckets`` land entirely in bucket 1 (all cuts equal the value).
    NULL scores get a NULL bucket (same guard as
    :func:`bucket_by_quantiles`).

    ``exact=False`` switches cuts to the mergeable ``percentile_approx``
    sketch for columns whose per-group cardinality makes the exact
    percentile's single aggregation buffer the bottleneck.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    val = F.round(F.col(col), round_digits)
    perc = (
        F.percentile(val, F.lit(fracs))
        if exact
        else F.percentile_approx(val, F.lit(fracs))
    )
    cuts_agg = F.transform(perc, lambda x: F.round(x, round_digits)).alias(
        "_cuts"
    )
    if group_cols:
        cuts = df.groupBy(*group_cols).agg(cuts_agg)
        # null-safe cut attach: groupBy keeps a NULL group key as a real
        # group (exactly like the ntile PARTITION BY this re-spells), so
        # the join back must be <=> on every group col — a plain equi-join
        # would silently DROP null-keyed rows instead of bucketing them
        cuts = cuts.select(
            *[F.col(g).alias(f"_cut_{g}") for g in group_cols], "_cuts"
        )
        cond = functools.reduce(
            lambda a, b: a & b,
            [F.col(g).eqNullSafe(F.col(f"_cut_{g}")) for g in group_cols],
        )
        joined = df.join(F.broadcast(cuts), on=cond).drop(
            *[f"_cut_{g}" for g in group_cols]
        )
    else:
        joined = df.crossJoin(F.broadcast(df.agg(cuts_agg)))
    bucket = F.when(
        F.col(col).isNotNull(),
        F.lit(n_buckets) - F.size(F.filter(F.col("_cuts"), lambda c: c <= val)),
    ).cast("int")
    return joined.withColumn(bucket_col, bucket).drop("_cuts")


def pruning_simulation(
    df,
    arrival_col: str,
    zcode_col: str,
    bin_a: str,
    bin_b: str,
    n_files: int,
    box: tuple[float, float, float, float],
    round_digits: int = 6,
    exact: bool = False,
):
    """Quantify what a Z-order layout buys: simulate writing ``df`` into
    ``n_files`` equal-frequency files under (a) arrival order and (b)
    Z-order, compute per-file min/max statistics of the two bin columns
    (exactly what parquet row-group stats store), and count how many
    files a 2-D range predicate ``bin_a in [a_lo, a_hi] AND bin_b in
    [b_lo, b_hi]`` must read under each layout.

    Output: one row per layout with ``(layout, n_files, n_scanned,
    scan_frac)``. Everything after bucketing is a file-count-sized
    aggregate; at any data size only n_files rows move. The default
    ``exact=False`` computes cuts with the mergeable percentile_approx
    sketch — the production setting: at 16x sf0.1 the exact
    single-buffer percentile dominates the wall clock (34.8 -> 4.5 s,
    BASELINE.md) and is the only data-proportional buffer in the plan,
    while the sketch moved NO pruning decision in the measured sweep.
    ``exact=True`` (exact percentile cuts) exists for deterministic
    oracle comparison — the registry's ``layout_pruning_sim`` pins it.
    """
    from ..caching import tracked_persist

    a_lo, a_hi, b_lo, b_hi = box
    # both layouts read (cuts + stats = 4 passes) from this narrow frame;
    # persist it once instead of re-scanning the source each pass
    narrow = tracked_persist(
        df.select(arrival_col, zcode_col, bin_a, bin_b)
    )
    parts = []
    for layout, col in (("arrival", arrival_col), ("zorder", zcode_col)):
        b = bucket_by_quantiles(
            narrow.select(col, bin_a, bin_b), col, n_files,
            round_digits=round_digits, exact=exact,
        )
        stats = b.groupBy("bucket").agg(
            F.min(bin_a).alias("_min_a"),
            F.max(bin_a).alias("_max_a"),
            F.min(bin_b).alias("_min_b"),
            F.max(bin_b).alias("_max_b"),
        )
        overlaps = (
            (F.col("_max_a") >= a_lo) & (F.col("_min_a") <= a_hi)
            & (F.col("_max_b") >= b_lo) & (F.col("_min_b") <= b_hi)
        )
        parts.append(
            stats.agg(
                F.lit(layout).alias("layout"),
                F.count(F.lit(1)).alias("n_files"),
                F.sum(overlaps.cast("long")).alias("n_scanned"),
            ).select(
                "layout",
                "n_files",
                "n_scanned",
                F.round(F.col("n_scanned") / F.col("n_files"), round_digits)
                .alias("scan_frac"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def plan_compaction(
    files,
    size_col: str = "size_bytes",
    file_col: str = "file_id",
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
):
    """Small-files compaction plan: assign files to output bins of
    ~``target_bytes`` each, per table partition — the maintenance job
    behind every lakehouse OPTIMIZE. Input is the FILE MANIFEST (one row
    per file), which is metadata-sized however big the table is, so the
    per-partition running-sum window is over file counts, not data.

    Bin assignment is sequential-fill over files ordered by (size desc,
    id): ``bin = floor((cumsative size before this file) / target)`` —
    the streaming-friendly spelling whose bins overshoot the target by
    at most one file (first-fit-decreasing packs marginally tighter but
    is inherently sequential state; the running-sum form is one window
    expression any engine computes identically). Files >= target get a
    bin of their own by the same arithmetic. Output: the manifest +
    ``bin`` + per-bin ``bin_bytes`` / ``bin_files`` for the rewrite job
    to consume.
    """
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1 (got {target_bytes})")
    from pyspark.sql import Window

    pcols = list(partition_cols or [])
    w = (
        Window.partitionBy(*pcols) if pcols else Window.partitionBy()
    ).orderBy(F.col(size_col).desc(), F.col(file_col))
    before = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    binned = files.withColumn(
        "bin", F.floor(before / F.lit(int(target_bytes))).cast("long")
    )
    wb = Window.partitionBy(*pcols, "bin")
    return binned.withColumn(
        "bin_bytes", F.sum(size_col).over(wb)
    ).withColumn("bin_files", F.count(F.lit(1)).over(wb))
