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

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["quantize_to_bins", "morton_code", "zorder_column"]


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
