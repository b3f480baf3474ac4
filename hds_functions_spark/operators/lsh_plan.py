"""MinHash-LSH banding planner: pick (bands, rows) from the S-curve.

The design utility every MinHash deployment needs (Leskovec, Rajaraman
& Ullman, *Mining of Massive Datasets* ch. 3): with ``b`` bands of
``r`` rows (``b * r = num_hashes``), a pair with Jaccard ``s`` collides
in at least one band with probability ``p(s) = 1 - (1 - s^r)^b``. The
planner enumerates every exact factorisation of the signature length
and scores each against a target threshold ``t`` by the two S-curve
error masses:

- ``fp_area = integral_0^t p(s) ds`` — expected candidate mass from
  BELOW-threshold pairs (wasted verify work, per unit of pair density);
- ``fn_area = integral_t^1 (1 - p(s)) ds`` — expected miss mass from
  ABOVE-threshold pairs (lost recall).

At 100 TB this table is the knob that matters most in the dedup
family: fp_area is shuffle volume (candidates cross the exchange to be
verified), fn_area is silent under-dedup — and the tradeoff is fixed
at plan time, so getting it wrong costs a full re-run. The planner is
driver-trivial (divisors x integration steps) but kept as a registry
query so the number the cluster runs on is the number the oracle
checked.

Determinism: the midpoint-rule fold runs in index order on BOTH
engines (Spark ``aggregate`` over ``sequence``; DuckDB ``list_reduce``
over ``generate_series`` — ordered left folds, not unordered SUM), so
cross-engine drift is bounded by libm pow ulps (~1e-16 per term),
invisible at round-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["lsh_band_plan", "band_factorisations"]


def band_factorisations(num_hashes: int) -> list[tuple[int, int]]:
    """All (bands, rows) with ``bands * rows == num_hashes``, bands
    ascending — the exact factorisations the planner scores."""
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1 (got {num_hashes})")
    return [
        (b, num_hashes // b)
        for b in range(1, num_hashes + 1)
        if num_hashes % b == 0
    ]


def lsh_band_plan(
    spark: SparkSession,
    num_hashes: int = 128,
    threshold: float = 0.5,
    n_steps: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Score every (bands, rows) factorisation of ``num_hashes``
    against ``threshold``. Output, one row per factorisation:
    ``(bands, rows_per_band, s50, p_at_threshold, fp_area, fn_area,
    total_error, plan_rank)`` where ``s50`` is the curve's midpoint
    ``(1 - 0.5^(1/b))^(1/r)``, the areas are midpoint-rule integrals
    over ``n_steps`` steps, and ``plan_rank`` orders by total error
    (ties to fewer bands — fewer bands = fewer bucket tables). Rank 1
    is the recommendation; callers wanting recall-heavy or
    precision-heavy plans re-rank by ``fn_area``/``fp_area``.
    """
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1) (got {threshold})")
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1 (got {n_steps})")
    pairs = band_factorisations(num_hashes)
    df = spark.createDataFrame(pairs, "bands int, rows_per_band int")

    b = F.col("bands").cast("double")
    r = F.col("rows_per_band").cast("double")

    def p_of(s):
        return F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(s, r), b)

    def area(kind: str):
        # ordered midpoint-rule fold: index order on every engine
        def step(acc, i):
            s = (i.cast("double") + 0.5) / n_steps
            p = p_of(s)
            if kind == "fp":
                term = F.when(s < threshold, p).otherwise(0.0)
            else:
                term = F.when(s >= threshold, F.lit(1.0) - p).otherwise(0.0)
            return acc + term

        return (
            F.aggregate(
                F.sequence(F.lit(0), F.lit(n_steps - 1)),
                F.lit(0.0),
                step,
            )
            / n_steps
        )

    scored = df.select(
        "bands",
        "rows_per_band",
        F.round(
            F.pow(
                F.lit(1.0) - F.pow(F.lit(0.5), F.lit(1.0) / b),
                F.lit(1.0) / r,
            ),
            round_digits,
        ).alias("s50"),
        F.round(p_of(F.lit(float(threshold))), round_digits).alias(
            "p_at_threshold"
        ),
        F.round(area("fp"), round_digits).alias("fp_area"),
        F.round(area("fn"), round_digits).alias("fn_area"),
    ).withColumn(
        "total_error", F.round(F.col("fp_area") + F.col("fn_area"), round_digits)
    )
    w = Window.orderBy(F.col("total_error").asc(), F.col("bands").asc())
    return scored.withColumn(
        "plan_rank", F.row_number().over(w).cast("int")
    )
