"""Statistical disclosure control: count rounding and small-count redaction.

Parity target: ``/root/reference`` ``data_privacy.py:15-136``.

Both operators are pure per-row projections (``when/otherwise`` + arithmetic)
— JVM-side, whole-stage-codegen, zero shuffle at any scale.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

__all__ = [
    "dp_noisy_counts",
    "dp_noisy_sums",
    "dp_quantile",
    "round_counts_to_multiple",
    "redact_low_counts",
    "suppress_small_groups",
    "k_anonymity_violations",
    "generalize_columns",
    "l_diversity_violations",
    "t_closeness_violations",
]


def _validate_columns_arg(columns) -> None:
    if not isinstance(columns, list) or not all(
        isinstance(c, str) for c in columns
    ):
        raise TypeError("The 'columns' argument must be a list of strings.")


def round_counts_to_multiple(
    df: DataFrame, columns: List[str], multiple: int = 5
) -> DataFrame:
    """Round each listed column to the nearest ``multiple`` (long result).

    Implemented as ``cast(round(col / multiple) * multiple as bigint)`` —
    Spark's ``round`` is HALF_UP, so with ``multiple=5``: 7 -> 5, 17 -> 15
    (round(3.4)=3), 22 -> 20, 12.5-style exact halves round up. Nulls pass
    through as null. Parity: reference ``data_privacy.py:15-69`` — note the
    reference docstring's "17 -> 20" example is contradicted by its own test
    suite (``tests/test_data_privacy.py:37-46``: 17 -> 15); the tests are
    authoritative and this implementation matches them.

    Raises:
        TypeError: non-DataFrame ``df`` or non-list-of-str ``columns``.
        ValueError: non-positive/non-int ``multiple`` or missing column.
    """
    if not isinstance(df, DataFrame):
        raise TypeError("The input 'df' must be a Spark DataFrame.")
    _validate_columns_arg(columns)
    if not isinstance(multiple, int) or multiple <= 0:
        raise ValueError("The 'multiple' argument must be a positive integer.")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(
            f"The column '{missing[0]}' does not exist in the DataFrame."
        )

    rounded = {
        c: (F.round(F.col(c) / multiple) * multiple).cast(LongType())
        for c in columns
    }
    # Single projection for all columns (one select node, not N withColumns).
    return df.withColumns(rounded)


def redact_low_counts(
    df: DataFrame,
    columns: List[str],
    threshold: int,
    redaction_value: Optional[Union[str, int]] = None,
) -> DataFrame:
    """Replace values below ``threshold`` with ``redaction_value``.

    Semantics (parity: reference ``data_privacy.py:72-136``):

    - ``col >= threshold`` KEEPS the value (boundary kept);
    - nulls are REDACTED (``null >= t`` is null -> otherwise branch);
    - a *string* ``redaction_value`` promotes the whole column to string
      (``when/otherwise`` type promotion);
    - ``redaction_value=None`` redacts to null.

    Raises:
        ValueError: non-positive threshold or missing column.
        TypeError: ``columns`` not a list of strings.
    """
    if not isinstance(threshold, int) or threshold <= 0:
        raise ValueError("Threshold must be a positive integer.")
    _validate_columns_arg(columns)
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"Column '{missing[0]}' does not exist in the DataFrame.")

    redaction_lit = F.lit(redaction_value) if redaction_value is not None else F.lit(None)
    # a string redaction value promotes the kept values to string too —
    # make that promotion EXPLICIT (non-ANSI mode would do it implicitly,
    # ANSI mode would instead keep the numeric type and only fail when a
    # redacted row is actually produced; the explicit cast gives identical
    # reference semantics under both modes)
    def kept(c: str):
        col = F.col(c)
        return col.cast("string") if isinstance(redaction_value, str) else col

    redacted = {
        c: F.when(F.col(c) >= threshold, kept(c)).otherwise(redaction_lit)
        for c in columns
    }
    return df.withColumns(redacted)


def suppress_small_groups(
    df: DataFrame, count_col: str, threshold: int
) -> DataFrame:
    """Drop whole rows whose ``count_col`` is below ``threshold`` — the
    suppression alternative to :func:`redact_low_counts` when even the
    existence of a small group is disclosive (null counts are suppressed
    too, matching redaction's null-is-unsafe stance). ``>= threshold``
    keeps, same boundary as redaction.

    Extension of the reference's §2.3 surface (``data_privacy.py:72-136``
    nulls values; suppression removes rows). Plain filter: pushdown-able,
    zero shuffle.
    """
    if not isinstance(threshold, int) or isinstance(threshold, bool) or threshold <= 0:
        raise ValueError("The 'threshold' argument must be a positive integer.")
    if count_col not in df.columns:
        raise ValueError(f"Column '{count_col}' not found in DataFrame.")
    return df.filter(F.col(count_col) >= threshold)


def k_anonymity_violations(
    df: DataFrame, quasi_cols: List[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier combinations held by fewer than ``k`` rows — the
    re-identification audit run BEFORE releasing a table: every returned
    combination pins its rows to a group small enough to single people
    out, so it must be generalised, suppressed (see
    :func:`suppress_small_groups`) or rounded before release. An empty
    result certifies the table k-anonymous over ``quasi_cols``.

    Output: the quasi-identifier columns + ``n_rows`` (< ``k``). Null is a
    value here — an all-null combination that only a few rows share is
    exactly as identifying as any other rare combination.

    Plan shape: one groupBy over the quasi columns (map-side partial
    combine; the shuffle carries one row per distinct combination, never
    the data rows) + a count filter. Scale-invariant by construction.
    """
    _validate_columns_arg(quasi_cols)
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    missing = [c for c in quasi_cols if c not in df.columns]
    if missing:
        raise ValueError(f"quasi_cols not in DataFrame: {missing}")
    if not isinstance(k, int) or isinstance(k, bool) or k <= 1:
        raise ValueError("k must be an integer > 1")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") < k)
    )


def generalize_columns(
    df: DataFrame,
    spec: dict,
) -> DataFrame:
    """Generalise quasi-identifier columns — the standard REMEDY applied
    after :func:`k_anonymity_violations` flags risky combinations:
    coarser values merge rare combinations into common ones until groups
    clear ``k``.

    ``spec`` maps column name -> rule:

    - ``("bin", width)`` — numeric to half-open range labels
      ``"[lo, hi)"`` with ``lo = floor(x / width) * width`` (floor, so
      negatives bin correctly);
    - ``("date_trunc", unit)`` — date/timestamp truncated to ``unit``
      (``"year"``, ``"month"``, ``"week"``, ...), returned as a date;
    - ``("prefix", n)`` — string truncated to its first ``n`` characters
      (postcode-style generalisation).

    Nulls pass through as null (a null generalises to null). Pure
    projection: zero shuffle at any scale; re-run the audit afterwards to
    confirm the table now clears ``k``.
    """
    if not spec:
        raise ValueError("spec must map at least one column to a rule")
    missing = [c for c in spec if c not in df.columns]
    if missing:
        raise ValueError(f"spec columns not in DataFrame: {missing}")
    out = {}
    for col, rule in spec.items():
        if not isinstance(rule, tuple) or len(rule) != 2:
            raise ValueError(f"rule for '{col}' must be a (kind, arg) tuple")
        kind, arg = rule
        c = F.col(col)
        if kind == "bin":
            if not isinstance(arg, (int, float)) or arg <= 0:
                raise ValueError(f"bin width for '{col}' must be positive")
            lo = F.floor(c / F.lit(arg)) * F.lit(arg)
            hi = lo + F.lit(arg)
            # integer widths render integer bounds (no '10.0' labels)
            if isinstance(arg, int):
                lo, hi = lo.cast("long"), hi.cast("long")
            out[col] = F.when(
                c.isNotNull(),
                F.concat(F.lit("["), lo.cast("string"), F.lit(", "),
                         hi.cast("string"), F.lit(")")),
            )
        elif kind == "date_trunc":
            out[col] = F.when(
                c.isNotNull(), F.date_trunc(arg, c).cast("date")
            )
        elif kind == "prefix":
            if not isinstance(arg, int) or arg < 1:
                raise ValueError(f"prefix length for '{col}' must be >= 1")
            out[col] = F.substring(c, 1, arg)
        else:
            raise ValueError(
                f"unknown rule kind {kind!r} for '{col}' "
                "(expected bin | date_trunc | prefix)"
            )
    return df.withColumns(out)


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — the disclosure check k-anonymity misses: a
    quasi-identifier group can hold k people yet reveal the sensitive
    attribute outright when every member SHARES it (homogeneity attack).
    Returns the groups whose sensitive column takes fewer than ``l``
    distinct values, with group size and the observed diversity.

    ONE aggregate keyed by the quasi-identifier columns; the shuffle
    carries per-combination partial states (count + distinct-set),
    map-side combinable, one row per distinct combination.
    """
    if l < 2:
        raise ValueError(f"l must be >= 2 (got {l})")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(F.col(sensitive_col)).alias("n_distinct_sensitive"),
        )
        .filter(F.col("n_distinct_sensitive") < l)
    )


def t_closeness_violations(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    round_digits: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    disclosure check l-diversity misses: a group can hold many DISTINCT
    sensitive values yet still leak (skewness attack) when its value
    DISTRIBUTION differs sharply from the table's (e.g. a group where
    90% share the rare top income band). For an ORDERED sensitive
    attribute the distance is the Earth Mover's Distance over the value
    order: ``EMD = sum_i |cumP_i - cumQ_i| / (m - 1)`` with P the
    group's distribution, Q the global one, m the number of distinct
    values. Returns groups with ``t_distance > t`` (plus size and
    distance); empty result certifies t-closeness at level ``t``.

    Plan shape, all group-cardinality-bounded: the global distribution
    and its cumulative are value-cardinality frames; the per-group grid
    is groups x values (both dimension-sized — this is an audit over
    released categories, not raw data keys); one window cumsum per
    group and one combinable aggregate. The only data-proportional
    stages are the two groupBy counts any release audit pays.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not 0 <= t <= 1:
        raise ValueError(f"t must be in [0, 1] (got {t})")
    from ..caching import tracked_persist

    s = F.col(sensitive_col)
    base = tracked_persist(
        df.filter(s.isNotNull()).select(*quasi_cols, sensitive_col)
    )
    # global distribution + cumulative, ordered by the sensitive value
    gl = base.groupBy(sensitive_col).agg(F.count(F.lit(1)).alias("_gn"))
    w_all = Window.orderBy(sensitive_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    glob = gl.select(
        sensitive_col,
        (
            F.sum("_gn").over(w_all)
            / F.sum("_gn").over(Window.partitionBy())
        ).alias("_cumq"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_m"),
    )
    groups = base.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    grid = groups.crossJoin(
        F.broadcast(glob.select(sensitive_col, "_cumq", "_m"))
    )
    cv = base.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_cn")
    )
    w_grp = (
        Window.partitionBy(*quasi_cols)
        .orderBy(sensitive_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        grid.join(cv, on=[*quasi_cols, sensitive_col], how="left")
        .withColumn("_cn", F.coalesce(F.col("_cn"), F.lit(0)))
        .withColumn(
            "_cump", F.sum("_cn").over(w_grp) / F.col("n_rows")
        )
    )
    # m = 1 distinct sensitive value means every group's distribution
    # equals the global one — EMD is 0 — but the ordered-EMD normaliser
    # (m - 1) would be 0 and error under ANSI; clamp to 1 (numerator is
    # 0 in that case, so the clamp never changes a nonzero distance)
    emd = joined.groupBy(*quasi_cols, "n_rows").agg(
        F.round(
            F.sum(F.abs(F.col("_cump") - F.col("_cumq")))
            / F.greatest(F.max("_m") - F.lit(1), F.lit(1)),
            round_digits,
        ).alias("t_distance")
    )
    return emd.filter(F.col("t_distance") > t)


#: uniform-noise resolution for the deterministic Laplace draw (the
#: selection module's Gumbel recipe, same hash protocol)
_DP_RES = 1_000_000


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    *,
    salt: str,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group counts with Laplace(1/epsilon) noise — the epsilon-DP
    release mechanism for COUNT queries (sensitivity 1: one individual
    changes any count by at most 1), with the repo's HASH-DETERMINISTIC
    noise protocol: the Laplace draw derives from ``md5(group key,
    salt)`` via inverse-CDF, never an RNG, so re-runs, retries and
    repartitioning release the SAME noisy value (re-running a DP
    release with fresh noise is itself a privacy leak — averaging runs
    cancels the noise; determinism per (release, salt) closes that
    channel, and rotating the salt IS the accounted new release).

    The ``salt`` is the PRF key of the mechanism and MUST be secret and
    high-entropy: the group key is a column of the released output and
    the noise formula is public, so anyone who knows the salt can
    recompute the noise and subtract it, recovering exact counts. The
    epsilon-DP guarantee is therefore CONDITIONAL on salt secrecy
    (PRF-seeded noise, not information-theoretic); an empty salt would
    make the noise publicly recomputable and is rejected.

    ``noise = -(1/eps) * sign(u - 0.5) * ln(1 - 2|u - 0.5|)`` with
    ``u = (md5(key || salt) % res + 0.5) / res`` — exactly invertible
    in any SQL engine, so an oracle HOLDING THE SALT replays the
    release bit-for-bit. NULL group values are keyed as the sentinel
    ``chr(0) + 'null'`` (never colliding with the empty string — and
    matching what an oracle's NULL-propagating ``||`` would otherwise
    diverge on). Output: ``(*group_cols, noisy_count)`` — the true
    count is NOT a column (releasing it alongside would defeat the
    mechanism); the aggregate is one map-side-combinable groupBy at
    any scale.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0 (got {epsilon})")
    if not salt:
        raise ValueError(
            "dp_noisy_counts requires a non-empty salt: the salt is the "
            "secret PRF key of the deterministic-noise mechanism — with "
            "an empty (or public) salt the noise is recomputable from "
            "the released output and the counts are recoverable"
        )
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    noise = _dp_laplace_noise(group_cols, salt, scale=1.0 / float(epsilon))
    return counts.select(
        *group_cols,
        F.round(F.col("_n") + noise, round_digits).alias("noisy_count"),
    )


def _dp_laplace_noise(group_cols: list[str], salt: str, scale: float):
    """The shared hash-deterministic Laplace draw: ``-scale * sign(u -
    0.5) * ln(1 - 2|u - 0.5|)`` with ``u`` from md5(group key, salt) —
    one noise arithmetic for every DP mechanism in the module, exactly
    invertible in any SQL engine. NULL group values key as the
    chr(0)-sentinel (never colliding with the empty string)."""
    null_key = "\x00null"
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(null_key))
            for c in group_cols
        ],
        F.lit(salt),
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % _DP_RES
        + F.lit(0.5)
    ) / _DP_RES
    centered = u - F.lit(0.5)
    return (
        F.lit(-scale)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def dp_noisy_sums(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    clip: float,
    epsilon: float = 1.0,
    *,
    salt: str,
    round_digits: int = 4,
) -> DataFrame:
    """Per-group SUM of ``value_col`` released with Laplace(clip /
    epsilon) noise — the bounded-sensitivity companion of
    :func:`dp_noisy_counts` and the other half of every DP aggregate
    release (count + sum gives a private mean). Each row's contribution
    is CLIPPED into ``[0, clip]`` before summation: clipping is what
    bounds the sensitivity (one individual moves any sum by at most
    ``clip``), so noise scale = ``clip / epsilon``. The clip bound is a
    POLICY input (set it from domain knowledge, never from the data —
    a data-derived clip leaks).

    Same hash-deterministic PRF-noise protocol as
    :func:`dp_noisy_counts` (the shared :func:`_dp_laplace_noise`
    arithmetic, salted per-release and NULL-sentinel-keyed; an empty
    salt is rejected for the same recoverability reason), with the sum
    salt domain-separated from any count released over the same groups
    (``salt + chr(2)``) so a joint (count, sum) release never reuses a
    draw. Output ``(*group_cols, noisy_sum)``; the true sum is not a
    column. One map-side-combinable aggregate at any scale.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0 (got {epsilon})")
    if clip <= 0:
        raise ValueError(f"clip must be > 0 (got {clip})")
    if not salt:
        raise ValueError(
            "dp_noisy_sums requires a non-empty salt: the salt is the "
            "secret PRF key of the deterministic-noise mechanism — with "
            "an empty (or public) salt the noise is recomputable from "
            "the released output and the sums are recoverable"
        )
    clipped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(clip)),
    )
    sums = df.groupBy(*group_cols).agg(F.sum(clipped).alias("_s"))
    noise = _dp_laplace_noise(
        group_cols, salt + "\x02", scale=float(clip) / float(epsilon)
    )
    return sums.select(
        *group_cols,
        F.round(F.col("_s") + noise, round_digits).alias("noisy_sum"),
    )


def dp_quantile(
    df: DataFrame,
    value_col: str,
    group_cols: List[str],
    domain_lo: float,
    domain_hi: float,
    domain_step: float = 1.0,
    q: float = 0.5,
    epsilon: float = 1.0,
    *,
    salt: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group epsilon-DP quantile via the EXPONENTIAL mechanism
    (McSherry & Talwar 2007) — the third member of the DP release
    family next to :func:`dp_noisy_counts` / :func:`dp_noisy_sums`
    (count + sum + median is the canonical private-summary trio, and a
    quantile CANNOT be released by adding noise to the true value: its
    unbounded local sensitivity is the textbook case for selection
    mechanisms over additive noise).

    Candidates come from a FIXED grid ``domain_lo..domain_hi`` step
    ``domain_step`` — a POLICY input like ``dp_noisy_sums``' clip
    bound, never derived from the data (a data-derived candidate set
    leaks support). Each grid point ``t`` scores the rank utility
    ``u(t) = -| #(v <= t) - q*n |`` (sensitivity 1: one individual
    moves any rank count by at most 1), and the winner is drawn by the
    Gumbel-max trick — equivalent to sampling with probability
    proportional to ``exp(eps/2 * u)``, the exponential mechanism —
    with the repo's HASH-DETERMINISTIC protocol: the Gumbel variate
    ``g = -ln(-ln(u_hash))`` derives from ``md5(group, t, salt)``, so
    re-runs release the SAME quantile (fresh draws average away the
    mechanism; rotating the salt is the accounted new release) and an
    oracle holding the salt replays the selection exactly. Selection
    scores round to ``round_digits`` BEFORE the argmax (ties to the
    smaller ``t``), so engines whose ``ln`` differs in the last ulp
    still pick the same winner. Same salt-secrecy caveat as the other
    mechanisms; domain-separated internally (``salt + chr(3)``).

    Plan shape: one bucketed per-group count aggregate (combinable),
    a groups x grid frame (grid is policy-bounded, so this is
    group-cardinality-bounded like every release in this module), a
    cumulative-count window per group, one argmax. Output:
    ``(*group_cols, dp_quantile)`` — true ranks/counts are not
    columns.
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0 (got {epsilon})")
    if not 0 < q < 1:
        raise ValueError(f"q must be in (0, 1) (got {q})")
    if domain_step <= 0:
        raise ValueError(f"domain_step must be > 0 (got {domain_step})")
    if domain_hi < domain_lo:
        raise ValueError(
            f"need domain_hi >= domain_lo (got {domain_lo}..{domain_hi})"
        )
    if not salt:
        raise ValueError(
            "dp_quantile requires a non-empty salt: the salt is the "
            "secret PRF key of the deterministic-draw mechanism — with "
            "an empty (or public) salt the selection is recomputable "
            "and the rank information is recoverable"
        )
    m = int((float(domain_hi) - float(domain_lo)) / float(domain_step)) + 1
    lo, step = float(domain_lo), float(domain_step)

    # bucket j = first grid index i with t_i >= v (so #(v <= t_i) is the
    # cumulative count of buckets <= i); values above the grid get the
    # out-of-range sentinel m and never enter any cumulative count
    v = F.col(value_col).cast("double")
    j = F.ceil((v - lo) / step).cast("long")
    j = F.when(v <= lo, F.lit(0)).otherwise(j)
    j = F.least(F.greatest(j, F.lit(0)), F.lit(m)).alias("_j")
    bucket_counts = df.select(*group_cols, j).groupBy(
        *group_cols, "_j"
    ).agg(F.count(F.lit(1)).alias("_c"))

    groups = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    grid = groups.select(
        *group_cols,
        "_n",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_i"),
    )
    join_cond = [
        *[F.col(f"g.{c}").eqNullSafe(F.col(f"b.{c}")) for c in group_cols],
        F.col("g._i") == F.col("b._j"),
    ]
    joined = (
        grid.alias("g")
        .join(bucket_counts.alias("b"), on=join_cond, how="left")
        .select("g.*", F.coalesce(F.col("b._c"), F.lit(0)).alias("_c"))
    )

    wcum = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_val = (F.lit(lo) + F.col("_i") * step).alias("_t")
    null_key = "\x00null"
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(null_key))
            for c in group_cols
        ],
        F.col("_t").cast("string"),
        F.lit(salt + "\x03"),
    )
    u_hash = (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
        % _DP_RES
        + F.lit(0.5)
    ) / _DP_RES
    gumbel = -F.log(-F.log(u_hash))
    scored = joined.withColumn("_cum", F.sum("_c").over(wcum)).select(
        *group_cols,
        t_val,
        F.round(
            F.lit(float(epsilon) / 2.0)
            * (-F.abs(F.col("_cum") - F.lit(float(q)) * F.col("_n")))
            + gumbel,
            round_digits,
        ).alias("_score"),
    )
    best = scored.groupBy(*group_cols).agg(
        F.min(
            F.struct(
                (-F.col("_score")).alias("neg"), F.col("_t").alias("t")
            )
        ).alias("_best")
    )
    return best.select(
        *group_cols, F.col("_best.t").alias("dp_quantile")
    )
