"""Cross-table data-quality checks: referential integrity at scale.

Extension layer (SURVEY.md §8). A curation pipeline joining facts to
dimensions silently drops (inner join) or null-fills (left join) orphaned
rows; this module measures that damage BEFORE the join strategy is chosen.
Pure DataFrame compositions — no UDFs, no driver collects beyond the
summary row per relationship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["referential_orphans", "observe_metrics", "join_key_audit", "bootstrap_mean_ci", "gopher_rule_audit", "GOPHER_STOPWORDS"]


def observe_metrics(df, name: str, metrics: dict):
    """Attach zero-cost pipeline instrumentation via Spark's Observation
    API: the named aggregates are computed AS A SIDE EFFECT of whatever
    action next materialises ``df`` — no second scan, which at 100 TB is
    the difference between "metrics are free" and "metrics double the
    job". The canonical use: row/null/total counters on every production
    write, asserted against expectations after the write returns.

    Returns ``(observed_df, observation)``: run any action on
    ``observed_df``, then read ``observation.get`` (a dict of metric name
    -> value; blocks until the action finishes). Each Observation is
    single-use — pass a fresh one per action, same as Spark's own API.

    ``metrics`` maps output name -> aggregate Column (``F.count``,
    ``F.sum``, ``F.count(F.when(...))`` — any non-distinct aggregate).
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("metrics must map at least one name to an aggregate")
    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs


def referential_orphans(
    relationships: dict[str, tuple[DataFrame, list[str], DataFrame, list[str]]],
    round_digits: int = 6,
) -> DataFrame:
    """Orphan counts for each named FK relationship: one output row per
    ``name -> (child_df, child_keys, parent_df, parent_keys)`` entry with
    the child row count, orphaned-row count (child keys with no parent
    match, null keys included — a null FK cannot join), and orphan rate.

    Plan shape per relationship: the child prunes to its key columns, a
    left ANTI join against the parent's distinct keys counts the orphans
    (planner broadcasts the parent key set when it is dimension-sized,
    shuffles otherwise — no hints), and two scalar aggregates union into
    the summary. Nothing wider than the key columns moves.
    """
    if not relationships:
        raise ValueError("relationships must contain at least one entry")
    branches = []
    for name, (child, child_keys, parent, parent_keys) in relationships.items():
        if len(child_keys) != len(parent_keys) or not child_keys:
            raise ValueError(
                f"relationship '{name}': child and parent key lists must be "
                "non-empty and the same length"
            )
        c = child.select(
            *[F.col(k).alias(f"_hds_k{i}") for i, k in enumerate(child_keys)]
        )
        p = parent.select(
            *[F.col(k).alias(f"_hds_k{i}") for i, k in enumerate(parent_keys)]
        ).dropDuplicates()
        n_child = c.agg(F.count("*").alias("n"))
        # anti join: unmatched OR null-keyed child rows are orphans
        n_orphan = c.join(
            p, on=[f"_hds_k{i}" for i in range(len(child_keys))], how="left_anti"
        ).agg(F.count("*").alias("n"))
        branches.append(
            n_child.crossJoin(
                n_orphan.withColumnRenamed("n", "n_orphans")
            ).select(
                F.lit(name).alias("relationship"),
                F.col("n").alias("n_child_rows"),
                "n_orphans",
                F.round(
                    F.col("n_orphans") / F.greatest(F.col("n"), F.lit(1)),
                    round_digits,
                ).alias("orphan_rate"),
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def join_key_audit(
    left,
    right,
    left_key: str,
    right_key: str,
):
    """Pre-join cardinality audit: before running an expensive join,
    report how the key spaces overlap and what the join would produce —
    ``n_left_keys / n_right_keys / n_both / n_left_only / n_right_only``,
    the maximum per-key multiplicity on each side (a large product warns
    of a hot-key blowup), and ``n_join_rows``, the EXACT inner-join
    output cardinality (sum over shared keys of left-count *
    right-count).

    NULL keys surface as one ``*_only`` group per side and contribute
    nothing to ``n_join_rows`` — exactly mirroring the real equi-join,
    where NULL never matches NULL.

    Plan shape: each side collapses to one row per distinct key (map-
    side combinable) before the full-outer key join, so the join touches
    key counts, never the data rows; the final scalar aggregate returns
    ONE row. The audit costs two aggregates however large the join
    inputs are.
    """
    lc = left.groupBy(F.col(left_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_ln")
    )
    rc = right.groupBy(F.col(right_key).alias("_k")).agg(
        F.count(F.lit(1)).alias("_rn")
    )
    j = lc.join(rc, on="_k", how="full_outer")
    both = F.col("_ln").isNotNull() & F.col("_rn").isNotNull()
    return j.agg(
        F.count("_ln").alias("n_left_keys"),
        F.count("_rn").alias("n_right_keys"),
        F.sum(both.cast("long")).alias("n_both"),
        F.sum((F.col("_rn").isNull()).cast("long")).alias("n_left_only"),
        F.sum((F.col("_ln").isNull()).cast("long")).alias("n_right_only"),
        F.max("_ln").alias("max_left_mult"),
        F.max("_rn").alias("max_right_mult"),
        F.sum(F.when(both, F.col("_ln") * F.col("_rn"))).alias("n_join_rows"),
    )


#: Poisson(1) inverse-CDF thresholds, P(X <= k) for k = 0..8 — the same
#: literals are embedded in the SQL oracle, so the (documented) tail
#: truncation at 8 (P ~ 1e-6) is identical in both engines
_POISSON1_CDF = [
    0.36787944117144233,   # k=0
    0.7357588823428847,    # k=1
    0.9196986029286058,    # k=2
    0.9810118431238462,    # k=3
    0.9963401531726563,    # k=4
    0.9994058151824183,    # k=5
    0.9999167588507119,    # k=6
    0.9999897508033253,    # k=7
    0.9999988747974129,    # k=8
]

#: uniform-draw resolution for the bootstrap weights
_BOOT_RES = 1_000_000


def bootstrap_mean_ci(
    df,
    value_col: str,
    id_col: str,
    n_resamples: int = 100,
    alpha: float = 0.05,
    salt: str = "",
    round_digits: int = 6,
):
    """Percentile-bootstrap confidence interval for the mean of
    ``value_col`` — the error bar every corpus-level quality metric
    should ship with (is the post-filter mean doc quality REALLY higher,
    or within resampling noise?), via the POISSON bootstrap (each row's
    resample-``r`` multiplicity ~ Poisson(1) — the classic distributed
    reformulation: no global resample-with-replacement pass, every row
    decides its own weights independently, so the whole computation is
    one scan + one combinable aggregate regardless of data size).

    Fully HASH-deterministic (the sampling-module contract): row weights
    derive from ``md5(id, salt, r)`` — never an RNG — so re-runs,
    retries, and repartitioning reproduce the interval bit-for-bit, and
    the SQL oracle replays it. Weights come from the Poisson(1) inverse
    CDF truncated at 8 (P ~ 1e-6, identical literals both engines).

    Bounds are exact order statistics over the SURVIVING resample
    means: a resample whose Poisson weights are all zero (probability
    ``0.368^n`` — non-negligible for tiny inputs) has no mean and is
    dropped BEFORE ranking (a NULL would otherwise sort first and
    silently displace ``ci_lo``), and the ranks re-derive from the
    surviving count ``R'``: ``ci_lo`` = the ``floor(alpha/2 * R') +
    1``-th smallest, ``ci_hi`` the symmetric upper one. Output: ONE row
    ``(point_est, ci_lo, ci_hi, n_resamples)`` — ``n_resamples``
    reports the surviving ``R'``.

    Scale note: the resample explode scans ``n_resamples`` copies of the
    value column (narrow: one double + one id hash per copy) and
    map-side-combines to ``n_resamples`` rows — embarrassingly parallel
    with zero skew. At very large corpora, cut R (the CI narrows with
    corpus size anyway) rather than sampling rows: a sampled bootstrap
    estimates a different (wider) interval.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import stable_hash64

    if n_resamples < 2:
        raise ValueError(f"n_resamples must be >= 2 (got {n_resamples})")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1) (got {alpha})")
    from ..functions.partitioning import ensure_min_partitions

    cdf = F.array(*[F.lit(x) for x in _POISSON1_CDF])
    rows = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("double").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    # widen BEFORE the n_resamples-way explode: the md5 weight derivation
    # runs n_resamples times per row, and a small single-split input would
    # otherwise put that entire multiplied projection on one core (measured
    # as ONE 8.4s task at sf0.1); the repartition moves only the narrow
    # (id, x) rows, weights are hash-derived so results are
    # partitioning-independent
    rows = ensure_min_partitions(rows)
    expanded = rows.select(
        "_x",
        F.explode(F.sequence(F.lit(1), F.lit(n_resamples))).alias("_r"),
        "_id",
    ).select(
        "_r",
        "_x",
        (
            (
                stable_hash64(
                    F.concat(F.col("_id"), F.lit(salt), F.col("_r"))
                )
                % _BOOT_RES
                + 0.5
            )
            / _BOOT_RES
        ).alias("_u"),
    ).select(
        "_r",
        "_x",
        # Poisson(1) inverse CDF: the count of thresholds below u
        F.size(F.filter(cdf, lambda c: c < F.col("_u"))).alias("_w"),
    )
    # drop all-zero-weight resamples (sum(_w) = 0 -> no mean) BEFORE the
    # rank window: a NULL mean sorts first and would displace ci_lo
    means = (
        expanded.groupBy("_r")
        .agg(
            F.sum("_w").alias("_sw"),
            F.sum(F.col("_w") * F.col("_x")).alias("_swx"),
        )
        .filter(F.col("_sw") > 0)
        .select("_r", (F.col("_swx") / F.col("_sw")).alias("_m"))
    )
    from pyspark.sql import Window

    # R rows total: the rank window's single partition is by construction;
    # the surviving count rides along so the ranks adjust to dropped rows
    ranked = means.select(
        "_m",
        F.row_number()
        .over(Window.orderBy(F.col("_m").asc(), "_r"))
        .alias("_rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy(F.lit(1)))
        .alias("_n"),
    )
    lo_rank = F.floor(F.lit(alpha / 2) * F.col("_n")) + 1
    hi_rank = F.col("_n") - lo_rank + 1
    point = rows.agg(F.avg("_x").alias("_p"))
    return (
        ranked.filter((F.col("_rk") == lo_rank) | (F.col("_rk") == hi_rank))
        .agg(
            F.round(F.min("_m"), round_digits).alias("ci_lo"),
            F.round(F.max("_m"), round_digits).alias("ci_hi"),
            F.max("_n").cast("int").alias("_n_surv"),
        )
        .crossJoin(F.broadcast(point))
        .select(
            F.round(F.col("_p"), round_digits).alias("point_est"),
            "ci_lo",
            "ci_hi",
            F.col("_n_surv").alias("n_resamples"),
        )
    )


#: the Gopher (Rae et al. 2021) "must-have" stopwords: a document of
#: natural English prose is expected to contain at least 2 of these
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rule_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    round_digits: int = 4,
) -> DataFrame:
    """Rule-level audit of the Gopher quality filters (Rae et al. 2021,
    Table A1 — the named ruleset behind MassiveText and most successor
    pipelines): for each rule, how many documents FAIL it — the
    corpus-health report read before choosing which rules to enforce
    (a rule failing 90% of a corpus is mis-calibrated for it, not a
    quality signal; exactly the situation this table exposes).

    Rules audited (fail conditions):

    - ``word_count``: words < ``min_words`` or > ``max_words``
    - ``mean_word_length``: outside [3, 10] (tokenless docs fail)
    - ``symbol_ratio``: (# + "..." occurrences) / words > 0.1
    - ``bullet_ratio``: > 90% of lines start with a bullet
    - ``ellipsis_ratio``: > 30% of lines end with "..."
    - ``alpha_ratio``: < 80% of words contain an alphabetic char
    - ``stopword_hits``: fewer than 2 of the 8 must-have stopwords
    - ``all_rules``: fails at least one of the above

    One corpus scan: every signal is a JVM higher-order-function over
    the token/line arrays (no UDF, no extra shuffle); the audit
    aggregate is a single map-side-combinable row unpivoted to one row
    per rule. Output: ``(rule, n_docs, n_fail, fail_rate)``.
    """
    from ..functions.text import tokens

    toks = tokens(F.col(text_col))
    lower_toks = F.transform(toks, lambda t: F.lower(t))
    n_words = F.size(toks)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        / n_words,
    )
    n_hash = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit(""))
    )
    n_ellipsis = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda ln: F.ltrim(ln).startswith("-")
                | F.ltrim(ln).startswith("*"),
            )
        )
        / n_lines,
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda ln: F.rtrim(ln).endswith("...")))
        / n_lines,
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_words,
    )
    stop_hits = sum(
        F.when(F.array_contains(lower_toks, w), 1).otherwise(0)
        for w in GOPHER_STOPWORDS
    )

    fails = {
        "word_count": (n_words < min_words) | (n_words > max_words),
        "mean_word_length": ~F.coalesce(
            (mean_wl >= 3) & (mean_wl <= 10), F.lit(False)
        ),
        "symbol_ratio": F.coalesce(
            (n_hash + n_ellipsis) / n_words > 0.1, F.lit(True)
        ),
        "bullet_ratio": F.coalesce(bullet_frac > 0.9, F.lit(False)),
        "ellipsis_ratio": F.coalesce(ellipsis_frac > 0.3, F.lit(False)),
        "alpha_ratio": ~F.coalesce(alpha_frac >= 0.8, F.lit(False)),
        "stopword_hits": stop_hits < 2,
    }
    fails["all_rules"] = None  # computed below from the others
    any_fail = None
    flagged = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    agg_cols = []
    for rule, cond in fails.items():
        if rule == "all_rules":
            continue
        flagged = flagged.withColumn(
            f"_f_{rule}", F.when(cond, 1).otherwise(0)
        )
        any_fail = (
            F.col(f"_f_{rule}")
            if any_fail is None
            else F.greatest(any_fail, F.col(f"_f_{rule}"))
        )
        agg_cols.append(F.sum(f"_f_{rule}").alias(rule))
    flagged = flagged.withColumn("_f_all_rules", any_fail)
    agg_cols.append(F.sum("_f_all_rules").alias("all_rules"))
    agg_cols.append(F.count(F.lit(1)).alias("_n"))
    one = flagged.agg(*agg_cols)
    rules = list(fails)
    stack = ", ".join(f"'{r}', {r}" for r in rules)
    return one.select(
        F.expr(f"stack({len(rules)}, {stack}) AS (rule, n_fail)"),
        F.col("_n").alias("n_docs"),
    ).select(
        "rule",
        F.col("n_docs").cast("long"),
        F.col("n_fail").cast("long"),
        F.round(F.col("n_fail") / F.col("n_docs"), round_digits).alias(
            "fail_rate"
        ),
    )
