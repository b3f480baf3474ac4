"""Deterministic sampling and dataset splitting for training-data pipelines.

Extension layer (SURVEY.md §7; no reference counterpart — the reference has
no sampling surface). Everything here is *hash-deterministic*, not
RNG-based: a row's split/sample membership depends only on its id (plus an
explicit salt), so

- re-runs, retries, and cluster re-partitioning cannot change the result
  (Spark's ``df.sample``/``sampleBy`` are seed+partition dependent);
- membership is reproducible by any other engine with md5 (the DuckDB
  oracles assert exact row parity);
- train/val/test contamination is structurally impossible: the buckets
  partition the hash space.

All expressions are JVM-side built-ins (zero UDFs) over the portable
60-bit hash in ``functions.hashing`` — one narrow projection, no shuffle,
fully pushdown/codegen friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64, stable_hash_sql

__all__ = [
    "split_bucket",
    "hash_split",
    "hash_split_sql",
    "leakage_safe_split",
    "deterministic_sample",
    "weighted_sample",
    "stratified_sample",
    "mixture_sample",
    "solve_mixture_cutoffs",
    "cap_per_group",
    "BUCKETS",
    "temperature_weights",
    "mixture_epoch_plan",
    "epoch_expand",
]

#: hash-space resolution: weights are quantised to 1/10000
BUCKETS = 10_000


def split_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, BUCKETS)`` from a row id and salt."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return stable_hash64(F.concat(c.cast("string"), F.lit(salt))) % BUCKETS


def _bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB fragment computing exactly :func:`split_bucket`."""
    return f"({stable_hash_sql(f'({id_expr})::VARCHAR || {salt!r}')} % {BUCKETS})"


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split, deterministically by id.

    ``weights`` maps split name -> fraction (must sum to 1 within 1/BUCKETS);
    boundaries are cumulative in dict insertion order, so
    ``{"train": .98, "val": .01, "test": .01}`` gives train buckets
    [0, 9800), val [9800, 9900), test [9900, 10000). Changing the salt
    re-draws the assignment; omitting it keeps splits stable across runs
    and datasets sharing the id space.
    """
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    total = sum(weights.values())
    if abs(total - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"weights must sum to 1 (got {total})")
    if split_col in df.columns:
        raise ValueError(f"column '{split_col}' already exists")
    bucket = split_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        bound = int(round(acc * BUCKETS))
        branch = F.when(bucket < F.lit(bound), F.lit(name))
        expr = branch if expr is None else expr.when(
            bucket < F.lit(bound), F.lit(name)
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def hash_split_sql(
    id_expr: str, weights: dict[str, float], salt: str = ""
) -> str:
    """DuckDB CASE expression computing exactly :func:`hash_split`'s
    ``split`` column — kept next to the operator so registry oracles embed
    the same boundaries."""
    bucket = _bucket_sql(id_expr, salt)
    acc = 0.0
    branches = []
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        bound = int(round(acc * BUCKETS))
        branches.append(f"WHEN {bucket} < {bound} THEN '{name}'")
    if not branches:
        return f"'{names[-1]}'"
    return f"CASE {' '.join(branches)} ELSE '{names[-1]}' END"


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    weights: dict[str, float],
    cluster_col: str = "component",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split by DUPLICATE CLUSTER, not by row.

    A row-level hash split leaks through near-duplicates: two copies of
    one document land in train and test and the eval is contaminated.
    Here every row is assigned its cluster id from ``clusters``
    (``(id, cluster)``; rows absent from the map are their own singleton
    group via ``coalesce``), and :func:`hash_split` runs on the GROUP
    key — so a whole near-dup family moves to one split by construction.

    Plan shape: one equi-join on the id (the cluster map is small —
    only duplicated docs need rows — so AQE broadcasts it when it fits);
    the split itself stays a pure hash projection. Output: ``df``'s
    columns + the group key (``_split_group``) + ``split_col``.
    """
    if id_col not in df.columns:
        raise ValueError(f"id_col '{id_col}' not in DataFrame")
    if cluster_col not in clusters.columns:
        raise ValueError(f"cluster_col '{cluster_col}' not in clusters")
    cmap = clusters.select(
        F.col(id_col).alias("_cid"), F.col(cluster_col).alias("_component")
    )
    joined = df.join(
        cmap, df[id_col] == cmap["_cid"], how="left"
    ).drop("_cid")
    grouped = joined.withColumn(
        "_split_group", F.coalesce(F.col("_component"), F.col(id_col))
    ).drop("_component")
    return hash_split(
        grouped, "_split_group", weights, salt=salt, split_col=split_col
    )


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id-hash bucket.

    Unlike ``df.sample``, membership is a pure function of the row id: the
    same row is kept in every run, on any cluster layout, and different
    fractions nest (a 1% sample is a subset of a 10% sample with the same
    salt) — the property that makes progressive data ablations comparable.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1] (got {fraction})")
    bound = int(round(fraction * BUCKETS))
    return df.filter(split_bucket(id_col, salt) < F.lit(bound))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    scale: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-row Bernoulli keep with probability ``clamp(weight * scale,
    0, 1)``, decided by the row's id hash — deterministic weighted
    subsampling (quality-weighted corpus thinning, importance-style
    upweighting of rare slices without an RNG).

    Same reproducibility contract as :func:`deterministic_sample`:
    membership is a pure function of (id, salt), so runs/AQE/partitioning
    never change the sample, and raising ``scale`` strictly GROWS the
    kept set (a row kept at scale s is kept at any s' > s) — nested
    ablations stay comparable. Null or negative weights drop the row;
    weights >= 1/scale always keep it. Plain filter: pushdown-eligible,
    zero shuffle.
    """
    if scale <= 0:
        raise ValueError(f"scale must be positive (got {scale})")
    prob = F.least(
        F.greatest(F.col(weight_col) * F.lit(scale), F.lit(0.0)), F.lit(1.0)
    )
    return df.filter(
        split_bucket(id_col, salt) < (prob * F.lit(BUCKETS)).cast("long")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: each value of ``strata_col`` gets
    its own keep-fraction (e.g. downsample boilerplate-heavy sources,
    keep all rare-language docs). Strata absent from ``fractions`` use
    ``default_fraction``. Same id-hash determinism as
    :func:`deterministic_sample`; the per-stratum bound is looked up from a
    literal map (broadcast-free, Catalyst-foldable).
    """
    for frac in list(fractions.values()) + [default_fraction]:
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fractions must be in [0, 1] (got {frac})")
    from itertools import chain

    pairs = [
        F.lit(x)
        for x in chain.from_iterable(
            (k, int(round(v * BUCKETS))) for k, v in fractions.items()
        )
    ]
    default_bound = F.lit(int(round(default_fraction * BUCKETS)))
    bound = (
        F.coalesce(F.create_map(*pairs)[F.col(strata_col)], default_bound)
        if pairs
        else default_bound
    )
    return df.filter(split_bucket(id_col, salt) < bound)


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``n`` rows per group, chosen deterministically by the
    id-hash order (hash asc, id asc tie-break) — "cap every source at N
    documents" without RNG: membership survives re-runs, retries and
    repartitioning, and raising ``n`` only ever ADDS rows (nested caps,
    like :func:`deterministic_sample`'s nested fractions).

    Plan: rank-then-filter per group — Catalyst rewrites to
    ``WindowGroupLimit`` (map-side pruning to ≤ n rows per group per input
    split before the exchange), so the shuffle carries at most
    n × #splits rows per group, not the corpus.
    """
    if n <= 0:
        raise ValueError(f"n must be positive (got {n})")
    w = Window.partitionBy(group_col).orderBy(
        split_bucket(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= n)
        .drop("_cap_rn")
    )


def solve_mixture_cutoffs(
    counts: dict[str, int], weights: dict[str, float]
) -> dict[str, int]:
    """Pure kernel of :func:`mixture_sample`: per-source bucket cutoffs for
    the largest corpus whose kept counts sit at the target mixture.

    Shares renormalise over sources present in ``counts``; the binding
    source (scarcest relative to its share) gets cutoff ``BUCKETS`` (kept
    whole, up to float slop); every cutoff is in ``[0, BUCKETS]``. The
    expression order here is mirrored verbatim by the DuckDB oracle SQL so
    the IEEE double arithmetic is bit-identical.
    """
    total_w = sum(w for s, w in weights.items() if s in counts)
    shares = {s: weights[s] / total_w for s in counts}
    # largest total N with share_s * N <= n_s for every present source
    target_total = min(counts[s] / shares[s] for s in counts)
    return {
        s: int(shares[s] * target_total / counts[s] * BUCKETS)
        for s in counts
    }


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Downsample a multi-source corpus to a target mixture, keeping as much
    data as the mixture allows.

    ``weights`` maps source values to target shares (must be positive; they
    are normalised, so {'web': 3, 'code': 1} means 3:1). The *binding*
    source — the one scarcest relative to its target share — is kept at
    100%; every other source is deterministically downsampled so the kept
    counts sit in the target ratio: the largest feasible corpus with this
    mixture. Sources absent from ``weights`` are dropped; weighted sources
    absent from the data are ignored (the mixture renormalises over what
    exists).

    Two jobs: one per-source count aggregate (driver-side fraction solve —
    a handful of scalars, same deliberate eager boundary as ``load_table``
    'latest'), then the usual hash-bucket filter, which stays a narrow
    pushdown-friendly projection at any scale. Exact ratios are subject to
    the 1/10000 bucket quantisation and per-bucket population noise.
    """
    if not weights:
        raise ValueError("weights must be a non-empty dict")
    for w in weights.values():
        if not w > 0:
            raise ValueError(f"weights must be positive (got {w})")
    counts = {
        r["_src"]: r["_n"]
        for r in df.select(F.col(source_col).alias("_src"))
        .groupBy("_src")
        .agg(F.count("*").alias("_n"))
        .collect()
        if r["_src"] in weights
    }
    if not counts:
        return df.filter(F.lit(False))
    cutoffs = solve_mixture_cutoffs(counts, weights)
    from itertools import chain

    pairs = [
        F.lit(x) for x in chain.from_iterable(cutoffs.items())
    ]
    bound = F.create_map(*pairs)[F.col(source_col)]
    return df.filter(split_bucket(id_col, salt) < F.coalesce(bound, F.lit(0)))


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.7,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-based mixture weights over sources: ``p_i =
    n_i^alpha / sum_j n_j^alpha`` — the standard up-weighting of
    low-resource sources (alpha < 1 flattens the natural distribution;
    alpha = 1 keeps it; alpha = 0 is uniform) used to plan multilingual
    / multi-source sampling.

    Output per source: ``n_docs``, ``weight`` (the mixture share) and
    ``per_doc_rate`` (weight / natural share — how much each document
    of the source is over/under-sampled relative to uniform draw).
    The corpus collapses to one row per source; the normaliser is one
    more aggregate over that tiny frame, broadcast back.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0 (got {alpha})")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    powed = counts.withColumn(
        "_p", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    )
    norm = powed.agg(
        F.sum("_p").alias("_z"), F.sum("n_docs").alias("_n")
    )
    return (
        powed.crossJoin(F.broadcast(norm))
        .select(
            source_col,
            "n_docs",
            F.round(F.col("_p") / F.col("_z"), round_digits).alias("weight"),
            F.round(
                (F.col("_p") / F.col("_z"))
                / (F.col("n_docs") / F.col("_n")),
                round_digits,
            ).alias("per_doc_rate"),
        )
    )


def mixture_epoch_plan(
    df: DataFrame,
    source_col: str = "source",
    size_col: str = "n_tokens",
    alpha: float = 0.7,
    budget_multiplier: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Token-budget mixture planning: the table a pretraining run is
    configured from (the LLaMA/mT5 "sampling proportion & epochs"
    table). Where :func:`temperature_weights` plans by DOCUMENT counts,
    this plans by TOKEN mass and converts the mixture into concrete
    loader directives for a fixed token budget
    ``B = budget_multiplier * total_tokens``:

    - ``weight``: temperature-smoothed token share
      ``tok_s^alpha / sum_j tok_j^alpha`` (alpha < 1 up-weights
      low-resource sources);
    - ``tokens_needed = weight * B``: this source's slice of the budget;
    - ``epochs = tokens_needed / n_tokens``: how many passes over the
      source the plan implies (> 1 = repetition, the quantity data-
      constrained scaling laws cap);
    - ``sample_rate = min(1, epochs)``: the per-pass keep rate when the
      loader down-samples instead of repeating.

    One map-side-combinable per-source aggregate over the corpus; the
    normaliser is one more aggregate over the C-row source frame,
    broadcast back. Nothing scales with document count downstream of
    the first groupBy, so the plan costs one corpus scan at any size.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0 (got {alpha})")
    if budget_multiplier <= 0:
        raise ValueError(
            f"budget_multiplier must be > 0 (got {budget_multiplier})"
        )
    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).cast("long").alias("n_tokens"),
    )
    powed = counts.withColumn(
        "_p", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    )
    norm = powed.agg(F.sum("_p").alias("_z"), F.sum("n_tokens").alias("_n"))
    weight = F.col("_p") / F.col("_z")
    budget = F.col("_n") * F.lit(float(budget_multiplier))
    epochs = weight * budget / F.col("n_tokens")
    return (
        powed.crossJoin(F.broadcast(norm))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_n"), round_digits).alias(
                "natural_share"
            ),
            F.round(weight, round_digits).alias("weight"),
            F.round(weight * budget, 1).alias("tokens_needed"),
            F.round(epochs, round_digits).alias("epochs"),
            F.round(F.least(epochs, F.lit(1.0)), round_digits).alias(
                "sample_rate"
            ),
        )
    )


def epoch_expand(
    df: DataFrame,
    epochs_by_source: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Materialise a mixture plan into the loader-ready repeated
    dataset: each document of a source with ``epochs = e`` appears
    ``floor(e)`` times plus one more with probability ``frac(e)`` —
    decided by the deterministic hash draw ``u(id, salt) < frac(e)``,
    so expected copies = e exactly, re-runs/retries/repartitioning
    reproduce the same expansion, and an oracle can replay it row for
    row. The output carries ``epoch_idx`` (0-based copy number) so a
    training loader can interleave copies across epochs instead of
    replaying a source back-to-back.

    Plan shape: the plan frame (C rows) broadcasts onto the corpus; the
    expansion is one ``explode(sequence(...))`` per row — no shuffle at
    all beyond what the caller does next. Sources missing from the plan
    are DROPPED (epochs 0), matching mixture semantics.
    """
    plan = epochs_by_source.select(
        F.col(source_col).alias("_src"), F.col("epochs").alias("_e")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                                  F.lit(salt))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        % BUCKETS
        + F.lit(0.5)
    ) / BUCKETS
    n_copies = (
        F.floor(F.col("_e")).cast("int")
        + F.when(u < (F.col("_e") - F.floor(F.col("_e"))), 1).otherwise(0)
    )
    return (
        df.join(
            F.broadcast(plan), df[source_col] == F.col("_src")
        )
        .withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn(
            "epoch_idx",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)),
        )
        .drop("_src", "_e", "_n")
    )
