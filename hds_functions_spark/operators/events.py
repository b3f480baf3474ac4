"""Event-time operators over timestamped fact tables (batch).

Extension layer (SURVEY.md §7): tumbling-window aggregation, gap-based
sessionisation, as-of joins, and interval joins — the event/time-series
surface the reference lacks (it has no streaming/temporal operators; its
``events``-like data is handled with plain date functions).

Scale notes:

- tumbling windows use the built-in ``F.window`` bucketing — a plain hash
  aggregation, map-side combinable, no row explosion;
- sessionisation is one hash-partition exchange on the key plus an
  in-partition sort (lag + running sum) — the canonical distributed
  sessionize;
- the as-of join is implemented as union + single co-partitioned sort +
  ``last(ignorenulls)`` window — ONE shuffle, no range-join row explosion,
  the right plan shape at 100 TB (a key-equi join + per-row top-1 would
  explode on hot keys);
- the interval join is a key-equi join with a range predicate, letting
  AQE/broadcast pick the physical strategy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "trailing_window_agg",
    "sessionize",
    "as_of_join",
    "interval_join",
    "densify_timeline",
    "densify_timeline_calendar",
    "transition_counts",
    "time_decayed_agg",
    "daily_count_anomalies",
    "rfm_scores",
    "type_cooccurrence_pmi",
    "dedup_events_in_window",
    "top_types_per_window",
    "active_user_stats",
    "attribute_conversions",
    "top_session_paths",
]


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate into fixed tumbling windows of ``duration`` (e.g. '1 hour').

    Output columns: ``window_start``, ``window_end``, the group keys, and
    the supplied aggregates (default: ``count(*) as n_events``).
    """
    aggs = aggs or [F.count("*").alias("n_events")]
    group_by = group_by or []
    win = F.window(F.col(ts_col), duration)
    agged = df.groupBy(win.alias("_w"), *group_by).agg(*aggs)
    return (
        agged.withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key (new session when the time since
    the previous event exceeds ``gap_seconds``). Adds ``session_col`` as a
    per-key 1-based session index; deterministic given unique (key, ts).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_micros = int(gap_seconds) * 1_000_000
    prev_ts = F.lag(F.unix_micros(F.col(ts_col)), 1).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_ts) > gap_micros),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Per-session summary: start/end timestamps and event count."""
    with_sessions = sessionize(df, key_col, ts_col, gap_seconds)
    return with_sessions.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row at or before its
    timestamp (``direction='backward'``; ``'forward'`` = earliest at/after).

    ``tolerance_seconds`` bounds how stale the match may be (pandas
    ``merge_asof(tolerance=...)``): a matched right row further than the
    tolerance from the left timestamp comes back as nulls, exactly as if
    no right row existed. Boundary is inclusive.

    Implementation (single-shuffle, no row explosion): union the two sides
    tagged, sort within each key partition by (ts, right-first), and carry
    the right values forward with ``last(..., ignorenulls=True)`` — each
    left row then holds the right row that was current as of its timestamp.
    Equivalent to DuckDB's ``ASOF JOIN``. Right columns come back
    null-filled when no right row precedes the left row.
    """
    assert direction in ("backward", "forward")
    lcols = left.columns
    carry_cols = list(right_value_cols)
    if tolerance_seconds is not None:
        # carry the matched right timestamp too, so staleness is checkable
        carry_cols.append("_asof_rts")
        right = right.withColumn("_asof_rts", F.col(right_ts))
    tagged_left = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in carry_cols],
    )
    tagged_right = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rv_{c}") for c in carry_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        # right rows sort before left rows at equal ts => "at or before"
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_carried_{c}")
            for c in carry_cols
        ],
    )
    out_vals: list = []
    for c in right_value_cols:
        col = F.col(f"_carried_{c}")
        if tolerance_seconds is not None:
            lag = F.unix_micros(F.col("_ts")) - F.unix_micros(
                F.col("_carried__asof_rts")
            )
            if direction == "forward":
                lag = -lag
            col = F.when(lag <= tolerance_seconds * 1_000_000, col)
        out_vals.append(col.alias(c))
    return carried.filter(F.col("_is_left") == 1).select(
        *[F.col(c) for c in lcols], *out_vals
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    right_ts: str,
    time_bin_seconds: int | None = None,
) -> DataFrame:
    """Pair each left interval with every right event of the same key whose
    timestamp falls in [start, end] (inclusive).

    Default: key-equi join + range predicate; AQE/broadcast pick the
    physical join. Correct at any scale when keys are selective, but the
    join co-groups on the KEY alone — one hot key puts its whole history
    into one task regardless of time.

    ``time_bin_seconds`` switches to the **binned range join** (the
    standard OSS answer to Spark's missing range-join optimization): each
    interval explodes to its covered coarse time bins, each right event
    maps to exactly ONE bin, and the join runs on (key, bin) + the exact
    range filter. Hot keys now spread over time bins; fanout per interval
    is span/bin + 1 (bounded — pick a bin close to the typical interval
    span). A right event's single bin means no post-join dedup is needed.
    """
    lk = left.alias("l")
    rk = right.alias("r")
    range_pred = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{start_col}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{end_col}"))
    )
    if time_bin_seconds is None:
        cond = (F.col(f"l.{key_col}") == F.col(f"r.{key_col}")) & range_pred
        return lk.join(rk, cond, "inner").select(
            *[F.col(f"l.{c}") for c in left.columns],
            *[F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}") for c in right.columns],
        )
    if time_bin_seconds <= 0:
        raise ValueError("time_bin_seconds must be positive")
    bin_us = int(time_bin_seconds) * 1_000_000
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / bin_us),
                F.floor(F.unix_micros(F.col(end_col)) / bin_us),
            )
        ),
    ).alias("l")
    rb = right.withColumn(
        "_bin", F.floor(F.unix_micros(F.col(right_ts)) / bin_us)
    ).alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col("l._bin") == F.col("r._bin"))
        & range_pred
    )
    return lb.join(rb, cond, "inner").select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}") for c in right.columns],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate into overlapping sliding windows (``duration`` long, every
    ``slide``). Each event lands in ``ceil(duration/slide)`` windows —
    Spark's ``F.window`` expands rows before the hash aggregation, so the
    fanout is bounded and map-side combinable (no self-join).

    Output columns: ``window_start``, ``window_end``, group keys, aggregates.
    """
    aggs = aggs or [F.count("*").alias("n_events")]
    group_by = group_by or []
    win = F.window(F.col(ts_col), duration, slide)
    agged = df.groupBy(win.alias("_w"), *group_by).agg(*aggs)
    return (
        agged.withColumn("window_start", F.col("_w.start"))
        .withColumn("window_end", F.col("_w.end"))
        .drop("_w")
    )


def trailing_window_agg(
    df: DataFrame,
    ts_col: str,
    lookback: str,
    partition_by: list[str],
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-row trailing aggregates over a time-range frame: for every event,
    aggregate all of the same key's events in ``(ts - lookback, ts]`` —
    the rolling-feature primitive ("spend in the last 24 hours", "events in
    the trailing week") behind most event-level ML features.

    ``lookback`` is an interval string like ``'24 hours'``/``'7 days'``.
    ``aggs`` maps output column name -> aggregate Column (default
    ``{"n_trailing": F.count("*")}``); each is applied over a
    ``rangeBetween`` frame on the event-time microseconds, so rows with
    equal timestamps share a frame (RANGE, not ROWS, semantics).

    One hash-partition exchange on ``partition_by`` + per-partition sort —
    the same shuffle shape as any keyed window; no self-join, no fanout.
    At 100 TB the frame computation is streaming within each sorted
    partition (Spark's bounded-preceding range frames advance two pointers,
    never re-scanning).
    """
    aggs = aggs or {"n_trailing": F.count("*")}
    micros = F.unix_micros(F.col(ts_col))
    # parse "<n> <unit>" into microseconds; the frame is the half-open
    # interval (ts - lookback, ts] on integer microseconds
    qty_str, unit = lookback.split(None, 1)
    qty = float(qty_str)
    unit_us = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
        "week": 604_800_000_000, "weeks": 604_800_000_000,
    }
    if unit.strip() not in unit_us:
        raise ValueError(
            f"Unsupported lookback unit '{unit}'; use seconds/minutes/"
            f"hours/days/weeks"
        )
    span = int(round(qty * unit_us[unit.strip()]))
    if span <= 0:
        raise ValueError(f"lookback must be positive (got {lookback!r})")
    out = df.withColumn("_ts_us", micros)
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.col("_ts_us").asc())
        .rangeBetween(-(span - 1), 0)
    )
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out.drop("_ts_us")


def densify_timeline(
    df: DataFrame,
    key_cols,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    count_col: str = "n_events",
):
    """Gap-filled per-key timeline: one row per (key, bucket) across each
    key's full [first event, last event] span, with ``count_col`` = 0 for
    buckets where nothing happened.

    Rate/cadence analysis over sparse event data needs the zeros — a
    groupBy alone silently omits empty buckets, which biases averages and
    breaks lag/window arithmetic.

    Plan shape: one bucket projection (integer epoch floor — codegen) ->
    per-key span aggregate (rows = #keys) -> ``sequence()`` explode
    generates the dense bucket axis executor-side (rows ~ span/bucket per
    key, data-proportional, never a driver loop or cross join) -> left
    join of the per-bucket counts on (key, bucket), co-partitioned.
    ``bucket_seconds`` must evenly divide the bucket arithmetic both ways
    (integer epoch math — exact at any scale).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds).cast("long")
        * bucket_seconds
    )
    bucketed = df.select(*key_cols, bucket.alias("bucket"))
    counts = bucketed.groupBy(*key_cols, "bucket").agg(
        F.count("*").alias(count_col)
    )
    spans = bucketed.groupBy(*key_cols).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    axis = spans.select(
        *key_cols,
        F.explode(
            F.expr(f"sequence(_b0, _b1, interval {int(bucket_seconds)} seconds)")
        ).alias("bucket"),
    )
    return axis.join(counts, on=[*key_cols, "bucket"], how="left").select(
        *key_cols,
        "bucket",
        F.coalesce(F.col(count_col), F.lit(0)).alias(count_col),
    )


#: unit -> sequence step for :func:`densify_timeline_calendar`.
_CALENDAR_UNITS = {
    "day": "interval 1 day",
    "week": "interval 1 week",
    "month": "interval 1 month",
    "quarter": "interval 3 month",
    "year": "interval 1 year",
}


def densify_timeline_calendar(
    df: DataFrame,
    key_cols,
    ts_col: str = "ts",
    unit: str = "month",
    count_col: str = "n_events",
):
    """Gap-filled per-key timeline on CALENDAR buckets (day / week /
    month / quarter / year) — the variant :func:`densify_timeline` cannot
    express, because calendar units are irregular (months are 28-31 days,
    weeks cross month boundaries, DST shifts day lengths): buckets come
    from ``date_trunc`` and the dense axis advances by calendar interval
    arithmetic, not fixed seconds. Weeks are ISO Monday-start (the
    ``date_trunc('week')`` convention Spark and DuckDB share).

    Same contract and plan shape as :func:`densify_timeline`: one
    ``date_trunc`` projection -> per-key span aggregate -> ``sequence()``
    explode generates the bucket axis executor-side (data-proportional,
    no driver loop) -> left join of per-bucket counts on (key, bucket),
    co-partitioned; ``count_col`` = 0 where nothing happened.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    step = _CALENDAR_UNITS.get(unit)
    if step is None:
        raise ValueError(
            f"unit must be one of {sorted(_CALENDAR_UNITS)} (got {unit!r})"
        )
    bucket = F.date_trunc(unit if unit != "quarter" else "quarter", F.col(ts_col))
    bucketed = df.select(*key_cols, bucket.alias("bucket"))
    counts = bucketed.groupBy(*key_cols, "bucket").agg(
        F.count("*").alias(count_col)
    )
    spans = bucketed.groupBy(*key_cols).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    axis = spans.select(
        *key_cols,
        F.explode(F.expr(f"sequence(_b0, _b1, {step})")).alias("bucket"),
    )
    return axis.join(counts, on=[*key_cols, "bucket"], how="left").select(
        *key_cols,
        "bucket",
        F.coalesce(F.col(count_col), F.lit(0)).alias(count_col),
    )


def transition_counts(
    df: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition counts: how often ``type_col`` value A
    is immediately followed by value B within the same ``key_col`` stream,
    ordered by event time (``tie_col`` breaks equal timestamps
    deterministically).

    The behavioural-sequence feature every session-modelling / funnel
    pipeline derives. Plan shape: ONE shuffle (window partitioned by key)
    for the ``lead`` pairing, then a map-side-combinable count keyed by
    (from, to) — the second exchange carries at most |types|^2 rows, a
    constant independent of data size. No self-join: pairing adjacent
    rows via ``lead`` touches each row once, where the naive
    join-on-rank doubles the shuffle.
    """
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(F.col(type_col)).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def time_decayed_agg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: float = 30.0,
    round_digits: int = 6,
) -> DataFrame:
    """Per-key exponentially time-decayed sum and count: each row weighs
    ``exp(-ln2 * age_days / half_life_days)`` where age is measured from
    the GLOBAL max timestamp (recency-weighted activity — the classic
    engagement / freshness feature).

    Two-phase plan: a scalar aggregate finds the reference instant (one
    row, attached by 1-row-broadcast crossJoin — the same pattern as
    winsorize bounds), then ONE map-side-combinable groupBy computes the
    decayed sums. Weights are pure codegen arithmetic; nothing wider
    than (key, two doubles) crosses the exchange, at any data size.
    """
    if half_life_days <= 0:
        raise ValueError(
            f"half_life_days must be > 0 (got {half_life_days})"
        )
    ref = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("_ref_us"))
    lam = math.log(2.0) / float(half_life_days)
    age_days = (F.col("_ref_us") - F.unix_micros(F.col(ts_col))) / F.lit(
        86400e6
    )
    weight = F.exp(-F.lit(lam) * age_days)
    return (
        df.crossJoin(F.broadcast(ref))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(weight), round_digits).alias("decayed_count"),
            F.round(
                F.sum(weight * F.col(value_col)), round_digits
            ).alias("decayed_value"),
        )
    )


def daily_count_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Flag per-key days whose event count deviates from that key's own
    daily baseline by ``|z| >= z_threshold`` (sample stddev) — the
    volume-anomaly sweep an ops pipeline runs over activity streams.

    Plan shape: ONE map-side-combinable groupBy to (key, day) counts —
    the corpus collapses to at most keys*days rows here — then a per-key
    window for mean/stddev over that collapsed frame. Keys whose count
    never varies (stddev 0 -> NULL z) are not flagged. The comparison is
    applied to the ROUNDED z-score so an oracle rounding identically
    agrees at the threshold boundary.
    """
    daily = (
        df.select(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
        )
        .groupBy(key_col, "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy(key_col)
    z = (F.col("n_events") - F.avg("n_events").over(w)) / F.nullif(
        F.stddev("n_events").over(w), F.lit(0.0)
    )
    return (
        daily.withColumn("z", F.round(z, round_digits))
        .filter(F.abs(F.col("z")) >= z_threshold)
        .select(key_col, "day", "n_events", "z")
    )


def rfm_scores(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """RFM segmentation: per key, recency (days since last event,
    anchored at the global max timestamp), frequency (event count) and
    monetary (value sum), each scored into ``n_tiles`` equal-frequency
    tiles (0 = lowest value of the dimension; note recency LOW means
    RECENT, so r_score 0 is the most recently active tile).

    Plan shape: the corpus collapses to one row per key in ONE
    map-side-combinable aggregate; the three tile assignments reuse
    :func:`~hds_functions_spark.functions.layout.bucket_by_quantiles`
    (exact-percentile cuts + broadcast attach — no global sort, no
    one-partition window, unlike the textbook ntile() spelling).
    Metrics are rounded BEFORE scoring so an oracle rounding identically
    places boundary keys in the same tile.
    """
    ref = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("_ref_us"))
    per_key = (
        df.crossJoin(F.broadcast(ref))
        .groupBy(key_col)
        .agg(
            F.round(
                (F.min("_ref_us") - F.max(F.unix_micros(F.col(ts_col))))
                / F.lit(86400e6),
                round_digits,
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(value_col), round_digits).alias("monetary"),
        )
    )
    # ONE aggregate computes all three cut arrays (a per-dimension
    # bucket_by_quantiles chain would re-evaluate the upstream once per
    # dimension — measured 8x at 16x scale before this was fused)
    fracs = [i / n_tiles for i in range(1, n_tiles)]
    dims = (
        ("recency_days", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    )
    cuts = per_key.agg(
        *[
            F.transform(
                F.percentile(F.col(c), F.lit(fracs)),
                lambda x: F.round(x, round_digits),
            ).alias(f"_cuts_{c}")
            for c, _ in dims
        ]
    )
    out = per_key.crossJoin(F.broadcast(cuts))
    for c, score in dims:
        # NULL metric (e.g. all-NULL values -> NULL monetary) scores NULL,
        # not tile 0 — same guard as layout.bucket_by_quantiles
        out = out.withColumn(
            score,
            F.when(
                F.col(c).isNotNull(),
                F.size(F.filter(F.col(f"_cuts_{c}"), lambda v: v <= F.col(c))),
            ).cast("int"),
        )
    return out.drop(*[f"_cuts_{c}" for c, _ in dims])


def type_cooccurrence_pmi(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_seconds: int = 1800,
    round_digits: int = 6,
) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in
    the same session: ``pmi = ln(n_ab * N / (n_a * n_b))`` over session
    presence — the association signal behind market-basket / next-action
    analyses. Output ``(type_a, type_b, n_ab, pmi)`` with type_a <
    type_b.

    Plan shape: sessionise (one key shuffle), collapse to DISTINCT
    (session, type) — the frame is bounded by sessions * |types| — then
    a self-join on the session key whose fanout is at most |types|^2
    per session; marginals and the session total are tiny aggregates
    broadcast back. No stage touches raw events twice.
    """
    s = sessionize(df, key_col, ts_col, gap_seconds)
    st = s.select(
        F.col(key_col).alias("_k"),
        F.col("session_id").alias("_s"),
        F.col(type_col).alias("_t"),
    ).distinct()
    n_sessions = st.select("_k", "_s").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    marg = st.groupBy("_t").agg(F.count(F.lit(1)).alias("_m"))
    a = st.select("_k", "_s", F.col("_t").alias("type_a"))
    b = st.select("_k", "_s", F.col("_t").alias("type_b"))
    pairs = (
        a.join(b, on=["_k", "_s"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ma = marg.select(F.col("_t").alias("type_a"), F.col("_m").alias("_ma"))
    mb = marg.select(F.col("_t").alias("type_b"), F.col("_m").alias("_mb"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * F.col("_n")
                    / (F.col("_ma") * F.col("_mb"))
                ),
                round_digits,
            ).alias("pmi"),
        )
    )


def dedup_events_in_window(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    window_seconds: int = 300,
    tie_col: str | None = "event_id",
) -> DataFrame:
    """Telemetry deduplication: keep only the FIRST event per key
    combination within each fixed time window (the batch mirror of
    streaming dedup-within-watermark; collapses retry storms and
    double-fires). Window = integer epoch floor, so bucket boundaries
    are engine-independent.

    Rank-then-filter per (keys, bucket) — Catalyst rewrites it to
    WindowGroupLimit, so each shuffle partition pre-prunes to one row
    per group before the exchange.
    """
    if not isinstance(window_seconds, int) or isinstance(window_seconds, bool) \
            or window_seconds < 1:
        raise ValueError(
            f"window_seconds must be an integer >= 1 (got {window_seconds})"
        )
    bucket = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(window_seconds * 1_000_000)
    )
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*key_cols, "_bucket").orderBy(*order)
    return (
        df.withColumn("_bucket", bucket)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_bucket", "_rn")
    )


def top_types_per_window(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    duration: str = "1 hour",
    top_n: int = 1,
) -> DataFrame:
    """Most frequent ``type_col`` value(s) per tumbling window — the
    'what dominated each hour' operational rollup. Counts collapse per
    (window, type) map-side first; the per-window rank runs over at
    most |types| rows per window (ties break by type ascending).
    Output: ``window_start, window_end, {type_col}, n_events``.
    """
    win = F.window(F.col(ts_col), duration)
    counts = df.groupBy(win.alias("_w"), F.col(type_col)).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("_w").orderBy(
        F.col("n_events").desc(), F.col(type_col)
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_n)
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            type_col,
            "n_events",
        )
    )


def active_user_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Daily/monthly active users and stickiness: per calendar day,
    ``dau``, the enclosing month's ``mau``, and ``stickiness = dau /
    mau`` — the engagement headline metric. Two distinct-count
    aggregates ((day, user) and (month, user) frames, both map-side
    combinable after the per-grain distinct) joined broadcast-side on
    the month (one row per month).
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    month = F.date_trunc("month", F.col(ts_col)).cast("date")
    dau = (
        df.select(day.alias("day"), F.col(key_col))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("dau"))
    )
    mau = (
        df.select(month.alias("_month"), F.col(key_col))
        .distinct()
        .groupBy("_month")
        .agg(F.count(F.lit(1)).alias("mau"))
    )
    return (
        dau.withColumn("_month", F.date_trunc("month", F.col("day")).cast("date"))
        .join(F.broadcast(mau), on="_month")
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), round_digits)
            .alias("stickiness"),
        )
    )


def attribute_conversions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_seconds: int = 86400,
    model: str = "linear",
    round_digits: int = 6,
) -> DataFrame:
    """Marketing-style conversion attribution: credit each conversion
    event to the touch events (``touch_types``) that PRECEDED it within
    ``lookback_seconds`` for the same key, then report credit per touch
    type. Models: ``linear`` (1/n to each of the n touches in the
    window), ``last_touch`` / ``first_touch`` (all credit to the latest
    / earliest touch; ties break on event id). Conversions with no
    in-window touch earn no row (organic — report them via the count
    difference against the conversion total).

    Plan shape: the conversion-touch pairing is the BINNED range-join
    trick (both sides bucket by the lookback span; a conversion probes
    its own and the previous bucket), so the join is equi on (key,
    bucket) with per-row fanout bounded by the window's touch density —
    never a full per-key cross product. The rank models prune via
    WindowGroupLimit; the report is one combinable aggregate.

    Output: ``({type_col}, n_conversions, total_credit)``.
    """
    if model not in ("linear", "last_touch", "first_touch"):
        raise ValueError(
            f"model must be linear|last_touch|first_touch (got {model!r})"
        )
    if lookback_seconds < 1:
        raise ValueError(
            f"lookback_seconds must be >= 1 (got {lookback_seconds})"
        )
    span_us = int(lookback_seconds) * 1_000_000
    conv = df.filter(F.col(type_col) == conversion_type).select(
        F.col(key_col).alias("_k"),
        F.col(event_id_col).alias("_conv_id"),
        F.unix_micros(F.col(ts_col)).alias("_conv_us"),
    )
    touch = df.filter(F.col(type_col).isin(list(touch_types))).select(
        F.col(key_col).alias("_k"),
        F.col(type_col).alias("_touch_type"),
        F.col(event_id_col).alias("_touch_id"),
        F.unix_micros(F.col(ts_col)).alias("_touch_us"),
    )
    cb = conv.withColumn(
        "_bucket",
        F.explode(
            F.array(
                F.floor(F.col("_conv_us") / span_us),
                F.floor(F.col("_conv_us") / span_us) - 1,
            )
        ),
    )
    tb = touch.withColumn("_bucket", F.floor(F.col("_touch_us") / span_us))
    pairs = cb.join(tb, on=["_k", "_bucket"]).filter(
        (F.col("_touch_us") < F.col("_conv_us"))
        & (F.col("_touch_us") >= F.col("_conv_us") - span_us)
    )
    if model == "linear":
        w = Window.partitionBy("_conv_id")
        credited = pairs.withColumn(
            "_credit", F.lit(1.0) / F.count(F.lit(1)).over(w)
        )
    else:
        order = (
            [F.col("_touch_us").desc(), F.col("_touch_id").desc()]
            if model == "last_touch"
            else [F.col("_touch_us").asc(), F.col("_touch_id").asc()]
        )
        w = Window.partitionBy("_conv_id").orderBy(*order)
        credited = (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .withColumn("_credit", F.lit(1.0))
        )
    return credited.groupBy(
        F.col("_touch_type").alias(type_col)
    ).agg(
        F.countDistinct("_conv_id").alias("n_conversions"),
        F.round(F.sum("_credit"), round_digits).alias("total_credit"),
    )


def top_session_paths(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    event_id_col: str = "event_id",
    gap_seconds: int = 1800,
    max_steps: int = 5,
    top_n: int = 10,
) -> DataFrame:
    """Most common user journeys: sessionise, take each session's first
    ``max_steps`` event types in time order (ties on timestamp break by
    event id), join them into a path string, and return the ``top_n``
    paths by session count (ties by path ascending) — the
    product-analytics 'what do users actually do' table.

    Plan shape: one key shuffle for sessionisation, then ONE aggregate
    per (key, session) whose state is capped at ``max_steps`` + the
    in-session prefix (sessions are bounded by the gap rule; the slice
    caps the path regardless); path counting is a combinable groupBy
    and the final top-n is a distributed TakeOrdered, not a global
    sort.

    Output: ``(path, n_sessions)``.
    """
    if max_steps < 1 or top_n < 1:
        raise ValueError(
            f"max_steps and top_n must be >= 1 (got {max_steps}, {top_n})"
        )
    s = sessionize(df, key_col, ts_col, gap_seconds)
    per_session = (
        s.groupBy(key_col, "session_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.unix_micros(F.col(ts_col)).alias("t"),
                                    F.col(event_id_col).alias("e"),
                                    F.col(type_col).alias("y"),
                                )
                            )
                        ),
                        lambda x: x["y"],
                    ),
                    1,
                    max_steps,
                ),
                " > ",
            ).alias("path")
        )
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(top_n)
    )
