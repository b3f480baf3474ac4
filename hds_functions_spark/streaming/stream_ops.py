"""Structured Streaming operators: windowed aggregation, sessionisation,
streaming dedup, and a custom stateful operator.

The reference library is batch-only (SURVEY.md §1.1: no streams, no
watermarks, no stateful ops anywhere in ``src/hds_functions``); this module
is the extension-layer streaming surface, built on Structured Streaming
primitives so the same logical ops run incrementally:

- ``readStream`` file sources with explicit schemas (streaming sources
  cannot infer schemas without an extra scan — we do one batch-schema read);
- event-time **watermarks** to bound state and admit late data;
- ``F.window`` / ``F.session_window`` groupings — identical semantics to the
  batch operators in ``operators/events.py``;
- ``dropDuplicates`` keyed state for exactly-once-per-key emission;
- ``applyInPandasWithState`` for custom per-key state machines (the one
  place Python/Arrow is genuinely required — everything else is JVM-side).

Scale notes (100 TB / unbounded design):

- State stores grow with distinct keys in the watermark horizon; every
  production entry point below takes a ``watermark`` so state is evictable.
  The ``run_*_to_memory`` helpers used by the driver registry run with
  ``Trigger.AvailableNow`` on finite inputs and **complete** output mode
  where needed for deterministic batch parity — documented per function.
- Shuffle partitioning: streaming aggs hash-partition by group key exactly
  like batch; ``spark.sql.shuffle.partitions`` is fixed at first checkpoint,
  so size it for the target cluster before starting the query.
- File sources at scale: prefer ``maxFilesPerTrigger`` to bound micro-batch
  size; with ``availableNow`` Spark drains the backlog in bounded batches.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "stream_score_batches",
    "read_parquet_stream",
    "run_stream_to_memory",
    "run_stream_to_parquet",
    "stream_tumbling_agg",
    "stream_session_agg",
    "stream_distinct_keys",
    "stream_stateful_totals",
    "stream_transitions",
    "stream_histogram_bins",
]


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Parquet file-stream source with the schema taken from a one-off batch
    read (streaming file sources require an explicit schema).

    ``FileStreamSource`` monitors a *directory*; a bare file path is exposed
    through a temp directory of symlinks so read-only inputs work unchanged.
    """
    schema = spark.read.parquet(path).schema
    if os.path.isfile(path):
        src_dir = tempfile.mkdtemp(prefix="hds_stream_src_")
        os.symlink(path, os.path.join(src_dir, os.path.basename(path)))
        # the symlink dir must outlive the (lazily-started) query; reclaim
        # at interpreter exit so looped harness runs don't accumulate dirs
        atexit.register(shutil.rmtree, src_dir, ignore_errors=True)
        path = src_dir
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_stream_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    query_name: str | None = None,
    state_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion with ``Trigger.AvailableNow``
    into an in-memory sink and return the materialised result as a batch
    DataFrame. Test/driver harness only — production sinks are
    ``writeStream.format('parquet'/'kafka'/...)`` with checkpointing.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for this one
    stream start. Streaming state partitioning is a *capacity* decision
    (stores per partition × fixed per-store open/commit cost), not a batch
    parallelism decision: a stream-stream join keeps 4 state stores per
    partition, so inheriting a batch-sized shuffle count pays a large fixed
    cost per micro-batch regardless of data volume. Size it to expected
    state cardinality; Spark pins it in the checkpoint on first start.

    ``checkpoint_dir``: pass a stable path to RESUME a previous run — the
    drain picks up exactly where the last one stopped (offsets + operator
    state recovered), the production incremental pattern. The dir is then
    the caller's to manage. Default (None) uses a fresh temp dir reclaimed
    after the drain.
    """
    name = query_name or f"hds_stream_{uuid.uuid4().hex}"
    own_checkpoint = checkpoint_dir is None
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="hds_stream_ckpt_")
    spark = sdf.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        query = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        if own_checkpoint:
            # the memory sink holds the rows driver-side; a throwaway
            # checkpoint is dead weight once the drain finished
            shutil.rmtree(checkpoint, ignore_errors=True)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if own_checkpoint:
            # backstop for the failure path (keeps the dir for this
            # process's lifetime for post-mortems, reclaims it at exit)
            atexit.register(shutil.rmtree, checkpoint, ignore_errors=True)
    return spark.table(name)


def run_stream_to_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    query_name: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame into a durable parquet sink via
    ``foreachBatch``, supporting checkpoint RESUME — the production
    incremental pattern the in-memory sink cannot provide (Spark's memory
    sink refuses to recover from a checkpoint).

    Each micro-batch's emitted rows are appended; update-mode operators
    (e.g. :func:`stream_stateful_totals`) therefore append one row per key
    per micro-batch it changed in — the latest row per key is the current
    state, earlier rows are the change history (a CDC-style log). Re-invoke
    with the same ``checkpoint_dir`` after new files arrive and only the
    new data is processed, with operator state carried over. Returns the
    sink contents as a batch DataFrame.
    """
    spark = sdf.sparkSession

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    name = query_name or f"hds_stream_{uuid.uuid4().hex}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        query = (
            sdf.writeStream.foreachBatch(_sink)
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # A drained stream can legitimately emit zero micro-batches (resume with
    # no new files, or everything filtered) — then no parquet exists at
    # ``path`` and a bare read raises; return an empty frame of the stream's
    # schema instead.
    has_files = os.path.isdir(path) and any(
        not f.name.startswith(("_", ".")) for f in os.scandir(path)
    )
    if not has_files:
        return spark.createDataFrame([], sdf.schema)
    return spark.read.parquet(path)


def stream_tumbling_agg(
    events: DataFrame,
    ts_col: str,
    duration: str,
    group_by: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Streaming tumbling-window aggregation — the incremental twin of
    ``operators.events.tumbling_window_agg`` (same window bucketing, same
    output columns). With a watermark + append mode, windows emit once the
    watermark passes their end and state is evicted; without a watermark the
    query must run in complete mode (finite inputs only)."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count("*").alias("n_events")]
    grouped = events.groupBy(
        F.window(F.col(ts_col), duration).alias("_window"), *(group_by or [])
    ).agg(*aggs)
    agg_cols = [
        c for c in grouped.columns if c != "_window" and c not in (group_by or [])
    ]
    return grouped.select(
        F.col("_window.start").alias("window_start"),
        F.col("_window.end").alias("window_end"),
        *(group_by or []),
        *agg_cols,
    )


def stream_session_agg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionisation via ``F.session_window`` — merges
    events within ``gap`` of each other per key, exactly the session
    definition of ``operators.events.sessionize``. Emits
    (key, session_start, session_end, n_events) where ``session_end`` is the
    last event timestamp (``session_window.end`` is last event + gap; we
    aggregate ``max(ts)`` instead so batch and streaming results align)."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("_sw"), F.col(key_col)
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(key_col, "session_start", "session_end", "n_events")
    )


def stream_distinct_keys(
    events: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit each distinct key combination once,
    suppressing every later occurrence via keyed state.

    With a watermark, ``dropDuplicatesWithinWatermark`` dedups on the KEYS
    alone (a key recurring at a different event time is still suppressed)
    while letting Spark evict state once the watermark passes an entry's
    admission time — bounded state, same emitted keys as the batch
    ``distinct`` as long as a key's duplicates arrive within the horizon.
    Without a watermark state grows with distinct keys forever — bound it
    in production."""
    if watermark is not None and ts_col is not None:
        events = events.withWatermark(ts_col, watermark)
        return events.dropDuplicatesWithinWatermark(keys).select(*keys)
    return events.select(*keys).dropDuplicates(keys)


_TOTALS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)
_TOTALS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)


def _totals_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    """Per-key running totals — integer cents so accumulation order can
    never change the result (float sums are order-dependent)."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["_cents"].sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
    )


def stream_stateful_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator: per-key running event count and
    value total, maintained in ``applyInPandasWithState`` keyed state and
    re-emitted (update semantics) every micro-batch the key appears in.

    The value is accumulated as integer cents (``round(value*100)``) inside
    the state so results are exactly reproducible regardless of batch
    boundaries or arrival order. This is the template for custom state
    machines the built-in operators can't express (per-entity CDC folding,
    decaying counters, ...): Arrow-batched per key-group, state store
    persisted in the checkpoint, parallelism = hash partitioning on the key.
    """
    prepped = events.select(
        F.col(key_col).alias("user_id"),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right events within ``[left_ts, left_ts +
    window]`` per key — the incremental twin of
    ``operators.events.interval_join``.

    Both sides are watermarked; the time-range condition lets Spark bound
    each side's join state (left rows expire once the watermark passes
    ``left_ts + window``, right rows once no future left row could match).
    Inner matches are emitted as soon as both sides arrive, so an
    AvailableNow drain over finite inputs produces exactly the batch
    answer. At scale this is the canonical CDC-enrichment shape: state is
    hash-partitioned by key and bounded by (watermark + window).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key_col] == rw[key_col])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {window}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key_col])


_TRANS_STATE = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_eid", LongType()),
        StructField("last_type", StringType()),
    ]
)

_TRANS_OUT = StructType(
    [
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
    ]
)


def _transitions_fn(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
):
    """Per-key adjacency emitter: rows within a micro-batch are sorted by
    (event time, event_id); the last event of the previous batch is kept
    in state so pairs bridge batch boundaries."""
    import pandas as pd

    parts = [pdf for pdf in batches]
    pdf = (
        pd.concat(parts).sort_values(["_us", "event_id"])
        if parts
        else pd.DataFrame(columns=["_us", "event_id", "event_type"])
    )
    types = [str(t) for t in pdf["event_type"]]
    if state.exists:
        _lu, _le, last_type = state.get
        types = [last_type] + types
    if len(pdf):
        state.update(
            (
                int(pdf["_us"].iloc[-1]),
                int(pdf["event_id"].iloc[-1]),
                str(pdf["event_type"].iloc[-1]),
            )
        )
    yield pd.DataFrame({"from_type": types[:-1], "to_type": types[1:]})


def stream_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming Markov pair emitter: for each key, emit (from_type,
    to_type) for every adjacent event pair, bridging micro-batch
    boundaries through ``applyInPandasWithState`` keyed state (the last
    seen event per key). Append semantics: each pair is emitted exactly
    once, so a downstream count equals the batch
    :func:`~hds_functions_spark.operators.events.transition_counts`.

    Assumes per-key event-time order ACROSS micro-batches (the standard
    replayed-log contract); order within a batch is free — rows are
    sorted by (time, id) inside the state function. State is one
    (ts, id, type) triple per key — constant per key, hash-partitioned
    like every keyed state store.
    """
    prepped = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(type_col).alias("event_type"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _transitions_fn,
        outputStructType=_TRANS_OUT,
        stateStructType=_TRANS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_histogram_bins(
    events: DataFrame,
    value_col: str,
    bounds: tuple[float, float],
    n_bins: int = 128,
    group_by: list[str] | None = None,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming fixed-range histogram state: per-(group, bin) counts —
    the incremental twin of ``functions.sketches.histogram_quantiles``,
    and the operator that makes its mergeable-by-addition state claim
    LITERAL: every micro-batch's partial bin counts fold into the
    running aggregation state exactly the way partitions fold in batch.
    The bin range is FIXED UP FRONT (a streaming sketch cannot re-derive
    its min/max; fixed bounds are the production histogram contract) and
    out-of-range values clamp into the edge bins.

    Output schema ``(group..., _lo, _w, _bin, _cnt)`` — feed the drained
    state straight into ``quantiles_from_bin_counts`` for the quantile
    read-out; state per group is ``n_bins`` longs at any stream length.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1 (got {n_bins})")
    lo, hi = float(bounds[0]), float(bounds[1])
    if not hi >= lo:
        raise ValueError(f"bounds must satisfy hi >= lo (got {bounds})")
    width = (hi - lo) / n_bins
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    v = F.col(value_col).cast("double")
    bin_col = (
        F.lit(0)
        if width == 0
        else F.least(
            F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(n_bins - 1),
        )
    )
    return (
        events.filter(v.isNotNull())
        .groupBy(*(group_by or []), bin_col.cast("int").alias("_bin"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            *(group_by or []),
            F.lit(lo).alias("_lo"),
            F.lit(width).alias("_w"),
            "_bin",
            "_cnt",
        )
    )


def stream_score_batches(
    sdf: DataFrame,
    score_fn,
    path: str,
    checkpoint_dir: str,
    query_name: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain a stream through a PER-MICRO-BATCH batch transform into a
    durable parquet sink — the production model-scoring recipe: inside
    ``foreachBatch`` the micro-batch is a plain bounded DataFrame, so
    the FULL batch operator library (multi-aggregate scoring, windows,
    broadcast model joins — things the streaming planner refuses)
    applies to each increment, with checkpoint RESUME semantics
    identical to :func:`run_stream_to_parquet`.

    ``score_fn``: ``(batch_df) -> DataFrame`` — must be deterministic
    and per-row (results must not depend on micro-batch boundaries,
    which are an execution detail; a model lookup/score is, a global
    rank is not). Returns the sink contents as a batch DataFrame — an
    all-rows-filtered drain returns an EMPTY frame in score_fn's schema
    (each micro-batch still writes schema-bearing parquet); only a
    zero-micro-batch drain raises, since no schema ever reached the sink.

    EXACTLY-ONCE sink under CHECKPOINTED RESUME: each micro-batch
    writes to its own ``batch-<batch_id>`` subpath with OVERWRITE, so
    a batch replayed after a mid-run failure on checkpoint resume
    replaces its own earlier (possibly partial) output instead of
    appending a duplicate — the idempotent-foreachBatch recipe (a
    blind append sink would be at-least-once). The guarantee holds
    only while batch NUMBERING is stable, i.e. resuming from the same
    checkpoint: a replay after checkpoint LOSS may coalesce the source
    into fewer micro-batches and would leave stale higher-numbered
    ``batch-<id>`` subdirs from the earlier run for the read-back to
    double-count — so a start-from-scratch (no committed offsets under
    ``checkpoint_dir``) first CLEARS existing ``batch-*`` subdirs
    under ``path``. The subpath name deliberately avoids the ``k=v``
    form so the read-back doesn't infer a partition column.
    """
    spark = sdf.sparkSession

    # Fresh start (no committed offsets => batch ids restart at 0 and
    # the run may re-split the source into FEWER micro-batches): stale
    # higher-numbered batch-* subdirs from a previous non-checkpointed
    # run would survive every overwrite and double-count on read-back.
    offsets_dir = os.path.join(checkpoint_dir, "offsets")
    fresh_start = not (
        os.path.isdir(offsets_dir) and any(os.scandir(offsets_dir))
    )
    if fresh_start and os.path.isdir(path):
        for entry in os.scandir(path):
            if entry.is_dir() and entry.name.startswith("batch-"):
                shutil.rmtree(entry.path, ignore_errors=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        score_fn(batch_df).write.mode("overwrite").parquet(
            os.path.join(path, f"batch-{batch_id}")
        )

    name = query_name or f"hds_stream_{uuid.uuid4().hex}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        query = (
            sdf.writeStream.foreachBatch(_sink)
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    has_files = os.path.isdir(path) and any(
        not f.startswith(("_", "."))
        for _root, _dirs, files in os.walk(path)
        for f in files
    )
    if not has_files:
        raise ValueError(
            "stream_score_batches drained zero micro-batches (e.g. a "
            "checkpoint resume with no new files); score_fn's output "
            "schema is unknown — nothing to return"
        )
    return spark.read.option("recursiveFileLookup", "true").parquet(path)
