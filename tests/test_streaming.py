"""Structured Streaming operator tests: each incremental operator's
AvailableNow drain must equal the equivalent batch computation."""

import datetime

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.events import session_stats, tumbling_window_agg
from hds_functions_spark.streaming import (
    read_parquet_stream,
    run_stream_to_memory,
    stream_distinct_keys,
    stream_session_agg,
    stream_stateful_totals,
    stream_tumbling_agg,
)


def ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    rows = [
        (1, ts(0), 10, "click", 1.25),
        (2, ts(5), 10, "click", 2.50),
        (3, ts(50), 10, "purchase", 99.99),
        (4, ts(2), 20, "view", 0.10),
        (5, ts(59), 20, "view", 0.20),
        (6, ts(3), 10, "click", 1.25),
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"
    )
    path = str(tmp_path_factory.mktemp("stream") / "events_parquet")
    df.repartition(1).write.parquet(path)
    return path


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_stream_tumbling_equals_batch(spark, events_path):
    stream = read_parquet_stream(spark, events_path)
    aggs = [
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
    ]
    out = run_stream_to_memory(
        stream_tumbling_agg(stream, "ts", "10 minutes", ["event_type"], aggs, watermark=None),
        output_mode="complete",
    )
    batch = tumbling_window_agg(
        spark.read.parquet(events_path), "ts", "10 minutes",
        group_by=["event_type"], aggs=aggs,
    ).select("window_start", "window_end", "event_type", "n_events", "sum_cents")
    cols = ["window_start", "window_end", "event_type", "n_events", "sum_cents"]
    assert _sorted_rows(out, cols) == _sorted_rows(batch, cols)


def test_stream_sessions_equal_batch(spark, events_path):
    out = run_stream_to_memory(
        stream_session_agg(
            read_parquet_stream(spark, events_path),
            "user_id", "ts", gap="30 minutes", watermark=None,
        ),
        output_mode="complete",
    )
    batch = session_stats(
        spark.read.parquet(events_path), "user_id", "ts", gap_seconds=1800
    ).select("user_id", "session_start", "session_end", "n_events")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _sorted_rows(out, cols) == _sorted_rows(batch, cols)


def test_stream_distinct_keys(spark, events_path):
    out = run_stream_to_memory(
        stream_distinct_keys(
            read_parquet_stream(spark, events_path), ["user_id", "event_type"]
        ),
        output_mode="append",
    )
    assert _sorted_rows(out, ["user_id", "event_type"]) == [
        (10, "click"), (10, "purchase"), (20, "view"),
    ]


def test_stream_distinct_keys_watermarked(spark, events_path):
    """Watermarked path dedups on the KEYS alone (dropDuplicatesWithinWatermark):
    a key recurring at a different event time is still suppressed."""
    out = run_stream_to_memory(
        stream_distinct_keys(
            read_parquet_stream(spark, events_path),
            ["user_id", "event_type"],
            ts_col="ts",
            watermark="2 hours",
        ),
        output_mode="append",
    )
    assert _sorted_rows(out, ["user_id", "event_type"]) == [
        (10, "click"), (10, "purchase"), (20, "view"),
    ]


def test_stream_stateful_totals(spark, events_path):
    out = run_stream_to_memory(
        stream_stateful_totals(read_parquet_stream(spark, events_path)),
        output_mode="update",
    )
    # single micro-batch over one file -> one final row per user
    assert _sorted_rows(out, ["user_id", "n_events", "sum_cents"]) == [
        (10, 4, 125 + 250 + 9999 + 125),
        (20, 2, 10 + 20),
    ]


def test_stream_with_watermark_runs(spark, events_path):
    """Watermarked append-mode windowed agg: late-window rows (within the
    watermark of max event time) are withheld — emitted set is a subset."""
    stream = read_parquet_stream(spark, events_path)
    out = run_stream_to_memory(
        stream_tumbling_agg(
            stream, "ts", "10 minutes", ["event_type"],
            [F.count("*").alias("n_events")], watermark="10 minutes",
        ),
        output_mode="append",
    )
    batch_windows = tumbling_window_agg(
        spark.read.parquet(events_path), "ts", "10 minutes",
        group_by=["event_type"], aggs=[F.count("*").alias("n_events")],
    )
    emitted = {tuple(r) for r in out.collect()}
    allowed = {
        tuple(r)
        for r in batch_windows.select(
            "window_start", "window_end", "event_type", "n_events"
        ).collect()
    }
    assert emitted <= allowed


def test_stream_interval_join_equals_batch(spark, events_path):
    from hds_functions_spark.streaming import stream_interval_join

    stream = read_parquet_stream(spark, events_path)
    left = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    right = stream.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    )
    out = run_stream_to_memory(
        stream_interval_join(
            left, right, "user_id", "l_ts", "r_ts", window="1 hour"
        ),
        output_mode="append",
    )
    batch = spark.read.parquet(events_path)
    bl = batch.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    br = batch.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    expected = bl.join(
        br,
        (bl["user_id"] == br["r_user_id"])
        & (br["r_ts"] >= bl["l_ts"])
        & (br["r_ts"] <= bl["l_ts"] + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "l_ts", "l_id", "r_ts", "r_id")
    cols = ["user_id", "l_ts", "l_id", "r_ts", "r_id"]
    assert _sorted_rows(out.select(*cols), cols) == _sorted_rows(expected, cols)


def test_stream_late_data_dropped(spark, tmp_path):
    """Watermark semantics across micro-batches (maxFilesPerTrigger=1):

    - batch 1 carries window W1's rows plus a 12:00 row that advances the
      watermark past W1's end;
    - batch 2 (any data) lets the engine finalise + evict W1 in append mode;
    - batch 3 delivers a late W1 row: its window state is gone and its event
      time is behind the watermark, so it is dropped — W1 must appear
      exactly once, with the original count, and never resurrect.
    """
    import os

    schema = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"
    files = [
        [(1, ts(0), 10, "click", 1.0), (2, ts(5), 10, "click", 1.0),
         (3, datetime.datetime(2024, 1, 1, 12, 0), 10, "click", 1.0)],
        [(5, datetime.datetime(2024, 1, 1, 12, 1), 10, "click", 1.0)],
        [(4, ts(7), 10, "click", 1.0)],  # late W1 event, state evicted
    ]
    src = tmp_path / "late_src"
    src.mkdir()
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).repartition(1).write.parquet(
            str(src / f"f{i}")
        )
        for f in (src / f"f{i}").glob("*.parquet"):
            os.utime(f, (1_700_000_000 + i * 1000,) * 2)

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "f0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = run_stream_to_memory(
        stream_tumbling_agg(
            stream, "ts", "10 minutes", group_by=None,
            aggs=[F.count("*").alias("n_events")], watermark="10 minutes",
        ),
        output_mode="append",
    )
    w1 = [r for r in out.collect() if r["window_start"] == ts(0).replace(minute=0)]
    assert len(w1) == 1  # emitted exactly once, never resurrected
    assert w1[0]["n_events"] == 2  # late event 4 dropped


def test_stream_checkpoint_resume(spark, tmp_path):
    """Production incremental pattern: a second drain from the SAME
    checkpoint (durable foreachBatch parquet sink — the memory sink cannot
    recover) processes only new files and carries operator state over
    (running totals keep accumulating, not restart from zero)."""
    from hds_functions_spark.streaming import run_stream_to_parquet

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"
    batch1 = spark.createDataFrame(
        [(1, ts(0), 10, "click", 1.0), (2, ts(1), 10, "click", 2.0)], schema
    )
    batch1.repartition(1).write.parquet(str(src / "f1"))

    def drain():
        stream = (
            spark.readStream.schema(batch1.schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(str(src) + "/*")
        )
        return run_stream_to_parquet(
            stream_stateful_totals(stream),
            path=sink,
            checkpoint_dir=ckpt,
            output_mode="update",
        )

    out1 = {r["user_id"]: (r["n_events"], r["sum_cents"])
            for r in drain().collect()}
    assert out1 == {10: (2, 300)}

    batch2 = spark.createDataFrame([(3, ts(2), 10, "click", 5.0)], schema)
    batch2.repartition(1).write.parquet(str(src / "f2"))
    rows = sorted(
        (r["n_events"], r["sum_cents"]) for r in drain().collect()
    )
    # CDC-style log: first drain's row plus the resumed-state row — the
    # resumed drain continued from (2, 300), it did not restart from zero
    assert rows == [(2, 300), (3, 800)]


def test_stream_to_parquet_zero_batches_returns_empty(spark, tmp_path):
    """A drain that emits no micro-batches (all rows watermark-filtered /
    no new files) must return an empty frame of the stream's schema, not
    raise on the absent sink directory (ADVICE r2)."""
    from hds_functions_spark.streaming import run_stream_to_parquet

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id: long, ts: timestamp, user_id: long, event_type: string, value: double"
    empty = spark.createDataFrame([], schema)
    empty.write.parquet(str(src / "f0"))
    stream = spark.readStream.schema(empty.schema).parquet(str(src) + "/*")
    out = run_stream_to_parquet(
        stream_stateful_totals(stream),
        path=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="update",
    )
    assert out.collect() == []
    assert {f.name for f in out.schema} >= {"user_id", "n_events"}


def test_stream_transitions_matches_batch(spark, tmp_path):
    """Stream-batch parity: pairs drained from the stateful emitter and
    counted equal the batch transition_counts on the same data, even
    when the data arrives in MULTIPLE micro-batches (one file each —
    state must bridge the boundary)."""
    from datetime import datetime

    from hds_functions_spark.operators.events import transition_counts
    from hds_functions_spark.streaming.stream_ops import (
        read_parquet_stream,
        run_stream_to_memory,
        stream_transitions,
    )

    rows1 = [
        (1, 10, datetime(2024, 1, 1, 0, 0), "a", 0.0),
        (2, 10, datetime(2024, 1, 1, 0, 1), "b", 0.0),
        (3, 20, datetime(2024, 1, 1, 0, 0), "a", 0.0),
    ]
    rows2 = [
        (4, 10, datetime(2024, 1, 1, 0, 2), "c", 0.0),  # bridges b -> c
        (5, 20, datetime(2024, 1, 1, 0, 5), "a", 0.0),  # bridges a -> a
    ]
    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    import time

    src = str(tmp_path / "events_stream")
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append").parquet(src)
    time.sleep(1.1)  # distinct mtimes: the file source processes in order
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    batch_df = spark.createDataFrame(rows1 + rows2, schema)
    expected = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in transition_counts(batch_df).collect()
    }

    stream = read_parquet_stream(spark, src, max_files_per_trigger=1)
    pairs = run_stream_to_memory(
        stream.transform(stream_transitions), output_mode="append",
        state_partitions=2,
    )
    got = {}
    for r in pairs.collect():
        k = (r["from_type"], r["to_type"])
        got[k] = got.get(k, 0) + 1
    assert got == expected
    assert got[("b", "c")] == 1 and got[("a", "a")] == 1  # cross-batch pairs


def test_stream_histogram_equals_batch(spark, events_path):
    """The streaming fixed-range histogram state, drained and fed to the
    shared quantile read-out, must equal the same fixed-bound histogram
    computed in one batch pass — the mergeable-by-addition state claim
    made literal (micro-batches fold like partitions)."""
    from hds_functions_spark.functions.sketches import (
        quantiles_from_bin_counts,
    )
    from hds_functions_spark.streaming import stream_histogram_bins

    bounds, nb, probs = (0.0, 100.0), 16, [0.5, 0.9]
    sdf = read_parquet_stream(spark, events_path)
    drained = run_stream_to_memory(
        stream_histogram_bins(
            sdf, "value", bounds=bounds, n_bins=nb,
            group_by=["event_type"],
        ),
        output_mode="complete",
        state_partitions=2,
    )
    got = {
        (r["event_type"], r["prob"]): r["estimate"]
        for r in quantiles_from_bin_counts(
            drained, ["event_type"], probs
        ).collect()
    }

    # batch twin: identical binning over the same fixed bounds
    lo, hi = bounds
    w = (hi - lo) / nb
    batch = (
        spark.read.parquet(events_path)
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.least(
                F.greatest(
                    F.floor((F.col("value") - lo) / w), F.lit(0)
                ),
                F.lit(nb - 1),
            ).cast("int").alias("_bin"),
        )
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .select(
            "event_type", F.lit(lo).alias("_lo"), F.lit(w).alias("_w"),
            "_bin", "_cnt",
        )
    )
    expect = {
        (r["event_type"], r["prob"]): r["estimate"]
        for r in quantiles_from_bin_counts(
            batch, ["event_type"], probs
        ).collect()
    }
    assert got == expect
    # value 99.99 lands in the top bin; clamping verified by a value
    # beyond the bounds still counting (synthetic check on the op alone)


def test_stream_histogram_clamps_out_of_range(spark, tmp_path):
    from hds_functions_spark.streaming import stream_histogram_bins

    df = spark.createDataFrame(
        [(1, ts(0), 1, "t", -5.0), (2, ts(1), 1, "t", 500.0)],
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double",
    )
    path = str(tmp_path / "clamp_events")
    df.write.parquet(path)
    drained = run_stream_to_memory(
        stream_histogram_bins(
            read_parquet_stream(spark, path), "value",
            bounds=(0.0, 100.0), n_bins=10,
        ),
        output_mode="complete",
        state_partitions=2,
    )
    rows = {r["_bin"]: r["_cnt"] for r in drained.collect()}
    assert rows == {0: 1, 9: 1}


def test_stream_histogram_validation(spark, events_path):
    from hds_functions_spark.streaming import stream_histogram_bins

    sdf = read_parquet_stream(spark, events_path)
    with pytest.raises(ValueError, match="n_bins"):
        stream_histogram_bins(sdf, "value", bounds=(0, 1), n_bins=0)
    with pytest.raises(ValueError, match="bounds"):
        stream_histogram_bins(sdf, "value", bounds=(5, 1))


def test_stream_score_batches_equals_batch_transform(spark, tmp_path):
    """foreachBatch scoring with a per-row transform equals applying the
    transform to the whole input in one batch, regardless of micro-batch
    boundaries (maxFilesPerTrigger=1 forces several batches)."""
    import os

    from pyspark.sql import functions as F

    from hds_functions_spark.streaming.stream_ops import (
        read_parquet_stream,
        stream_score_batches,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    df = spark.range(0, 30).withColumn("v", F.col("id") * 2)
    # three separate files -> three micro-batches under maxFilesPerTrigger=1
    for i in range(3):
        df.filter(F.col("id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def score(batch_df):
        return batch_df.withColumn("scored", F.col("v") + 1)

    out = stream_score_batches(
        read_parquet_stream(spark, src, max_files_per_trigger=1),
        score,
        path=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        state_partitions=2,
    )
    got = sorted((r["id"], r["scored"]) for r in out.collect())
    assert got == [(i, 2 * i + 1) for i in range(30)]


def test_stream_score_batches_replay_idempotent(spark, tmp_path):
    """The sink writes each micro-batch to its own batch-<id> subpath
    with OVERWRITE, so a replayed batch (checkpoint resume after a
    mid-run failure) replaces its earlier output instead of appending a
    duplicate — simulated here by re-draining against a WIPED
    checkpoint, which replays every batch into the same sink."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from hds_functions_spark.streaming.stream_ops import (
        read_parquet_stream,
        stream_score_batches,
    )

    src = str(tmp_path / "src3")
    os.makedirs(src)
    spark.range(0, 10).write.mode("append").parquet(src)
    sink, ckpt = str(tmp_path / "sink3"), str(tmp_path / "ckpt3")

    def score(b):
        return b.withColumn("s", F.col("id") + 1)

    first = stream_score_batches(
        read_parquet_stream(spark, src), score, path=sink, checkpoint_dir=ckpt
    ).count()
    assert first == 10
    # wipe the checkpoint: the next drain re-processes (replays) every
    # source file — the worst-case at-least-once scenario
    shutil.rmtree(ckpt)
    replay = stream_score_batches(
        read_parquet_stream(spark, src), score, path=sink,
        checkpoint_dir=ckpt,
    )
    assert replay.count() == 10  # a blind append sink would show 20
    # batch-scoped subpaths, never k=v (no phantom partition column)
    subdirs = [d for d in os.listdir(sink) if not d.startswith(("_", "."))]
    assert subdirs and all(d.startswith("batch-") for d in subdirs)
    assert "s" in replay.columns and "batch" not in str(replay.columns)


def test_stream_score_batches_checkpoint_loss_coalesced_replay(
    spark, tmp_path
):
    """Checkpoint LOSS (not resume) restarts batch numbering, and the
    replay may coalesce the source into FEWER micro-batches — the
    earlier run's higher-numbered batch-<id> subdirs would survive
    every overwrite and double-count on read-back. A fresh start (no
    committed offsets) must therefore clear existing batch-* subdirs:
    3 files drained one-per-trigger (batch-0..2), checkpoint wiped,
    re-drained as ONE micro-batch (batch-0 only) -> still 30 rows."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from hds_functions_spark.streaming.stream_ops import (
        read_parquet_stream,
        stream_score_batches,
    )

    src = str(tmp_path / "src4")
    os.makedirs(src)
    df = spark.range(0, 30)
    for i in range(3):
        df.filter(F.col("id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    sink, ckpt = str(tmp_path / "sink4"), str(tmp_path / "ckpt4")

    def score(b):
        return b.withColumn("s", F.col("id") + 1)

    first = stream_score_batches(
        read_parquet_stream(spark, src, max_files_per_trigger=1),
        score, path=sink, checkpoint_dir=ckpt,
    ).count()
    assert first == 30
    assert len([d for d in os.listdir(sink) if d.startswith("batch-")]) == 3
    shutil.rmtree(ckpt)  # checkpoint LOSS: numbering restarts at 0
    replay = stream_score_batches(
        read_parquet_stream(spark, src),  # no trigger cap -> ONE batch
        score, path=sink, checkpoint_dir=ckpt,
    )
    # without the fresh-start clear, stale batch-1/batch-2 double-count
    assert replay.count() == 30
    assert len([d for d in os.listdir(sink) if d.startswith("batch-")]) == 1


def test_stream_score_batches_all_filtered_returns_empty(spark, tmp_path):
    """A drained stream whose every row is filtered still writes a
    schema-bearing (empty) parquet per micro-batch: the helper returns
    an empty frame with the score_fn's schema, not an error."""
    import os

    from pyspark.sql import functions as F

    from hds_functions_spark.streaming.stream_ops import (
        read_parquet_stream,
        stream_score_batches,
    )

    src = str(tmp_path / "src2")
    os.makedirs(src)
    spark.range(0, 5).write.mode("append").parquet(src)

    out = stream_score_batches(
        read_parquet_stream(spark, src).filter(F.col("id") > 100),
        lambda b: b.withColumn("s", F.col("id") + 1),
        path=str(tmp_path / "sink2"),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert out.count() == 0
    assert out.columns == ["id", "s"]
