"""Similarity-search and event-time operator tests."""

import datetime

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.events import (
    as_of_join,
    interval_join,
    session_stats,
    sessionize,
    tumbling_window_agg,
)
from hds_functions_spark.operators.similarity import (
    cosine_similarity,
    cosine_topk,
    lsh_cosine_topk,
)


def ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def test_cosine_similarity_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 0.0])],
        "a: array<float>, b: array<float>",
    )
    out = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("sim")).collect()
    assert out[0]["sim"] == pytest.approx(1.0)
    assert out[1]["sim"] == pytest.approx(0.0)
    assert out[2]["sim"] == pytest.approx(0.7071067811865475)


def test_cosine_topk(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [1.0, 0.05])],
        "vec_id: long, embedding: array<float>",
    )
    queries = corpus.filter("vec_id = 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(corpus, queries, k=2).collect()
    assert [r["vec_id"] for r in out] == [4, 2]  # nearest first
    assert [r["row_index"] for r in out] == [1, 2]


def test_lsh_topk_subset_of_exact(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(1, 40)],
        "vec_id: long, embedding: array<float>",
    )
    queries = corpus.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    approx = lsh_cosine_topk(corpus, queries, k=3, n_planes=4, dim=3)
    rows = approx.collect()
    assert len(rows) > 0
    # every returned neighbour shares the query's hyperplane bucket, and
    # row_index is a valid 1..k ranking per query
    for qid in {r["query_id"] for r in rows}:
        idx = sorted(r["row_index"] for r in rows if r["query_id"] == qid)
        assert idx == list(range(1, len(idx) + 1))


def test_tumbling_window_agg(spark):
    df = spark.createDataFrame(
        [(1, ts(0)), (2, ts(30)), (3, ts(59)), (4, datetime.datetime(2024, 1, 1, 11, 0))],
        "event_id: long, ts: timestamp",
    )
    out = tumbling_window_agg(df, "ts", "1 hour")
    got = {r["window_start"]: r["n_events"] for r in out.collect()}
    assert got[datetime.datetime(2024, 1, 1, 10, 0)] == 3
    assert got[datetime.datetime(2024, 1, 1, 11, 0)] == 1


def test_sessionize_and_stats(spark):
    df = spark.createDataFrame(
        [
            (100, ts(0)), (100, ts(5)), (100, ts(40)),  # gap 35min -> new session
            (200, ts(10)),
        ],
        "user_id: long, ts: timestamp",
    )
    sess = sessionize(df, "user_id", "ts", gap_seconds=1800)
    got = {(r["user_id"], r["ts"].minute): r["session_id"] for r in sess.collect()}
    assert got[(100, 0)] == 1 and got[(100, 5)] == 1 and got[(100, 40)] == 2
    assert got[(200, 10)] == 1

    stats = session_stats(df, "user_id", "ts", gap_seconds=1800)
    rows = {(r["user_id"], r["session_id"]): r for r in stats.collect()}
    assert rows[(100, 1)]["n_events"] == 2
    assert rows[(100, 2)]["n_events"] == 1


def test_as_of_join_backward(spark):
    quotes = spark.createDataFrame(
        [(1, ts(0), 10.0), (1, ts(10), 11.0), (2, ts(5), 20.0)],
        "key: long, qts: timestamp, price: double",
    )
    trades = spark.createDataFrame(
        [(1, ts(5), "t1"), (1, ts(10), "t2"), (1, ts(15), "t3"), (2, ts(0), "t4")],
        "key: long, tts: timestamp, trade: string",
    )
    out = as_of_join(trades, quotes, "key", "tts", "qts", ["price"])
    got = {r["trade"]: r["price"] for r in out.collect()}
    # t1@10:05 -> quote@10:00; t2@10:10 -> quote@10:10 (equal ts counts);
    # t3@10:15 -> quote@10:10; t4@10:00 -> no quote for key 2 yet -> null
    assert got == {"t1": 10.0, "t2": 11.0, "t3": 11.0, "t4": None}


def test_as_of_join_forward(spark):
    quotes = spark.createDataFrame(
        [(1, ts(10), 11.0)], "key: long, qts: timestamp, price: double"
    )
    trades = spark.createDataFrame(
        [(1, ts(5), "t1"), (1, ts(12), "t2")],
        "key: long, tts: timestamp, trade: string",
    )
    out = as_of_join(trades, quotes, "key", "tts", "qts", ["price"], direction="forward")
    got = {r["trade"]: r["price"] for r in out.collect()}
    assert got == {"t1": 11.0, "t2": None}


def test_interval_join(spark):
    intervals = spark.createDataFrame(
        [(1, ts(0), ts(10), "w1"), (1, ts(20), ts(30), "w2")],
        "key: long, start: timestamp, end: timestamp, label: string",
    )
    events = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(10), "b"), (1, ts(15), "c"), (1, ts(25), "d")],
        "key: long, ts: timestamp, name: string",
    )
    out = interval_join(intervals, events, "key", "start", "end", "ts")
    got = sorted((r["label"], r["name"]) for r in out.collect())
    # boundary inclusive: event at exactly 10:10 joins w1; 10:15 joins nothing
    assert got == [("w1", "a"), ("w1", "b"), ("w2", "d")]


def test_sliding_window_agg(spark):
    from hds_functions_spark.operators.events import sliding_window_agg

    df = spark.createDataFrame(
        [(1, ts(0)), (2, ts(20)), (3, ts(40))], "event_id: long, ts: timestamp"
    )
    out = sliding_window_agg(df, "ts", "1 hour", "30 minutes")
    rows = {
        (r["window_start"].minute + 60 * r["window_start"].hour): r["n_events"]
        for r in out.collect()
    }
    # event at 10:00 -> windows starting 09:30 & 10:00; 10:20 -> same;
    # 10:40 -> 10:00 & 10:30
    assert rows[9 * 60 + 30] == 2   # 09:30-10:30 covers 10:00,10:20
    assert rows[10 * 60] == 3       # 10:00-11:00 covers all three
    assert rows[10 * 60 + 30] == 1  # 10:30-11:30 covers 10:40


def test_as_of_join_forward_nulls_tail(spark):
    from hds_functions_spark.operators.events import as_of_join

    left = spark.createDataFrame(
        [(1, "u", ts(10)), (2, "u", ts(45))], "id: long, k: string, ts: timestamp"
    )
    right = spark.createDataFrame(
        [("u", ts(5), 100.0), ("u", ts(30), 200.0)], "k: string, ts: timestamp, v: double"
    )
    out = {
        r["id"]: r["v"]
        for r in as_of_join(left, right, "k", "ts", "ts", ["v"], direction="forward").collect()
    }
    assert out[1] == 200.0  # next right at/after 10:10 is 10:30
    assert out[2] is None   # nothing at/after 10:45


# --- trailing range-frame window -----------------------------------------

def test_trailing_window_agg(spark):
    import datetime

    from hds_functions_spark.operators.events import trailing_window_agg

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u1", base, 1.0),
        ("u1", base + datetime.timedelta(hours=12), 2.0),
        ("u1", base + datetime.timedelta(hours=30), 4.0),   # 12h one falls in
        ("u2", base + datetime.timedelta(hours=1), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id: string, ts: timestamp, value: double")
    out = trailing_window_agg(
        df, "ts", "24 hours", ["user_id"],
        aggs={"n": F.count("*"), "s": F.sum("value")},
    )
    got = {(r["user_id"], r["ts"].hour + r["ts"].day * 24): (r["n"], r["s"])
           for r in out.collect()}
    assert got[("u1", 24)] == (1, 1.0)          # first event: itself
    assert got[("u1", 36)] == (2, 3.0)          # +12h: both
    assert got[("u1", 54)] == (2, 6.0)          # +30h: 12h event still inside
    assert got[("u2", 25)] == (1, 8.0)


def test_trailing_window_boundary_exclusive(spark):
    """Event exactly lookback older is OUTSIDE the (ts - lookback, ts] frame."""
    import datetime

    from hds_functions_spark.operators.events import trailing_window_agg

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u", base, 1.0), ("u", base + datetime.timedelta(hours=24), 1.0)],
        "user_id: string, ts: timestamp, value: double",
    )
    out = trailing_window_agg(df, "ts", "24 hours", ["user_id"])
    ns = sorted(r["n_trailing"] for r in out.collect())
    assert ns == [1, 1]  # exactly-24h-old event excluded


def test_trailing_window_errors(spark):
    from hds_functions_spark.operators.events import trailing_window_agg

    df = spark.createDataFrame([("u", None)], "user_id: string, ts: timestamp")
    with pytest.raises(ValueError, match="unit"):
        trailing_window_agg(df, "ts", "3 fortnights", ["user_id"])
    with pytest.raises(ValueError, match="positive"):
        trailing_window_agg(df, "ts", "0 hours", ["user_id"])


def test_as_of_join_tolerance(spark):
    import datetime

    from hds_functions_spark.operators.events import as_of_join

    def ts(m):
        return datetime.datetime(2024, 1, 1, 10, m)

    left = spark.createDataFrame(
        [(1, 1, ts(30)), (2, 1, ts(50)), (3, 2, ts(10)), (4, 3, ts(10))],
        "event_id: long, user_id: long, ts: timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(25), 100.0), (2, ts(0), 200.0)],
        "user_id: long, ts: timestamp, v: double",
    )
    out = {
        r["event_id"]: r["v"]
        for r in as_of_join(
            left, right, "user_id", "ts", "ts", ["v"],
            tolerance_seconds=600,
        ).collect()
    }
    assert out[1] == 100.0   # 5 min stale -> kept
    assert out[2] is None    # 25 min stale -> nulled by tolerance
    assert out[3] == 200.0   # exactly 10 min -> boundary is inclusive
    assert out[4] is None    # no match at all


def test_interval_join_binned_equivalence(spark):
    import datetime

    from hds_functions_spark.operators.events import interval_join

    def ts(m, s=0):
        return datetime.datetime(2024, 1, 1, 10, m, s)

    left = spark.createDataFrame(
        [(1, 1, ts(0), ts(30)), (2, 1, ts(40), ts(59)), (3, 2, ts(0), ts(59))],
        "iid: long, k: long, s: timestamp, e: timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(0)), (1, ts(30)), (1, ts(31)), (1, ts(45)), (2, ts(58)), (3, ts(5))],
        "k: long, ts: timestamp",
    )
    plain = interval_join(left, right, "k", "s", "e", "ts")
    binned = interval_join(left, right, "k", "s", "e", "ts",
                           time_bin_seconds=600)
    key = lambda df: sorted((r["iid"], r["ts"]) for r in df.collect())
    assert key(plain) == key(binned)
    # boundary inclusivity preserved: ts(30) is inside [ts(0), ts(30)]
    assert (1, ts(30)) in key(binned)
    with pytest.raises(ValueError, match="positive"):
        interval_join(left, right, "k", "s", "e", "ts", time_bin_seconds=0)


def test_densify_timeline(spark):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.events import densify_timeline

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00"),
            ("a", "2024-01-01 00:50:00"),
            ("a", "2024-01-01 03:05:00"),  # hours 1 and 2 are gaps
            ("b", "2024-01-01 05:00:00"),
        ],
        "k: string, ts_str: string",
    ).select("k", F.col("ts_str").cast("timestamp").alias("ts"))
    out = {
        (r["k"], str(r["bucket"])): r["n_events"]
        for r in densify_timeline(df, "k", bucket_seconds=3600).collect()
    }
    # key a spans 4 hourly buckets: 2 events, gap, gap, 1 event
    assert out[("a", "2024-01-01 00:00:00")] == 2
    assert out[("a", "2024-01-01 01:00:00")] == 0
    assert out[("a", "2024-01-01 02:00:00")] == 0
    assert out[("a", "2024-01-01 03:00:00")] == 1
    # key b is a single-bucket span — no spill into a's range
    assert out[("b", "2024-01-01 05:00:00")] == 1
    assert len(out) == 5

    import pytest

    with pytest.raises(ValueError, match="positive"):
        densify_timeline(df, "k", bucket_seconds=0)


def test_densify_timeline_pre_epoch_floors(spark):
    # negative unix epochs must floor (1960-01-01 00:30 -> 00:00 bucket),
    # not truncate toward zero (-> 01:00) — date_trunc semantics
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.events import densify_timeline

    df = spark.createDataFrame(
        [("a", "1960-01-01 00:30:00"), ("a", "1960-01-01 02:30:00")],
        "k: string, ts_str: string",
    ).select("k", F.col("ts_str").cast("timestamp").alias("ts"))
    out = {
        str(r["bucket"]): r["n_events"]
        for r in densify_timeline(df, "k", bucket_seconds=3600).collect()
    }
    assert out == {
        "1960-01-01 00:00:00": 1,
        "1960-01-01 01:00:00": 0,
        "1960-01-01 02:00:00": 1,
    }


def test_densify_timeline_calendar_months(spark):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.events import densify_timeline_calendar

    df = spark.createDataFrame(
        [
            ("a", "2024-01-15 10:00:00"),
            ("a", "2024-01-20 11:00:00"),
            ("a", "2024-04-02 09:00:00"),  # feb, mar are gaps
            ("b", "2024-02-29 23:59:59"),  # leap-day edge
        ],
        "k: string, ts_str: string",
    ).select("k", F.col("ts_str").cast("timestamp").alias("ts"))
    out = {
        (r["k"], str(r["bucket"])): r["n_events"]
        for r in densify_timeline_calendar(df, "k", unit="month").collect()
    }
    assert out == {
        ("a", "2024-01-01 00:00:00"): 2,
        ("a", "2024-02-01 00:00:00"): 0,
        ("a", "2024-03-01 00:00:00"): 0,
        ("a", "2024-04-01 00:00:00"): 1,
        ("b", "2024-02-01 00:00:00"): 1,
    }

    import pytest

    with pytest.raises(ValueError, match="unit"):
        densify_timeline_calendar(df, "k", unit="fortnight")


def test_densify_timeline_calendar_weeks_iso_monday(spark):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.events import densify_timeline_calendar

    # 2024-01-03 is a Wednesday; its ISO week starts Monday 2024-01-01
    df = spark.createDataFrame(
        [("a", "2024-01-03 12:00:00"), ("a", "2024-01-16 08:00:00")],
        "k: string, ts_str: string",
    ).select("k", F.col("ts_str").cast("timestamp").alias("ts"))
    out = {
        str(r["bucket"]): r["n_events"]
        for r in densify_timeline_calendar(df, "k", unit="week").collect()
    }
    assert out == {
        "2024-01-01 00:00:00": 1,
        "2024-01-08 00:00:00": 0,
        "2024-01-15 00:00:00": 1,
    }


class TestTopSessionPaths:
    def test_paths_and_ranking(self, spark):
        from datetime import datetime

        from hds_functions_spark.operators.events import top_session_paths

        rows = [
            # user 1, one session: view > click > buy
            (1, 1, datetime(2024, 1, 1, 10, 0), "view", 0.0),
            (2, 1, datetime(2024, 1, 1, 10, 1), "click", 0.0),
            (3, 1, datetime(2024, 1, 1, 10, 2), "buy", 0.0),
            # user 2, same journey
            (4, 2, datetime(2024, 1, 1, 11, 0), "view", 0.0),
            (5, 2, datetime(2024, 1, 1, 11, 1), "click", 0.0),
            (6, 2, datetime(2024, 1, 1, 11, 2), "buy", 0.0),
            # user 2, SECOND session (gap > 30 min): view only
            (7, 2, datetime(2024, 1, 1, 15, 0), "view", 0.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, "
                  "event_type string, value double"
        )
        out = [
            (r["path"], r["n_sessions"])
            for r in top_session_paths(df, gap_seconds=1800).collect()
        ]
        assert out[0] == ("view > click > buy", 2)
        assert ("view", 1) in out

    def test_max_steps_truncates_and_ties_break_by_event_id(self, spark):
        from datetime import datetime

        from hds_functions_spark.operators.events import top_session_paths

        ts = datetime(2024, 1, 1, 10, 0)
        rows = [(i, 1, ts, t, 0.0) for i, t in
                enumerate(["a", "b", "c", "d"])]  # same ts: id order rules
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, "
                  "event_type string, value double"
        )
        out = top_session_paths(df, max_steps=3).collect()
        assert out[0]["path"] == "a > b > c"

    def test_validation(self, spark):
        import pytest
        from datetime import datetime

        from hds_functions_spark.operators.events import top_session_paths

        df = spark.createDataFrame(
            [(1, 1, datetime(2024, 1, 1), "a", 0.0)],
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double",
        )
        with pytest.raises(ValueError, match="max_steps"):
            top_session_paths(df, max_steps=0)
