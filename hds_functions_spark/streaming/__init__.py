"""Structured Streaming extension surface (see ``stream_ops``)."""

from .stream_ops import (
    read_parquet_stream,
    stream_interval_join,
    run_stream_to_memory,
    run_stream_to_parquet,
    stream_distinct_keys,
    stream_histogram_bins,
    stream_session_agg,
    stream_stateful_totals,
    stream_transitions,
    stream_tumbling_agg,
)

__all__ = [
    "read_parquet_stream",
    "stream_interval_join",
    "run_stream_to_memory",
    "run_stream_to_parquet",
    "stream_distinct_keys",
    "stream_histogram_bins",
    "stream_session_agg",
    "stream_stateful_totals",
    "stream_transitions",
    "stream_tumbling_agg",
]
