"""SparkSession factory with scale-oriented defaults for this library.

Centralises the configuration story the reference leaves implicit: AQE on
(runtime partition coalescing + skew-join splitting), sane shuffle
partitioning, Arrow for the few driver<->pandas crossings. In local test
mode callers pass ``master='local[N]'``; on a real cluster the same builder
honours the externally-submitted master/conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["build_session", "DEFAULT_CONF"]

DEFAULT_CONF = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones — load-bearing for the join/agg operators at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-accelerate the deliberate driver-side pandas crossings
    # (config CSV helpers) and any pandas UDFs in the extension layer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic instants: timestamp_ntz -> timestamp casts and
    # epoch/date arithmetic must not depend on the host zone. Runtime-
    # settable, so sessions built elsewhere get it re-pinned at use sites
    # (see registry._load_events).
    "spark.sql.session.timeZone": "UTC",
    # The reference targets Spark 3.5 semantics (ANSI off): date+int
    # arithmetic, permissive casts. Spark 4 defaults ANSI on; pin off for
    # parity with the reference's tested behaviour. NOTE: operators must
    # still be correct under ANSI **on** — the correctness driver runs its
    # own ANSI-on session. Set HDS_SPARK_ANSI=true to run the local suite
    # the way the driver does (see tools/compare_oracle.py / CI).
    "spark.sql.ansi.enabled": "false",
}


def build_session(
    app_name: str = "hds_functions_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the library defaults applied."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    ansi_env = os.environ.get("HDS_SPARK_ANSI")
    if ansi_env:
        conf["spark.sql.ansi.enabled"] = ansi_env
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
