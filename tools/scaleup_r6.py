"""16x scale-up for the round-6 gap list: RFM scoring, perceptual-hash
dup groups, the PNG decode profile, stateful streaming transitions, and
the SCD2 collapse. Protocol/caveat as tools/scaleup.py: the 16x input is
id-offset replication of sf0.1, which keeps per-key densities realistic
for events (16x users) and makes image replicas EXACT duplicates (the
ahash dup-group worst case: every group 16x denser than organic growth).

Usage: python tools/scaleup_r6.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.operators.events import rfm_scores
    from hds_functions_spark.operators.multimodal import (
        ahash_duplicate_groups,
        image_ahash,
        image_content_profile,
        synthesize_media_payloads,
    )
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import normalise_event_ts
    from hds_functions_spark.sources.tables import scd2_collapse

    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    events = normalise_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def widen(df, id_cols, times=16):
        maxes = df.agg(
            *[F.max(c).alias(c) for c in id_cols]
        ).collect()[0]
        out = df
        for i in range(1, times):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            out = out.unionByName(rep)
        return out

    docs16 = widen(docs, ["doc_id"])
    # events widen BOTH ids: 16x users at the same per-user density
    # (organic growth), not 16x-deep user histories
    events16 = widen(events, ["event_id", "user_id"])
    orders16 = widen(orders, ["o_orderkey"])

    def three_versions(base):
        k = F.col("o_orderkey")
        v1 = base.withColumn("version", F.lit(1))
        v2 = (
            base.filter(k % 11 != 0)
            .withColumn(
                "o_totalprice",
                F.when(k % 7 == 0, F.col("o_totalprice") + 1.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .withColumn("version", F.lit(2))
        )
        v3 = base.withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            + F.when(k % 7 == 0, 1.0).otherwise(0.0)
            + F.when(k % 5 == 0, 2.0).otherwise(0.0),
        ).withColumn("version", F.lit(3))
        return v1.unionByName(v2).unionByName(v3)

    ops = {
        "events_rfm": (lambda e: rfm_scores(e), events, events16),
        "ahash_dups": (
            lambda d: ahash_duplicate_groups(
                image_ahash(synthesize_media_payloads(d, "image"))
            ),
            docs, docs16),
        "image_png": (
            lambda d: image_content_profile(
                synthesize_media_payloads(d, "png")
            ),
            docs, docs16),
        "table_scd2": (
            lambda o: scd2_collapse(
                three_versions(o),
                ["o_orderkey"], "version",
                ["o_orderstatus", "o_totalprice"],
            ),
            orders, orders16),
    }
    for name, (fn, one, sixteen) in ops.items():
        for label, d in (("1x", one), ("16x", sixteen)):
            t0 = time.time()
            out = fn(d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            release_operator_caches()
            print(f"{name:16s} {label:>3s}: {dt:6.1f}s  out_rows={n}")

    # streaming transitions: the stream source reads a parquet DIRECTORY,
    # so materialise the 1x and 16x event sets and drain each AvailableNow
    from hds_functions_spark.registry_ext import _STATE_PARTITIONS
    from hds_functions_spark.streaming.stream_ops import (
        read_parquet_stream,
        run_stream_to_memory,
        stream_transitions,
    )

    tmp = tempfile.mkdtemp(prefix="scaleup_r6_stream_")
    try:
        for label, d, parts in (("1x", events, 4), ("16x", events16, 32)):
            path = f"{tmp}/{label}"
            d.repartition(parts).write.parquet(path)
            t0 = time.time()
            pairs = stream_transitions(
                normalise_event_ts(read_parquet_stream(spark, path))
            )
            drained = run_stream_to_memory(
                pairs, output_mode="append",
                state_partitions=_STATE_PARTITIONS,
            )
            n = drained.groupBy("from_type", "to_type").count().count()
            dt = time.time() - t0
            print(f"{'stream_trans':16s} {label:>3s}: {dt:6.1f}s  out_rows={n}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
