"""16x scale-up measurement for the round-4/5 operators: grouped exact
winsorization, char entropy (now zero-shuffle), timeline densification,
referential-orphan audit, key-skew profile, table diff, and the real y4m
video decode. Same protocol as tools/scaleup.py — run each operator on
sf0.1 and a 16x synthetic union (ids offset so hash buckets stay
balanced), time full materialisation (noop write), paste the numbers into
BASELINE.md's round-5 table.

Caveat the table must state: the 16x union REPLICATES content, so
anything grouped by content (entropy distributions, winsorize bounds)
sees each group 16x denser than organically-grown data would — the
measurements are conservative upper bounds on growth.

Usage: python tools/scaleup_r5.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.operators.events import densify_timeline
    from hds_functions_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media_payloads,
    )
    from hds_functions_spark.operators.profiling import (
        char_entropy_scores,
        key_skew_profile,
    )
    from hds_functions_spark.operators.quality import referential_orphans
    from hds_functions_spark.operators.wrangling import winsorize_columns
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.sources.tables import table_diff

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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )

    def widen(df, id_col, times=16):
        max_id = df.agg(F.max(id_col)).collect()[0][0] + 1
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn(id_col, F.col(id_col) + F.lit(i * max_id))
            )
        return out

    docs16 = widen(docs, "doc_id")
    li16 = widen(li, "l_orderkey")
    orders16 = widen(orders, "o_orderkey")
    # events widen on user_id: 16x users keeps per-user spans constant,
    # matching organic growth (more users, not longer histories)
    events16 = widen(events, "user_id")

    def winsorize(frame):
        return winsorize_columns(
            frame, ["l_extendedprice"], 0.05, 0.95, group_by=["l_returnflag"]
        )

    def orphans(frame):
        return referential_orphans(
            {
                "lineitem->orders": (
                    li if frame is orders else li16,
                    ["l_orderkey"],
                    frame.filter(F.col("o_orderkey") % 5 != 0),
                    ["o_orderkey"],
                )
            }
        )

    def diff(frame):
        new = frame.filter(F.col("o_orderkey") % 11 != 0).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        )
        return table_diff(frame, new, ["o_orderkey"])

    def video(frame):
        return sample_video_frames(
            synthesize_media_payloads(frame, kind="y4m"), decoder="real"
        )

    ops = {
        "winsorize_grouped": (winsorize, li, li16),
        "char_entropy": (char_entropy_scores, docs, docs16),
        "densify_timeline": (
            lambda d: densify_timeline(d, "user_id", bucket_seconds=3600),
            events,
            events16,
        ),
        "referential_orphans": (orphans, orders, orders16),
        "key_skew_profile": (
            lambda d: key_skew_profile(d.select("o_custkey"), ["o_custkey"]),
            orders,
            orders16,
        ),
        "table_diff": (diff, orders, orders16),
        "video_decode_real": (video, docs, docs16),
    }
    for name, (fn, one, sixteen) in ops.items():
        for label, d in (("1x", one), ("16x", sixteen)):
            t0 = time.time()
            out = fn(d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            release_operator_caches()
            print(f"{name:20s} {label:>3s}: {dt:6.1f}s  out_rows={n}")


if __name__ == "__main__":
    main()
