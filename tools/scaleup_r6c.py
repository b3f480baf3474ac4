"""16x scale-up for the round-6 wave-3 operators: HLL registers, fuzzy
linkage and BPE training (both dictionary-sized by design — the 16x
corpus must NOT grow their post-aggregate cost), the compaction planner,
and conversion attribution. Protocol/caveat as tools/scaleup.py.

Usage: python tools/scaleup_r6c.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.functions.layout import plan_compaction
    from hds_functions_spark.operators.bpe import bpe_train_merges
    from hds_functions_spark.operators.events import attribute_conversions
    from hds_functions_spark.functions.sketches import hll_distinct
    from hds_functions_spark.operators.linkage import canonical_name_map
    from hds_functions_spark.plans import build_session

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

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    from hds_functions_spark.registry import normalise_event_ts
    events = normalise_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def widen(df, id_cols, times=16):
        maxes = df.agg(*[F.max(c).alias(c) for c in id_cols]).collect()[0]
        out = df
        for i in range(1, times):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            out = out.unionByName(rep)
        return out

    li16 = widen(li, ["l_orderkey"])
    docs16 = widen(docs, ["doc_id"])
    events16 = widen(events, ["event_id", "user_id"])
    part16 = widen(part, ["p_partkey"])  # same 64-name dictionary, 16x rows
    orders16 = widen(orders, ["o_orderkey"])

    def manifest_of(o):
        return (
            o.select(
                F.date_trunc("month", F.col("o_orderdate"))
                .cast("date").alias("part_month"),
                F.dayofmonth("o_orderdate").cast("long").alias("file_id"),
                F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
            )
            .groupBy("part_month", "file_id")
            .agg(F.sum("c").alias("size_bytes"))
        )

    ops = {
        "hll_sketch": (
            lambda t: hll_distinct(
                t, "l_partkey", ["l_returnflag", "l_linestatus"]
            ),
            li, li16),
        "fuzzy_canon": (
            lambda p: canonical_name_map(p, "p_name", max_distance=2),
            part, part16),
        "compaction": (lambda o: plan_compaction(
            manifest_of(o), target_bytes=256_000_000,
            partition_cols=["part_month"]), orders, orders16),
        "bpe_train": (
            lambda d: bpe_train_merges(d, n_merges=5), docs, docs16),
        "attribution": (
            lambda e: attribute_conversions(e, model="linear"),
            events, events16),
    }
    for name, (fn, one, sixteen) in ops.items():
        for label, d in (("1x", one), ("16x", sixteen)):
            t0 = time.time()
            out = fn(d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            release_operator_caches()
            print(f"{name:12s} {label:>3s}: {dt:6.1f}s  out_rows={n}")


if __name__ == "__main__":
    main()
