"""16x scale-up for the round-5 part-3 operators: SCD2 collapse (key
shuffle over 3x-stacked versions), explicit-values pivot, BPE pair
counting (alphabet-bounded exchange), RFM (collapse + 3 broadcast-cut
scorings), co-occurrence PMI (distinct session-type frame), perceptual
hashing (pure Arrow map), pruning simulation (percentile cuts + 64-row
aggregates), join audit (key-count join). Protocol/caveat as
tools/scaleup.py (replicated union, structure does not grow
organically).

Usage: python tools/scaleup_r5d.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.functions.layout import (
        morton_code,
        pruning_simulation,
        quantize_to_bins,
    )
    from hds_functions_spark.operators.events import (
        rfm_scores,
        type_cooccurrence_pmi,
    )
    from hds_functions_spark.operators.multimodal import (
        image_ahash,
        synthesize_media_payloads,
    )
    from hds_functions_spark.operators.profiling import bpe_pair_counts
    from hds_functions_spark.operators.quality import join_key_audit
    from hds_functions_spark.operators.wrangling import pivot_counts
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import _t
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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ev = _t(spark, sf_dir, "events")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def widen(df, id_col, times=16):
        max_id = df.agg(F.max(id_col)).collect()[0][0] + 1
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn(id_col, F.col(id_col) + F.lit(i * max_id))
            )
        return out

    docs16 = widen(docs, "doc_id")
    ev16 = widen(ev, "event_id")
    orders16 = widen(orders, "o_orderkey")
    cust16 = widen(cust, "c_custkey")

    def scd2(o):
        base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
        v1 = base.withColumn("version", F.lit(1))
        v2 = (
            base.filter(F.col("o_orderkey") % 11 != 0)
            .withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % 7 == 0,
                       F.col("o_totalprice") + 1.0)
                .otherwise(F.col("o_totalprice")),
            )
            .withColumn("version", F.lit(2))
        )
        v3 = base.withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 5 == 0, 2.0).otherwise(0.0),
        ).withColumn("version", F.lit(3))
        return scd2_collapse(
            v1.unionByName(v2).unionByName(v3), ["o_orderkey"],
            "version", ["o_orderstatus", "o_totalprice"],
        )

    def prune(o):
        z = o.select(
            "o_orderkey",
            quantize_to_bins("o_totalprice", 0.0, 600000.0, 8)
                .alias("pa"),
            quantize_to_bins(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86400000000.0),
                9000.0, 11700.0, 8,
            ).alias("pb"),
        ).withColumn("zc", morton_code(F.col("pa"), F.col("pb"), 8))
        return pruning_simulation(
            z, "o_orderkey", "zc", "pa", "pb",
            n_files=64, box=(64, 127, 46, 81),
        )

    types = ["click", "error", "purchase", "signup", "view"]
    ops = {
        "scd2": (scd2, orders, orders16),
        "pivot": (
            lambda e: pivot_counts(e, "user_id", "event_type", types),
            ev, ev16),
        "bpe_pairs": (lambda d: bpe_pair_counts(d), docs, docs16),
        "rfm": (lambda e: rfm_scores(e), ev, ev16),
        "cooccurrence": (lambda e: type_cooccurrence_pmi(e), ev, ev16),
        "ahash": (
            lambda d: image_ahash(synthesize_media_payloads(d, "image")),
            docs, docs16),
        "pruning_sim": (prune, orders, orders16),
        "join_audit": (
            lambda o: join_key_audit(o, cust, "o_custkey", "c_custkey"),
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
            print(f"{name:20s} {label:>3s}: {dt:6.1f}s  out_rows={n}")


if __name__ == "__main__":
    main()
