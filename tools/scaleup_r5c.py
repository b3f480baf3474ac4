"""16x scale-up for the round-5 part-2 operators: k-means fit+assign
(driver boundary must stay constant), within-cluster semantic-dedup
pairs (quadratic in cluster size — watch the growth exponent), Markov
transitions (one window shuffle), time-decay aggregate (scalar attach +
one groupBy), OOV rate (explode + broadcast vocab join), padding-waste
profile (constant-row aggregate), daily anomalies (collapse-then-window),
degree stats (two counts over pairs), CUBE (Expand x4). Protocol/caveat
as tools/scaleup.py: 16x = replicated union with shifted ids, so
distinct-token/cluster structure does not grow organically.

Usage: python tools/scaleup_r5c.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.functions.text import tokens
    from hds_functions_spark.operators.clustering import (
        cluster_near_pairs,
        kmeans_fit,
    )
    from hds_functions_spark.operators.dedup import degree_distribution
    from hds_functions_spark.operators.events import (
        daily_count_anomalies,
        time_decayed_agg,
        transition_counts,
    )
    from hds_functions_spark.operators.packing import padding_waste_profile
    from hds_functions_spark.operators.profiling import (
        build_vocabulary,
        oov_rate,
    )
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import _t

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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ev = _t(spark, sf_dir, "events")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    def widen(df, id_col, times=16):
        max_id = df.agg(F.max(id_col)).collect()[0][0] + 1
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn(id_col, F.col(id_col) + F.lit(i * max_id))
            )
        return out

    docs16 = widen(docs, "doc_id")
    emb16 = widen(emb, "vec_id")
    ev16 = widen(ev, "event_id")  # same users, 16x the events per user
    orders16 = widen(orders, "o_orderkey")

    def km(e):
        cents = kmeans_fit(e, k=10, n_iter=2, dim=64, round_digits=4)
        # fit is the operator; return a frame for the common noop sink
        return spark.createDataFrame(
            [(i, c[0]) for i, c in enumerate(cents)], "cluster int, c0 double"
        )

    def sd_pairs(e):
        cents = kmeans_fit(e, k=10, n_iter=2, dim=64, round_digits=4)
        return cluster_near_pairs(e, cents, threshold=0.25)

    def oov(d):
        return oov_rate(d, build_vocabulary(d, min_count=5))

    def pad(d):
        lens = d.select(F.size(tokens(F.col("text"))).alias("n"))
        return padding_waste_profile(lens, "n", bucket=64, max_len=512)

    def cube(o):
        rev = F.round(F.col("o_totalprice") * 100).cast("long")
        return (
            o.select("o_orderstatus", "o_orderpriority", rev.alias("_c"))
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("_c").alias("cents"))
        )

    def degree(d):
        # synthetic dense-ish pair list from doc ids (the real MinHash
        # pair generator has its own scale-up row; this isolates the
        # degree aggregation itself)
        pairs = d.select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1).alias("id_b"),
        )
        return degree_distribution(pairs)

    ops = {
        "kmeans_fit": (km, emb, emb16),
        "semantic_pairs": (sd_pairs, emb, emb16),
        "transitions": (transition_counts, ev, ev16),
        "time_decay": (lambda e: time_decayed_agg(e), ev, ev16),
        "oov_rate": (oov, docs, docs16),
        "pad_waste": (pad, docs, docs16),
        "daily_anomaly": (
            lambda e: daily_count_anomalies(e), ev, ev16),
        "degree_stats": (degree, docs, docs16),
        "cube": (cube, orders, orders16),
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
