"""16x scale-up for the late round-9 additions: bootstrap CIs,
matrix-free PCA, and label-propagation communities.

Protocol as tools/scaleup.py (16x = id-offset replication of sf0.1).
Replication notes: (a) the bootstrap's aggregate state is
``n_resamples`` rows regardless of input size — the 16x run measures
pure scan/combine throughput; (b) PCA ships dim scalars per pass at
any size, so 16x measures the scan; (c) LPA's per-round state is one
row per node — 16x nodes AND 16x edges.

Usage: python tools/scaleup_r9b.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )

    def widen(df, id_cols, times=16):
        maxes = df.agg(*[F.max(c).alias(c) for c in id_cols]).collect()[0]
        out = df
        for i in range(1, times):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            out = out.unionByName(rep)
        return out

    docs16 = widen(docs, ["doc_id"])
    emb16 = widen(emb, ["vec_id"])

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:34s}: {dt:6.1f}s  out_rows={n}")

    from hds_functions_spark.operators.quality import bootstrap_mean_ci

    for tag, d in (("1x", docs), ("16x", docs16)):
        run(f"bootstrap_ci R=100 {tag}",
            lambda d=d: bootstrap_mean_ci(
                d, "n_chars", "doc_id", n_resamples=100, salt="r9"))

    from hds_functions_spark.operators.similarity import (
        pca_power_components,
        pca_project,
    )

    for tag, d in (("1x", emb), ("16x", emb16)):
        t0 = time.time()
        mu, comps = pca_power_components(d, n_components=2, n_iter=3, dim=64)
        print(f"{'pca_fit ' + tag:34s}: {time.time() - t0:6.1f}s  "
              f"(8 passes, 64 scalars each)")
        run(f"pca_project {tag}", lambda d=d: pca_project(d, mu, comps))

    from hds_functions_spark.operators.graph import label_propagation

    def graph_edges(o, l):
        j = o.join(l, o["o_orderkey"] == l["l_orderkey"])
        e = j.select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        return e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    # 16x the GRAPH, not just the edges: offset order keys (the join
    # key), customer keys and supplier keys per replica, so each
    # replica is a disjoint copy of the co-purchase graph — 16x nodes
    # and 16x edges
    maxo = orders.agg(F.max("o_orderkey")).collect()[0][0]
    o16, li16 = orders, li
    for i in range(1, 16):
        o16 = o16.unionByName(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * (maxo + 1)))
            .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * 1_000_000))
        )
        li16 = li16.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * (maxo + 1)))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * 1_000_000))
        )
    run("lpa n_iter=3 1x",
        lambda: label_propagation(graph_edges(orders, li), n_iter=3))
    run("lpa n_iter=3 16x",
        lambda: label_propagation(graph_edges(o16, li16), n_iter=3))

    spark.stop()


if __name__ == "__main__":
    main()
