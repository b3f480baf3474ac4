"""Planted-cluster quality check for the k-means hash-spread init.

Generates a planted-cluster corpus (same generator as
``tools/ann_recall.py --planted``) but assigns ids IN LABEL ORDER — the
adversarial-but-common layout of a real corpus sorted by source/topic,
where "first k rows" all come from the first topic and the old
first-k-ids init collapses every seed into one planted cluster. Fits
k-means with both inits and reports:

- **weighted purity**: sum over fitted clusters of (majority planted
  label count) / n — 1.0 means the fit recovered the planting;
- **distinct seed labels**: how many planted clusters the k init seeds
  actually touch (the mechanism behind the purity gap);
- **mean squared distance** after the final assignment (the Lloyd
  objective).

Exits 1 if the hash-spread init's purity falls below the first-k init's
— the regression gate for the init change.

Usage: python tools/kmeans_init_quality.py [n_points] [n_clusters] [sigma]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from hds_functions_spark.operators.clustering import (  # noqa: E402
    init_seed_key,
    kmeans_assign,
    kmeans_fit,
)
from hds_functions_spark.plans import build_session  # noqa: E402
from tools.ann_recall import planted_embeddings  # noqa: E402


def label_sorted(df):
    """Reassign vec_id so ids increase with label — the topic-sorted
    corpus layout. A one-off test fixture; the window is over the test
    corpus only."""
    from pyspark.sql import Window

    w = Window.orderBy("label", "vec_id")
    return df.withColumn(
        "vec_id", F.row_number().over(w).cast("long") - 1
    )


def first_k_centroids(df, k):
    """The OLD init: vectors of the k lowest ids."""
    rows = df.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    return [[float(x) for x in r["embedding"]] for r in rows]


def seed_labels(df, order_col, k):
    rows = df.orderBy(order_col, "vec_id").limit(k).select("label").collect()
    return len({r["label"] for r in rows})


def evaluate(df, centroids, n):
    assigned = kmeans_assign(df, centroids)
    per = (
        assigned.groupBy("cluster", "label")
        .count()
        .groupBy("cluster")
        .agg(F.max("count").alias("maj"), F.sum("count").alias("tot"))
        .agg(
            F.sum("maj").alias("maj"),
            F.avg(F.col("maj") / F.col("tot")).alias("_"),
        )
        .first()
    )
    msd = assigned.agg(F.avg("dist")).first()[0]
    return per["maj"] / n, msd


def main() -> int:
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sigma = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
    k, n_iter = n_clusters, 3

    spark = build_session(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    df = label_sorted(
        planted_embeddings(spark, n_points, n_clusters, sigma)
    ).persist()
    df.count()

    old_c = first_k_centroids(df, k)
    old_fit = kmeans_fit_from(df, old_c, k, n_iter)
    new_fit = kmeans_fit(df, k=k, n_iter=n_iter, dim=64)

    old_purity, old_msd = evaluate(df, old_fit, n_points)
    new_purity, new_msd = evaluate(df, new_fit, n_points)
    old_seeds = seed_labels(df, "vec_id", k)
    new_seeds = seed_labels(df, init_seed_key("vec_id"), k)

    print(f"planted: n={n_points} clusters={n_clusters} sigma={sigma} "
          f"k={k} iter={n_iter} (ids sorted by label)")
    print(f"{'init':<12} {'seed labels':>11} {'purity':>8} {'mean sqdist':>12}")
    print(f"{'first-k-ids':<12} {old_seeds:>11} {old_purity:>8.3f} "
          f"{old_msd:>12.4f}")
    print(f"{'hash-spread':<12} {new_seeds:>11} {new_purity:>8.3f} "
          f"{new_msd:>12.4f}")

    if new_purity < old_purity:
        print("FAIL: hash-spread purity below first-k init")
        return 1
    print("OK: hash-spread init >= first-k init purity")
    return 0


def kmeans_fit_from(df, centroids, k, n_iter):
    """Lloyd iterations from EXPLICIT start centroids — replicates the
    update loop of ``kmeans_fit`` so the two inits are compared under
    identical iteration counts and rounding."""
    dim = len(centroids[0])
    cents = [list(c) for c in centroids]
    for _ in range(n_iter):
        assigned = kmeans_assign(df, cents, dist_col=None)
        sums = [
            F.sum(F.get(F.col("embedding"), i).cast("double")).alias(f"_s{i}")
            for i in range(dim)
        ]
        stats = (
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("_n"), *sums)
            .collect()
        )
        by_cluster = {r["cluster"]: r for r in stats}
        nxt = []
        for ci in range(k):
            r = by_cluster.get(ci)
            if r is None or r["_n"] == 0:
                nxt.append(cents[ci])
            else:
                n = r["_n"]
                nxt.append([round(r[f"_s{i}"] / n, 6) for i in range(dim)])
        cents = nxt
    return cents


if __name__ == "__main__":
    sys.exit(main())
