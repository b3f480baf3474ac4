"""Recall/cost sweep for the approximate ANN paths.

Measures recall@k of ``lsh_cosine_topk`` (vs ``n_planes``),
``lsh_banded_cosine_topk`` (vs bands x planes) and ``ivf_cosine_topk``
(vs ``n_probe``) against exact ``cosine_topk``, plus the number of
exact-cosine candidate scorings each configuration performs (the cost
that brute force pays in full: n_queries * (corpus-1)).

Two corpora:

- default: the testdata ``embeddings.parquet`` — near-uniform random
  vectors, the locality-method WORST case (neighbours sit at the
  similarity noise floor). Lower-bound recalls.
- ``--planted``: synthetic planted-cluster embeddings — ``n_clusters``
  random unit centroids, each point = normalize(centroid + sigma*noise),
  deterministic seed. This is the regime real embedding corpora live in
  (semantic neighbourhoods), where locality methods are expected to work.

Usage:
    python tools/ann_recall.py [sf_dir] [k]
    python tools/ann_recall.py --planted [k] [n_points] [n_clusters] [sigma]
Prints one aligned table; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from hds_functions_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    hyperplanes,
    ivf_cosine_topk,
    lsh_cosine_topk,
    plane_signature,
)
from hds_functions_spark.plans import build_session  # noqa: E402


def planted_embeddings(spark, n_points=500, n_clusters=20, sigma=0.35, dim=64,
                       seed=42):
    """Synthetic planted-cluster corpus, same schema as embeddings.parquet:
    (vec_id, embedding float[], label = planted cluster id).

    ``sigma`` is the noise-to-signal NORM ratio: noise is drawn from
    N(0, (sigma^2/dim) I) so ||noise|| ~ sigma regardless of dim, giving
    E[cos(point, centroid)] ~ 1/sqrt(1+sigma^2) and same-cluster pair
    cosine ~ 1/(1+sigma^2) (e.g. sigma=0.35 -> ~0.89 — the regime of a
    well-trained sentence-embedding corpus)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((n_clusters, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n_points)
    noise = rng.standard_normal((n_points, dim)) * (sigma / np.sqrt(dim))
    pts = centroids[labels] + noise
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [
        (i, [float(x) for x in pts[i]], int(labels[i]))
        for i in range(n_points)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--planted"]
    planted = "--planted" in sys.argv[1:]
    if planted:
        k = int(args[0]) if len(args) > 0 else 5
        n_points = int(args[1]) if len(args) > 1 else 500
        n_clusters = int(args[2]) if len(args) > 2 else 20
        sigma = float(args[3]) if len(args) > 3 else 0.35
        sf_dir = None
    else:
        sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
        k = int(args[1]) if len(args) > 1 else 5
    # planted mode: 25 -> 20 queries (recall granularity 0.01 at k=5);
    # parquet mode keeps 50 -> 10 queries for comparability with the
    # frozen round-3 table
    query_mod = 25 if planted else 50

    spark = build_session(
        app_name="ann-recall",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if planted:
        print(
            f"planted corpus: n={n_points} clusters={n_clusters} "
            f"sigma={sigma}",
            file=sys.stderr,
        )
        emb = planted_embeddings(
            spark, n_points=n_points, n_clusters=n_clusters, sigma=sigma
        ).cache()
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).cache()
    n_corpus = emb.count()
    n_queries = queries.count()

    exact = (
        cosine_topk(emb, queries, k=k)
        .select("query_id", "vec_id")
        .cache()
    )
    n_exact = exact.count()
    brute_candidates = n_queries * (n_corpus - 1)
    print(
        f"sf_dir={sf_dir} corpus={n_corpus} queries={n_queries} k={k} "
        f"exact rows={n_exact} brute-force scorings={brute_candidates}",
        file=sys.stderr,
    )

    def recall_of(approx) -> float:
        hit = approx.select("query_id", "vec_id").join(
            exact, ["query_id", "vec_id"], "leftsemi"
        ).count()
        return hit / n_exact

    rows = []
    for n_planes in (4, 6, 8, 10, 12):
        planes = hyperplanes(n_planes, 64)
        sig = emb.select(plane_signature(F.col("embedding"), planes).alias("b"))
        qsig = queries.select(
            plane_signature(F.col("embedding"), planes).alias("b")
        )
        # candidate scorings = sum over queries of their bucket size
        cand = (
            qsig.join(
                sig.groupBy("b").agg(F.count("*").alias("n")), on="b", how="left"
            )
            .agg(F.sum("n"))
            .first()[0]
            or 0
        )
        r = recall_of(lsh_cosine_topk(emb, queries, k=k, n_planes=n_planes, dim=64))
        rows.append((f"lsh n_planes={n_planes}", r, cand))

    from hds_functions_spark.operators.similarity import lsh_banded_cosine_topk

    for bands, r in ((2, 4), (4, 3), (4, 4), (8, 3)):
        planes = hyperplanes(bands * r, 64)

        def banded_sig(df):
            sigs = [
                plane_signature(F.col("embedding"), planes[b * r : (b + 1) * r])
                for b in range(bands)
            ]
            return df.select(F.posexplode(F.array(*sigs)).alias("band", "bits"))

        # candidate scorings = unique (query, corpus) pairs sharing any band
        cand = (
            banded_sig(queries)
            .join(
                banded_sig(emb.select("embedding")).groupBy("band", "bits").agg(
                    F.count("*").alias("n")
                ),
                on=["band", "bits"],
                how="left",
            )
            .agg(F.sum("n"))
            .first()[0]
            or 0
        )  # upper bound: pre-dedup band collisions
        approx = lsh_banded_cosine_topk(
            emb, queries, k=k, bands=bands, planes_per_band=r
        )
        rows.append((f"banded B={bands} r={r}", recall_of(approx), int(cand)))

    for n_probe in (1, 2, 4, 8, 16):
        approx = ivf_cosine_topk(
            emb, queries, k=k, n_centroids=16, n_probe=n_probe
        )
        # candidate scorings ~ corpus fraction probed * queries
        cand = round(n_queries * n_corpus * n_probe / 16)
        rows.append((f"ivf n_probe={n_probe}", recall_of(approx), cand))

    # round-5 paths: int8 quantized brute force (memory lever, full
    # candidate set) and JL random-projection prefilter (project to
    # out_dim, take top 4k candidates by projected cosine, exact re-score)
    from hds_functions_spark.operators.similarity import (
        quantized_cosine_topk,
        random_projection,
    )

    rows.append((
        "quantized int8",
        recall_of(quantized_cosine_topk(emb, queries, k=k)),
        brute_candidates,
    ))
    for out_dim in (8, 16):
        proj = random_projection(emb, out_dim=out_dim).select(
            "vec_id", F.col("projected").alias("embedding")
        )
        pq = random_projection(
            queries.select(F.col("query_id").alias("vec_id"), "embedding"),
            out_dim=out_dim,
        ).select(F.col("vec_id").alias("query_id"),
                 F.col("projected").alias("embedding"))
        cands = cosine_topk(proj, pq, k=4 * k).select("query_id", "vec_id")
        # recall of "exact top-k restricted to projected top-4k candidates":
        # the true neighbours the prefilter keeps for exact re-scoring
        hit = exact.join(cands, ["query_id", "vec_id"], "leftsemi").count()
        rows.append((
            f"jl d={out_dim} c=4k",
            hit / n_exact,
            n_queries * n_corpus * out_dim // 64,  # projected-space scorings
        ))

    print(f"{'config':<18} {'recall@'+str(k):>9} {'scorings':>10} {'vs brute':>9}")
    for name, r, cand in rows:
        print(f"{name:<18} {r:>9.3f} {cand:>10} {cand/brute_candidates:>8.1%}")


if __name__ == "__main__":
    main()
