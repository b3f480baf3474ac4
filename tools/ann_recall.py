"""Recall/cost sweep for the approximate ANN paths.

Measures recall@k of ``lsh_cosine_topk`` (vs ``n_planes``) and
``ivf_cosine_topk`` (vs ``n_probe``) against exact ``cosine_topk``, plus the
number of exact-cosine candidate scorings each configuration performs (the
cost that brute force pays in full: n_queries * (corpus-1)).

Usage: python tools/ann_recall.py [sf_dir] [k]
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    query_mod = 50

    spark = build_session(
        app_name="ann-recall",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

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

    print(f"{'config':<18} {'recall@'+str(k):>9} {'scorings':>10} {'vs brute':>9}")
    for name, r, cand in rows:
        print(f"{name:<18} {r:>9.3f} {cand:>10} {cand/brute_candidates:>8.1%}")


if __name__ == "__main__":
    main()
