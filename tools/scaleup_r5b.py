"""16x scale-up for the round-5 NEW operators: substring-dup signal
(gram-keyed shuffles), quantized brute-force top-k (broadcast grows with
queries), random projection (pure map), vocabulary build (token-keyed agg
+ dense-id ranking), markup strip (pure map). Protocol/caveat as
tools/scaleup.py.

Usage: python tools/scaleup_r5b.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.operators.cleaning import strip_markup
    from hds_functions_spark.operators.dedup import duplicated_ngram_stats
    from hds_functions_spark.operators.profiling import build_vocabulary
    from hds_functions_spark.operators.similarity import (
        quantized_cosine_topk,
        random_projection,
    )
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
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
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
    emb16 = widen(emb, "vec_id")

    def qknn(e):
        qs = e.filter(F.col("vec_id") % 800 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return quantized_cosine_topk(e, qs, k=5)

    ops = {
        "substring_signal": (
            lambda d: duplicated_ngram_stats(d, ngram=5), docs, docs16),
        "quantized_knn": (qknn, emb, emb16),
        "random_projection": (
            lambda e: random_projection(e, out_dim=8), emb, emb16),
        "vocab_build": (
            lambda d: build_vocabulary(d.select("text"), min_count=5),
            docs, docs16),
        "strip_markup": (strip_markup, docs, docs16),
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
