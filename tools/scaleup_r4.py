"""16x scale-up measurement for the round-3 operators: banded-LSH cosine
top-k, corpus-level line dedup, dense global ID assignment. Same protocol
as tools/scaleup.py — run on sf0.1 and a 16x synthetic union (ids offset
so hash buckets stay balanced), time full materialisation (noop write),
paste results into BASELINE.md's 16x table.

Caveat the table must state: the 16x union REPLICATES content, so
corpus-level joins see pathological duplication — banded buckets and
repeated-line groups grow 16x denser than organically-grown data would.
That makes these measurements conservative upper bounds on growth.

Usage: python tools/scaleup_r4.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.operators.cleaning import dedup_lines_across_corpus
    from hds_functions_spark.operators.ids import assign_dense_ids
    from hds_functions_spark.operators.similarity import lsh_banded_cosine_topk
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

    def banded(e):
        queries = e.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return lsh_banded_cosine_topk(
            e, queries, k=5, bands=4, planes_per_band=4
        )

    from hds_functions_spark.operators.profiling import bigram_logprob_scores

    ops = {
        "lsh_banded_topk": (banded, emb, emb16),
        "dedup_lines_corpus": (
            lambda d: dedup_lines_across_corpus(d, max_occurrences=2),
            docs,
            docs16,
        ),
        "assign_dense_ids": (
            lambda d: assign_dense_ids(d, order_by="doc_id"),
            docs,
            docs16,
        ),
        "bigram_logprob": (bigram_logprob_scores, docs, docs16),
    }
    for name, (fn, one, sixteen) in ops.items():
        for label, d in (("1x", one), ("16x", sixteen)):
            t0 = time.time()
            out = fn(d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            print(f"{name:20s} {label:>3s}: {dt:6.1f}s  out_rows={n}")


if __name__ == "__main__":
    main()
