"""16x scale-up for the round-6 wave-2 operators: BM25 scoring+top-k,
the KMV distinct sketch, PageRank, and the leakage-safe split. Protocol
and replicated-union caveat as tools/scaleup.py.

Usage: python tools/scaleup_r6b.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.functions.sketches import kmv_distinct
    from hds_functions_spark.operators.graph import pagerank
    from hds_functions_spark.operators.retrieval import bm25_topk
    from hds_functions_spark.operators.sampling import leakage_safe_split
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
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
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

    docs16 = widen(docs, ["doc_id"])
    li16 = widen(li, ["l_orderkey"])
    # pagerank edges scale with BOTH sides: replicate orders+lineitem
    # with offset order keys AND offset customers/suppliers (16x nodes)
    orders16 = widen(
        orders.select("o_orderkey", "o_custkey"),
        ["o_orderkey", "o_custkey"],
    )
    li16_pr = widen(
        li.select("l_orderkey", "l_suppkey"), ["l_orderkey", "l_suppkey"]
    )

    def queries_of(d):
        from hds_functions_spark.functions.text import tokens

        return d.filter(F.col("doc_id") % 101 == 0).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(tokens(F.col("text")), 1, 9), " ").alias(
                "query_text"
            ),
        )

    def pr_edges(o, l):
        pairs = (
            o.join(l, o["o_orderkey"] == l["l_orderkey"])
            .select(
                F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
            )
            .distinct()
        )
        return pairs.selectExpr("c AS src", "s AS dst").unionByName(
            pairs.selectExpr("s AS src", "c AS dst")
        )

    def split_of(d):
        # synthetic cluster map: every 10th doc pairs with its successor
        clusters = d.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 < 2,
                F.floor(F.col("doc_id") / 10) * 10,
            ).otherwise(F.col("doc_id")).alias("component"),
        )
        return leakage_safe_split(
            d.select("doc_id"), clusters, "doc_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        )

    ops = {
        "bm25_topk": (
            lambda d: bm25_topk(d, queries_of(d), k=5, term_ngram=2),
            docs, docs16),
        "kmv_sketch": (
            lambda t: kmv_distinct(
                t, "l_partkey", ["l_returnflag", "l_linestatus"], k=256
            ),
            li, li16),
        "pagerank": (
            lambda ol: pagerank(pr_edges(*ol), n_iter=2),
            (orders, li), (orders16, li16_pr)),
        "leak_split": (lambda d: split_of(d), docs, docs16),
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
