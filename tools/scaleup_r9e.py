"""16x scale-up for the round-9 late-wave operators: incremental
novelty, truncation recall, Gopher rules, TPC-H Q1, BPE fertility,
DP counts, MRR audit, streaming HLL, and the data card.

Protocol/caveat as tools/scaleup.py (16x = id-offset replication of
sf0.1). Streaming rows drain the replicated input through the real
AvailableNow micro-batch path.

Usage: python tools/scaleup_r9e.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401  (registers the
    # oracle chain registry_ext -> ext7 in order; a direct ext7 import
    # breaks on cross-part ORACLES references)
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
        "doc_id", "text", "lang", "source"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def widen(df, id_col, times=16):
        mx = df.agg(F.max(id_col)).collect()[0][0]
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn(id_col, F.col(id_col) + F.lit(i * (mx + 1)))
            )
        return out

    docs16 = widen(docs, "doc_id")
    emb16 = widen(emb, "vec_id")
    li16 = li
    for i in range(1, 16):
        li16 = li16.unionByName(li)  # Q1 is scan/agg only; keys unused

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:44s}: {dt:6.1f}s  out_rows={n}")

    from hds_functions_spark.operators.profiling import (
        ngram_novelty_incremental,
    )
    from hds_functions_spark.operators.quality import gopher_rule_audit
    from hds_functions_spark.operators.similarity import (
        cosine_topk,
        truncated_cosine_topk,
    )
    from hds_functions_spark.operators.bpe import bpe_encode_stats
    from hds_functions_spark.operators.privacy import dp_noisy_counts
    from hds_functions_spark.registry_ext7 import (
        _NOV_NGRAM,
        _NOVI_BATCH_MOD,
    )

    for tag, d in (("1x", docs), ("16x", docs16)):
        batch = d.filter(F.col("doc_id") % _NOVI_BATCH_MOD == 0)
        corpus = d.filter(F.col("doc_id") % _NOVI_BATCH_MOD != 0)
        run(f"novelty_incremental {tag}",
            lambda b=batch, c=corpus: ngram_novelty_incremental(
                b.select("doc_id", "text"), c.select("doc_id", "text"),
                ngram=_NOV_NGRAM))
        run(f"gopher_rules {tag}",
            lambda d=d: gopher_rule_audit(d.select("doc_id", "text")))
        run(f"bpe_fertility {tag}",
            lambda d=d: bpe_encode_stats(d, n_merges=5)
            .join(d.select("doc_id", "lang"), on="doc_id")
            .groupBy("lang").agg(
                F.round(F.sum("n_subwords") / F.sum("n_words"), 6)
                .alias("fertility")))

    # truncation recall: fixed query sample, growing corpus
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    for tag, c in (("1x", emb), ("16x", emb16)):
        run(f"trunc8_topk {tag} corpus (fixed queries)",
            lambda c=c: truncated_cosine_topk(c, queries, dims=8, k=5))
        run(f"full_topk {tag} corpus (fixed queries)",
            lambda c=c: cosine_topk(c, queries, k=5))

    for tag, l in (("1x", li), ("16x", li16)):
        run(f"q1_pricing_summary {tag}",
            lambda l=l: l.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
                 .alias("sum_qty_cents"),
                 F.count(F.lit(1)).alias("count_order")))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o16 = orders
    for i in range(1, 16):
        o16 = o16.unionByName(orders)
    for tag, o in (("1x", orders), ("16x", o16)):
        run(f"dp_counts {tag}",
            lambda o=o: dp_noisy_counts(
                o, group_cols=["o_orderpriority"], epsilon=1.0, salt="r9"))


if __name__ == "__main__":
    main()
