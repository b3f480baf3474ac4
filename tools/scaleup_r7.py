"""16x scale-up for the round-7 additions: winnowing copy detection,
similarity-graph triangles, theta-sketch set ops, histogram quantiles,
and MaxScore-pruned BM25. Protocol/caveat as tools/scaleup.py: 16x =
id-offset replication of sf0.1. Replication caveats that matter here:
replicas are EXACT duplicates, so (a) every winnowing fingerprint's df
16x-es (the hot-fp cap drops shared-boilerplate fingerprints earlier
than organic growth would) and (b) each original doc's LSH dup group
16x-es, so triangle counts grow ~16^3 per group — both are the
adversarial-dense regime, organic growth is far milder.

Usage: python tools/scaleup_r7.py [sf_dir]
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
        "doc_id", "text"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus", "o_totalprice"
    )

    def widen(df, id_cols, times=16):
        maxes = df.agg(
            *[F.max(c).alias(c) for c in id_cols]
        ).collect()[0]
        out = df
        for i in range(1, times):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            out = out.unionByName(rep)
        return out

    docs16 = widen(docs, ["doc_id"])
    li16 = widen(li, ["l_orderkey"])
    orders16 = orders
    for _ in range(4):  # no id column to widen; 16x rows by doubling
        orders16 = orders16.unionByName(orders16)

    from hds_functions_spark.operators.dedup import (
        minhash_pairs as _mh,
        winnowing_fingerprints,
        winnowing_overlap_pairs,
    )
    from hds_functions_spark.operators.graph import triangle_count
    from hds_functions_spark.functions.sketches import (
        histogram_quantiles,
        kmv_pairwise_ops,
    )
    from hds_functions_spark.registry_ext import (
        _MH_BANDS,
        _MH_NUM_HASHES,
        _MH_SHINGLE,
    )
    from hds_functions_spark.registry_ext4 import (
        _HQ_BINS,
        _HQ_PROBS,
        _THETA_K,
        _TRI_MIN_JACCARD,
        _WN_GRAM,
        _WN_MAX_DF,
        _WN_MIN_SHARED,
        _WN_WINDOW,
    )

    def winnow(d):
        return winnowing_overlap_pairs(
            winnowing_fingerprints(
                d, gram_size=_WN_GRAM, window=_WN_WINDOW
            ),
            min_shared=_WN_MIN_SHARED,
            max_doc_freq=_WN_MAX_DF,
        )

    def triangles(d):
        pairs = _mh(
            d.filter(F.length("text") >= _MH_SHINGLE),
            num_hashes=_MH_NUM_HASHES,
            shingle_size=_MH_SHINGLE,
            bands=_MH_BANDS,
        ).filter(F.col("est_jaccard") >= _TRI_MIN_JACCARD)
        return triangle_count(pairs, "id_a", "id_b")

    ops = {
        "dedup_winnowing": (winnow, docs, docs16),
        "graph_triangles": (triangles, docs, docs16),
        "theta_ops": (
            lambda d: kmv_pairwise_ops(
                d, "l_orderkey", "l_returnflag", k=_THETA_K
            ),
            li, li16),
        "hist_quantiles": (
            lambda d: histogram_quantiles(
                d, "o_totalprice", _HQ_PROBS, ["o_orderstatus"],
                n_bins=_HQ_BINS,
            ),
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
            print(f"{name:16s} {label:>3s}: {dt:6.1f}s  out_rows={n}")

    # pruned vs full BM25 at 16x corpus (queries scale with the corpus,
    # as _bm25_inputs derives them from the doc table)
    from hds_functions_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_pruned,
    )
    from hds_functions_spark.registry_ext3 import (
        _BM25_B,
        _BM25_K1,
        _BM25_MAX_DF,
        _BM25_NGRAM,
        _BM25_TOPK,
        _BM25_QUERY_MOD,
        _BM25_QUERY_TOKENS,
    )
    from hds_functions_spark.functions.text import tokens

    for label, d in (("1x", docs), ("16x", docs16)):
        queries = d.filter(
            F.col("doc_id") % _BM25_QUERY_MOD == 0
        ).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(tokens(F.col("text")), 1, _BM25_QUERY_TOKENS), " "
            ).alias("query_text"),
        )
        for variant, fn in (("full", bm25_topk), ("pruned", bm25_topk_pruned)):
            t0 = time.time()
            out = fn(
                d, queries, k=_BM25_TOPK, k1=_BM25_K1, b=_BM25_B,
                max_df_frac=_BM25_MAX_DF, term_ngram=_BM25_NGRAM,
            )
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_operator_caches()
            print(f"{'bm25_' + variant:16s} {label:>3s}: {dt:6.1f}s")


if __name__ == "__main__":
    main()
