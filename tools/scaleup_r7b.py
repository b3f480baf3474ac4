"""16x scale-up for the late-round-7 additions: t-closeness, TF-IDF
all-pairs similarity, incremental winnowing. Protocol/caveats as
tools/scaleup_r7.py (16x = id-offset replication of sf0.1; replicas
are exact duplicates — the dense worst case for similarity shapes).

Usage: python tools/scaleup_r7b.py [sf_dir]
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
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus", "o_orderdate", "o_totalprice", "o_orderkey"
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
    orders16 = widen(orders, ["o_orderkey"])

    from hds_functions_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_overlap_incremental,
    )
    from hds_functions_spark.operators.privacy import t_closeness_violations
    from hds_functions_spark.operators.retrieval import tfidf_doc_topk
    from hds_functions_spark.registry_ext4 import (
        _APSS_K,
        _APSS_MAX_DF,
        _TC_BAND,
        _TC_T,
        _WN_GRAM,
        _WN_MAX_DF,
        _WN_MIN_SHARED,
        _WN_WINDOW,
        _WNI_MOD,
    )

    def tclose(o):
        base = o.select(
            "o_orderstatus",
            F.year(F.col("o_orderdate")).alias("yr"),
            F.floor(F.col("o_totalprice") / _TC_BAND).cast("long").alias("s"),
        )
        return t_closeness_violations(
            base, ["o_orderstatus", "yr"], "s", t=_TC_T
        )

    def apss(d):
        return tfidf_doc_topk(
            d, k=_APSS_K, term_ngram=2, max_df_frac=_APSS_MAX_DF
        )

    def wni(d):
        fps = winnowing_fingerprints(
            d, gram_size=_WN_GRAM, window=_WN_WINDOW
        )
        is_new = F.col("doc_id") % _WNI_MOD == 0
        return winnowing_overlap_incremental(
            fps.filter(is_new), fps.filter(~is_new),
            min_shared=_WN_MIN_SHARED, max_doc_freq=_WN_MAX_DF,
        )

    ops = {
        "t_closeness": (tclose, orders, orders16),
        "tfidf_apss": (apss, docs, docs16),
        "winnow_incr": (wni, docs, docs16),
    }
    for name, (fn, one, sixteen) in ops.items():
        for label, d in (("1x", one), ("16x", sixteen)):
            t0 = time.time()
            out = fn(d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            release_operator_caches()
            print(f"{name:14s} {label:>3s}: {dt:6.1f}s  out_rows={n}")


if __name__ == "__main__":
    import __spark_entry__  # noqa: F401  (registry import order)
    main()
