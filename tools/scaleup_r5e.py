"""16x scale-up for the round-5 part-4 operators: containment pairs
(shared capped-gram machinery), unpivot (Expand map), l-diversity and
revenue share (combinable aggregates), correlation screen and Zipf fit
(one co-moment aggregate each). Protocol/caveat as tools/scaleup.py.

Usage: python tools/scaleup_r5e.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.operators.dedup import ngram_containment_pairs
    from hds_functions_spark.operators.privacy import l_diversity_violations
    from hds_functions_spark.operators.profiling import (
        build_vocabulary,
        correlation_matrix,
        zipf_fit,
    )
    from hds_functions_spark.operators.wrangling import unpivot_columns
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
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def widen(df, id_col, times=16):
        m = df.agg(F.max(id_col)).collect()[0][0] + 1
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn(id_col, F.col(id_col) + F.lit(i * m))
            )
        return out

    docs16 = widen(docs, "doc_id")
    li16 = widen(li, "l_orderkey")
    cust16 = widen(cust, "c_custkey")

    corr_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ops = {
        "containment": (
            lambda d: ngram_containment_pairs(
                d, ngram=3, min_containment=0.5, max_doc_freq=5
            ),
            docs, docs16),
        "unpivot": (
            lambda t: unpivot_columns(
                t, ["l_orderkey", "l_linenumber"], corr_cols[:3]
            ),
            li, li16),
        "l_diversity": (
            lambda c: l_diversity_violations(
                c.select("c_mktsegment", "c_nationkey",
                         F.floor(F.col("c_acctbal") / 2000).alias("_s")),
                ["c_mktsegment", "c_nationkey"], "_s", l=4,
            ),
            cust, cust16),
        "correlations": (
            lambda t: correlation_matrix(t.select(*corr_cols), corr_cols),
            li, li16),
        "zipf": (
            lambda d: zipf_fit(
                build_vocabulary(d.select("text"), min_count=5)
            ),
            docs, docs16),
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


if __name__ == "__main__":
    main()
