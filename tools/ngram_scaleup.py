"""Hot-gram fanout measurement for ngram_jaccard_pairs (VERDICT r2 #3).

Injects a boilerplate phrase into 20% of sf0.1 documents (a shared trigram
with document frequency in the thousands — the "all rights reserved" case),
then times full materialisation of ngram_jaccard_pairs capped
(max_doc_freq=50) vs uncapped (None) at 1x and 16x. Uncapped, the gram
self-join emits df^2 rows for the hot gram (quadratic in corpus size);
capped, the hot gram is dropped before the join and runtime tracks corpus
size. Paste the numbers into BASELINE.md.

Usage: python tools/ngram_scaleup.py [sf_dir] [--skip-uncapped-16x]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    skip_heavy = "--skip-uncapped-16x" in sys.argv

    from pyspark.sql import functions as F

    from hds_functions_spark.operators.dedup import ngram_jaccard_pairs
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

    boiler = "all rights reserved"
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat_ws(" ", F.lit(boiler), "text")
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    big = docs
    for i in range(1, 16):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"), "text"
            )
        )

    for label, d in (("1x", docs), ("16x", big)):
        for cap in (50, None):
            if skip_heavy and label == "16x" and cap is None:
                print(f"ngram_jaccard {label} cap={cap}: skipped (--skip-uncapped-16x)")
                continue
            t0 = time.time()
            out = ngram_jaccard_pairs(
                d, ngram=3, min_jaccard=0.5, max_doc_freq=cap
            )
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            print(
                f"ngram_jaccard {label:>3s} cap={str(cap):>4s}: "
                f"{dt:7.1f}s  out_pairs={n}"
            )


if __name__ == "__main__":
    main()
