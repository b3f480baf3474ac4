"""16x scale-up measurement for the round-2 operators (decontamination,
chunking, simhash pairs, mixture sampling): run each on sf0.1 documents and
on a 16x synthetic union (ids offset so hash buckets stay balanced), timing
full materialisation (noop write). Appends evidence to the BASELINE.md
scale-up table by hand.

Usage: python tools/scaleup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.operators.contamination import ngram_contamination
    from hds_functions_spark.operators.dedup import simhash_pairs
    from hds_functions_spark.operators.packing import chunk_documents
    from hds_functions_spark.operators.sampling import (
        mixture_sample,
        split_bucket,
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
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    big = docs
    for i in range(1, 16):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"),
                "text",
                "lang",
            )
        )

    def decontam(d):
        b = split_bucket("doc_id", "decontam")
        return ngram_contamination(
            d.filter(b >= 1000).select("doc_id", "text"),
            d.filter(b < 1000).select(
                F.col("doc_id").alias("eval_id"), "text"
            ),
            ngram=4,
            max_eval_df=100,
        )

    ops = {
        "decontam_4gram": decontam,
        "chunk_documents": lambda d: chunk_documents(
            d.select("doc_id", "text"), chunk_tokens=32, overlap=8
        ),
        "simhash_pairs": lambda d: simhash_pairs(
            d.select("doc_id", "text"), bits=32, max_hamming=3, band_bits=8
        ),
        "mixture_sample": lambda d: mixture_sample(
            d.select("doc_id", "lang"),
            "doc_id",
            "lang",
            {"en": 0.5, "de": 0.25, "zh": 0.25},
            salt="mixture",
        ),
    }
    for name, fn in ops.items():
        for label, d in (("1x", docs), ("16x", big)):
            t0 = time.time()
            out = fn(d)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            n = out.count()
            print(f"{name:16s} {label:>3s}: {dt:6.1f}s  out_rows={n}")


if __name__ == "__main__":
    main()
