"""64x FIXED-EVAL scale row: bloom vs exact n-gram decontamination.

The scaleup_r12c row replicates both sides (the protocol's worst
case). This is the PRODUCTION shape: the eval set stays benchmark-
sized (the 1x 10% hash split, ~500 docs at sf0.1) while the corpus
side is replicated 1x/16x/64x — so the bitmap is FIXED and the
numbers isolate what the corpus probe itself costs as the corpus
grows. Expected: the exact join's shuffle grows ~linearly with the
corpus (gram hits crossing the exchange); the bloom pass's shuffle
stays at flagged-doc-count size, and its wall tracks the corpus SCAN
(map-side probe), not any exchange.

Usage: python tools/scaleup_r12d.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def stage_ids(base, app_id):
    return {
        s["stageId"]
        for s in rest(base, f"/api/v1/applications/{app_id}/stages")
    }


def shuffle_mb(base, app_id, new_ids):
    stages = rest(
        base, f"/api/v1/applications/{app_id}/stages?status=complete"
    )
    return (
        sum(
            s.get("shuffleWriteBytes", 0)
            for s in stages
            if s["stageId"] in new_ids
        )
        / 1e6
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.operators.bloom import bloom_decontam
    from hds_functions_spark.operators.contamination import (
        ngram_contamination,
    )
    from hds_functions_spark.operators.sampling import split_bucket
    from hds_functions_spark.plans import build_session

    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bucket = split_bucket("doc_id", "decontam")
    eval_df = docs.filter(bucket < 1000).withColumnRenamed(
        "doc_id", "eval_id"
    )
    base_corpus = docs.filter(bucket >= 1000)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]

    def corpus_at(mult):
        wide = base_corpus
        for i in range(1, mult):
            wide = wide.unionByName(
                base_corpus.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * (max_id + 1))
                )
            )
        # materialise so the measured run reads parquet, not a union plan
        path = f"/tmp/hds_r12d_corpus_{mult}x.parquet"
        wide.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def run(label, frame_fn):
        before = stage_ids(ui, app_id)
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        mb = shuffle_mb(ui, app_id, stage_ids(ui, app_id) - before)
        release_operator_caches()
        print(
            f"{label:28s}: {dt:6.1f}s  out_rows={n:>8}  "
            f"shuffle_write={mb:8.2f} MB",
            flush=True,
        )

    import shutil

    for mult in (1, 16, 64):
        corpus = corpus_at(mult)
        run(
            f"bloom {mult}x (fixed eval)",
            lambda: bloom_decontam(corpus, eval_df, ngram=4),
        )
        run(
            f"exact {mult}x (fixed eval)",
            lambda: ngram_contamination(
                corpus, eval_df, ngram=4, max_eval_df=100
            ),
        )
        shutil.rmtree(f"/tmp/hds_r12d_corpus_{mult}x.parquet",
                      ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
