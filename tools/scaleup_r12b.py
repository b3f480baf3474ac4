"""16x scale rows for the round-12 registry additions: the unigram-LM
tokenizer pair, pHash near-dup grouping, and the WARC roundtrip.

Protocol as tools/scaleup_r10c.py: 16x = id-offset replication of the
documents table into a temp dir (text distribution identical, so the
unigram word DICTIONARY does not widen — which is the point: training
cost must be corpus-size-independent once the word-frequency aggregate
is paid; phash/warc costs are per-document and should scale ~linearly
until core-fill).

Usage: python tools/scaleup_r12b.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401  (registry chain)
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

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:32s}: {dt:6.1f}s  out_rows={n}", flush=True)
        return dt

    import __spark_entry__ as entry

    qs = entry.queries()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    tmp = tempfile.mkdtemp(prefix="hds_scaleup_r12b_")
    try:
        wide = docs
        for i in range(1, 16):
            wide = wide.unionByName(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * (max_id + 1))
                )
            )
        wide.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        for name in (
            "text_unigram_train",
            "text_unigram_encode",
            "multimodal_phash_dups",
            "multimodal_phash",
            "source_warc_corpus",
            "source_warc_quarantine",
        ):
            run(f"{name} 1x", lambda n=name: qs[n](spark, sf_dir))
            run(f"{name} 16x", lambda n=name: qs[n](spark, tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
