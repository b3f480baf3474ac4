"""16x scale-up for the round-9 continuation rollups: the cross-source
verbatim-copy matrix and soft-dedup reweighting.

Protocol/caveat as tools/scaleup.py (16x = id-offset replication of
sf0.1 documents). Replication effects: every replica doc shares ALL
its fingerprints with its 15 copies, so (a) the source matrix's
distinct-(source, fingerprint) collapse absorbs a 16x-denser sharing
pattern — the worst case for the rollup join; (b) the soft-weights run
measures the MinHash + connected-components build at 16x PLUS the
inverse-size rollup (the build dominates; the rollup adds one
broadcast-sized join).

Usage: python tools/scaleup_r9d.py [sf_dir]
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
        "doc_id", "text", "source"
    )

    def widen(df, times=16):
        mx = df.agg(F.max("doc_id")).collect()[0][0]
        out = df
        for i in range(1, times):
            out = out.unionByName(
                df.withColumn("doc_id", F.col("doc_id") + F.lit(i * (mx + 1)))
            )
        return out

    docs16 = widen(docs)

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:44s}: {dt:6.1f}s  out_rows={n}")

    from hds_functions_spark.operators.dedup import (
        dedup_clusters,
        source_overlap_matrix,
        winnowing_fingerprints,
    )
    from hds_functions_spark.registry_ext import (
        _CC_MIN_JACCARD,
        _MH_BANDS,
        _MH_NUM_HASHES,
        _MH_SHINGLE,
    )
    from hds_functions_spark.registry_ext4 import (
        _WN_GRAM,
        _WN_MAX_DF,
        _WN_WINDOW,
    )

    for tag, d in (("1x", docs), ("16x", docs16)):
        run(f"source_matrix {tag} (fps build included)",
            lambda d=d: source_overlap_matrix(
                winnowing_fingerprints(
                    d.select("doc_id", "text"),
                    gram_size=_WN_GRAM, window=_WN_WINDOW),
                d.select("doc_id", "source"),
                max_doc_freq=_WN_MAX_DF))

    def soft(d):
        comp = dedup_clusters(
            d, num_hashes=_MH_NUM_HASHES, shingle_size=_MH_SHINGLE,
            bands=_MH_BANDS, min_jaccard=_CC_MIN_JACCARD,
        )
        sizes = comp.groupBy("component").agg(
            F.count(F.lit(1)).alias("size"))
        doc_sz = (
            d.select("doc_id", "source")
            .join(comp, on="doc_id", how="left")
            .join(sizes, on="component", how="left")
            .select("source",
                    F.coalesce(F.col("size"), F.lit(1)).alias("size"))
        )
        return doc_sz.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.sum(1.0 / F.col("size")), 6).alias("effective_docs"),
        )

    for tag, d in (("1x", docs), ("16x", docs16)):
        run(f"soft_weights {tag} (cluster build included)",
            lambda d=d: soft(d))


if __name__ == "__main__":
    main()
