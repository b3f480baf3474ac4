"""16x scale rows for the round-12 third/fourth-batch additions:
perplexity buckets, incremental bloom, streaming bloom, DP quantiles.

Protocol as tools/scaleup_r12c.py (id-offset documents replication;
lineitem-based dp_quantiles replicates lineitem by l_orderkey offset).
Expected shapes:

- pipeline_perplexity_buckets: ~linear in docs (KN scoring is
  gram-table-bounded; the ntile runs on the per-doc score frame);
- decontam_bloom_incremental: tracks decontam_bloom (the merge is
  bitmap-sized);
- streaming_bloom_decontam: ~linear in docs (per-micro-batch probe;
  the sink write dominates at bench scale);
- privacy_dp_quantiles: group-cardinality x grid bounded — the
  per-group aggregate is the only corpus-sized stage.

Usage: python tools/scaleup_r12e.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401
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
        print(f"{label:38s}: {dt:6.1f}s  out_rows={n:>8}", flush=True)

    import __spark_entry__ as entry

    qs = entry.queries()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    tmp = tempfile.mkdtemp(prefix="hds_scaleup_r12e_")
    try:
        wide_d, wide_l = docs, li
        for i in range(1, 16):
            wide_d = wide_d.unionByName(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * (max_doc + 1))
                )
            )
            wide_l = wide_l.unionByName(
                li.withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.lit(i * (max_ok + 1)),
                )
            )
        wide_d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        wide_l.write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

        for name in (
            "pipeline_perplexity_buckets",
            "decontam_bloom_incremental",
            "streaming_bloom_decontam",
            "privacy_dp_quantiles",
            "dedup_lsh_plan",
        ):
            run(f"{name} 1x", lambda n=name: qs[n](spark, sf_dir))
            run(f"{name} 16x", lambda n=name: qs[n](spark, tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
