"""16x scale-up for the round-10 third wave: k-core, DP sums, the
index-drift monitor, and the decontam purge pipeline.

Protocol/caveat as tools/scaleup.py: 16x = id-offset replication (the
co-purchase graph replicates as 16 disjoint copies; the purge's
hash-split eval set widens WITH the corpus — worst case, as in
tools/scaleup_r10.py).

Usage: python tools/scaleup_r10c.py [sf_dir]
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
        print(f"{label:40s}: {dt:6.1f}s  out_rows={n}")
        return dt

    import __spark_entry__ as entry

    qs = entry.queries()

    def widen(df, id_cols, times=16):
        maxes = df.agg(*[F.max(c).alias(c) for c in id_cols]).collect()[0]
        out = df
        for i in range(1, times):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            out = out.unionByName(rep)
        return out

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    tmp = tempfile.mkdtemp(prefix="hds_scaleup_r10c_")
    try:
        widen(orders, ["o_orderkey", "o_custkey"]).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/orders.parquet")
        widen(li, ["l_orderkey", "l_suppkey"]).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/lineitem.parquet")
        widen(docs, ["doc_id"]).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )
        widen(emb, ["vec_id"]).write.mode("overwrite").parquet(
            f"{tmp}/embeddings.parquet"
        )

        for name in (
            "graph_kcore",
            "privacy_dp_sums",
            "similarity_index_drift",
            "pipeline_decontam_purge",
        ):
            run(f"{name} 1x", lambda n=name: qs[n](spark, sf_dir))
            run(f"{name} 16x", lambda n=name: qs[n](spark, tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
