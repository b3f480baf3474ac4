"""16x scale-up for the round-8 exact-substring dedup operators and the
end-to-end pipeline DAGs, plus two design A/Bs the round-8 verdict asked
for: the grams-table persist level inside exact_substring_spans (the
cache is ~20 B per corpus character, so its storage level is the
100 TB design decision) and the pagerank lineage-truncation cadence.

Protocol/caveat as tools/scaleup.py: 16x = id-offset replication of
sf0.1. Replication caveat that matters here: replicas are EXACT
duplicates, so at 16x EVERY min_len-gram of every doc is duplicated
corpus-wide — every position becomes a candidate and every doc is
fully covered. That is the worst case for the candidate re-join (no
pruning at step 2) and for span removal (maximal spans per doc);
organic growth is far milder. The pipeline DAGs run against a temp
sf-dir holding the widened documents/embeddings parquet so they
exercise their real read path.

Usage: python tools/scaleup_r8.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
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
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

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
    emb16 = widen(emb, ["vec_id"])

    from hds_functions_spark.operators.dedup import (
        exact_substring_spans,
        remove_duplicate_spans,
    )
    from hds_functions_spark.registry_ext5 import _XS_MIN_LEN

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:42s}: {dt:6.1f}s  out_rows={n}")
        return dt

    # --- raw operators, 1x vs 16x (default persist) ---
    for tag, d in (("1x", docs), ("16x", docs16)):
        run(f"exact_spans {tag}",
            lambda d=d: exact_substring_spans(d, min_len=_XS_MIN_LEN))
        run(f"span_removal {tag}",
            lambda d=d: remove_duplicate_spans(
                d, exact_substring_spans(d, min_len=_XS_MIN_LEN)))

    # --- grams-persist A/B at 16x (the 100 TB design decision) ---
    for lvl in ("memory_and_disk", "disk_only", "none"):
        run(f"exact_spans 16x gram_persist={lvl}",
            lambda lvl=lvl: exact_substring_spans(
                docs16, min_len=_XS_MIN_LEN, gram_persist=lvl))

    # --- pipeline DAGs end-to-end via a widened sf-dir ---
    import __spark_entry__ as entry

    qs = entry.queries()
    tmp = tempfile.mkdtemp(prefix="hds_scaleup_r8_")
    try:
        docs16.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        emb16.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
        for name in ("pipeline_exact_dedup_prep", "pipeline_pretrain_prep",
                     "pipeline_semantic_prep"):
            run(f"{name} 1x", lambda n=name: qs[n](spark, sf_dir))
            run(f"{name} 16x", lambda n=name: qs[n](spark, tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- pagerank cadence A/B (n_iter=6 so cadence matters; the
    # registry query's own n_iter=2 is cadence-insensitive) ---
    from hds_functions_spark.operators.graph import pagerank

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    joined = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
    edges = joined.select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    for cad in (1, 2, 3):
        run(f"pagerank n_iter=6 checkpoint_every={cad}",
            lambda cad=cad: pagerank(both, n_iter=6, checkpoint_every=cad))

    spark.stop()


if __name__ == "__main__":
    main()
