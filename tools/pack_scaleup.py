"""Scale-up evidence for pack_sequences: pack sf0.1 documents at 1x and a
16x synthetic union (ids offset so shards stay balanced), auto-derived
shard count, timing the full materialisation (noop write, like bench.py).

Prints the chosen shard count and asserts it >= defaultParallelism at 16x —
the window stage must never serialise onto a handful of tasks.

Usage: python tools/pack_scaleup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from hds_functions_spark.operators.packing import pack_sequences
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
        "doc_id", "text"
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    big = docs
    for i in range(1, 16):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * max_id)).alias("doc_id"), "text"
            )
        )

    # small tokens_per_shard so even sf0.1 exercises the data-derived path
    # (sf0.1 documents ~400k whitespace tokens -> 1x floors at parallelism,
    # 16x must derive MORE shards than the floor)
    tps = 100_000
    par = spark.sparkContext.defaultParallelism
    for label, d in (("1x", docs), ("16x", big)):
        t0 = time.time()
        out = pack_sequences(d, budget=2048, tokens_per_shard=tps)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n_shards = out.agg(
            (F.max("shard") + 1).alias("s"), F.count("*").alias("n")
        ).collect()[0]
        ok = n_shards["s"] >= par
        print(
            f"{label}: {n_shards['n']} docs, shards={n_shards['s']} "
            f"(parallelism={par}) {dt:.1f}s -> "
            f"{'PASS' if ok or label == '1x' else 'FAIL'}"
        )


if __name__ == "__main__":
    main()
