"""16x scale row for pipeline_card_trend (r11 addition): replicate
sf0.1 documents into a temp sf_dir and run the registered query
end-to-end (archive-snapshot writes included — they ARE the operator's
cost model: two snapshot writes + two scan-pruned card aggregates to
|sources| rows + a report-sized trend join).

Usage: python tools/scaleup_r11b.py [sf_dir] [times]
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
    times = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry import QUERIES

    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]

    for mult in (1, times):
        wide = docs
        for i in range(1, mult):
            wide = wide.unionByName(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * (max_id + 1))
                )
            )
        tmp = os.path.join(tempfile.gettempdir(), f"hds_cardtrend_scale_{mult}x")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        wide.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        t0 = time.time()
        out = QUERIES["pipeline_card_trend"](spark, tmp)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"pipeline_card_trend {mult}x: {dt:6.2f}s  rows={out.count()}")
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
