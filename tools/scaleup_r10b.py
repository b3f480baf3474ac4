"""64x scale row for the exchange-heaviest family: exact substring
spans (dedup.py exact_substring_spans), with MEASURED shuffle bytes.

The r9 verdict: every family has 16x rows, but the one operator whose
exchange is proportional to corpus BYTES (~20 B per text character,
the depth-L prefix bucket of the suffix sort) had no row past 16x —
the "survives 100x" claim was argued, not measured. This harness runs
the operator at 64x replication of sf0.1 under the two cluster-grade
cache levels (disk_only / none) and reads the ACTUAL bytes shuffled
from the Spark UI REST API (shuffle write summed over stages), so the
bytes-per-corpus-byte curve in SCALE.md is measured, not derived.

Replication caveat (worst case, as in tools/scaleup_r8.py): replicas
are exact duplicates, so at 64x every min_len-gram is duplicated
corpus-wide — every position survives the frequency filter and the
candidate re-join carries the ENTIRE grams table; organic growth is
far milder.

Usage: python tools/scaleup_r10b.py [sf_dir] [times]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def shuffle_totals(base: str, app_id: str):
    stages = rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    times = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401  (registry chain head)
    from hds_functions_spark.caching import release_operator_caches
    from hds_functions_spark.operators.dedup import exact_substring_spans
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry_ext5 import _XS_MIN_LEN

    spark = build_session(
        master="local[32]",
        shuffle_partitions=64,  # sized to the corpus, per the docstring
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics source
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    wide = docs
    for i in range(1, times):
        wide = wide.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * (max_id + 1)))
        )
    corpus_bytes = wide.agg(
        F.sum(F.length("text")).alias("b")
    ).collect()[0]["b"]
    print(f"{times}x corpus: {corpus_bytes / 1e6:.1f} MB of text")

    for lvl in ("disk_only", "none"):
        w0, r0 = shuffle_totals(ui, app_id)
        t0 = time.time()
        out = exact_substring_spans(
            wide, min_len=_XS_MIN_LEN, gram_persist=lvl
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        w1, r1 = shuffle_totals(ui, app_id)
        dw = w1 - w0
        print(
            f"exact_spans {times}x gram_persist={lvl:10s}: {dt:7.1f}s  "
            f"spans={n}  shuffle_write={dw / 1e6:.0f} MB "
            f"({dw / corpus_bytes:.1f} B/char)  "
            f"shuffle_read={(r1 - r0) / 1e6:.0f} MB"
        )

    spark.stop()


if __name__ == "__main__":
    main()
