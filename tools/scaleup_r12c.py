"""16x scale rows for the round-12 second-batch additions: Bloom-filter
decontamination (vs the exact n-gram join on the same split), the
WordPiece trainer pair, and RRF hybrid fusion.

Protocol as tools/scaleup_r12b.py: 16x = id-offset replication of the
documents AND embeddings tables into a temp dir. What each row is
meant to show:

- ``decontam_bloom`` vs ``decontam_ngram_overlap``: the bloom corpus
  probe moves (near-)zero shuffle bytes at any multiple — the bitmap
  broadcasts once and the only exchange is flagged-doc counts — while
  the exact join's gram exchange grows with the corpus. NOTE the
  replication protocol widens BOTH sides (the eval split is 10% of
  doc_ids, so 16x corpus = 16x eval too — the honest worst case, same
  caveat as the r10 embedding-decontam row).
- ``text_wordpiece_train``: corpus-size-independent after the
  word-dictionary collapse (replicated text keeps the dictionary
  constant — the point of training on (word, n)); encode is per-doc
  linear.
- ``retrieval_rrf_fusion``: the fusion stage is |queries| x k-sized;
  cost tracks the legs (BM25 postings + brute dense), and the query
  set itself widens 16x under replication (doc_id % 101 picks 16x
  more queries) — leg-bound, reported honestly.

Shuffle bytes are summed over the stages each run creates (REST API),
so the bloom-vs-exact comparison is read off the same telemetry the
skew row used.

Usage: python tools/scaleup_r12c.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def stage_ids(base: str, app_id: str) -> set[int]:
    return {
        s["stageId"]
        for s in rest(base, f"/api/v1/applications/{app_id}/stages")
    }


def shuffle_mb(base: str, app_id: str, new_ids: set[int]) -> float:
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

    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.caching import release_operator_caches
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

    def run(label, frame_fn):
        before = stage_ids(ui, app_id)
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        new = stage_ids(ui, app_id) - before
        mb = shuffle_mb(ui, app_id, new)
        release_operator_caches()
        print(
            f"{label:34s}: {dt:6.1f}s  out_rows={n:>8}  "
            f"shuffle_write={mb:8.2f} MB",
            flush=True,
        )
        return dt

    import __spark_entry__ as entry

    qs = entry.queries()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0]
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0]
    tmp = tempfile.mkdtemp(prefix="hds_scaleup_r12c_")
    try:
        wide_d, wide_e = docs, emb
        for i in range(1, 16):
            wide_d = wide_d.unionByName(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * (max_doc + 1))
                )
            )
            wide_e = wide_e.unionByName(
                emb.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * (max_vec + 1))
                )
            )
        wide_d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        wide_e.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

        for name in (
            "decontam_bloom",
            "decontam_ngram_overlap",
            "decontam_bloom_audit",
            "text_wordpiece_train",
            "text_wordpiece_encode",
            "retrieval_rrf_fusion",
        ):
            run(f"{name} 1x", lambda n=name: qs[n](spark, sf_dir))
            run(f"{name} 16x", lambda n=name: qs[n](spark, tmp))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
