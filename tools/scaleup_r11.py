"""64x scale row for the persisted-index ANN family (r10 verdict item
4): the round-10 headline — "probe/ingest cost decoupled from corpus
size" — measured past 16x, with shuffle bytes from the Spark UI REST
API (the tools/scaleup_r10b.py protocol).

At each corpus multiple (default 1, 16, 64) of sf0.1 embeddings:

- BUILD ONCE: ivf_index_build over the replicated corpus, saved via
  save_table(partition_by='centroid_id') — the cost that scales with
  the corpus and that the persisted index exists to stop re-paying.
- PROBE the SAVED index with a FIXED query batch (the registry's
  vec_id % 50 == 49 slice of the BASE table — identical rows at every
  multiple): reads only the probed inverted-list partitions.
- APPEND a FIXED ingest batch (ivf_index_append) against the saved
  index: broadcast-assign, batch-proportional.
- PQ: train codebooks on the corpus once (scales), then pq_encode the
  FIXED batch against the FROZEN codebooks (flat; pure projection).

Replication shifts vec_ids by multiples of (max_id+1), so the coarse
centroids (ids < 16) stay the base replica's vectors — the same
quantizer at every scale, which is what makes the probe rows
comparable across multiples.

Expected shape (and what SCALE.md extrapolates): build time and build
shuffle grow ~linearly with the multiple; probe/append/encode stay
bounded by (queries x n_probe x list width) / |batch| — the probe DOES
read 64x-wider inverted lists (its scan grows), but never re-assigns
or reshuffles the corpus, so its shuffle bytes stay query-sided.

Usage: python tools/scaleup_r11.py [sf_dir] [multiples-csv]
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


def shuffle_totals(base: str, app_id: str):
    stages = rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    multiples = [
        int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,16,64").split(",")
    ]

    from pyspark.sql import functions as F

    import hds_functions_spark.registry_ext  # noqa: F401  (registry chain head)
    from hds_functions_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_build,
        ivf_probe_index,
        pq_encode,
        pq_train,
    )
    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry_ext8 import (
        _ANN_CENTROIDS,
        _ANN_K,
        _ANN_MOD,
        _ANN_PROBE,
        _ANN_REM,
    )
    from hds_functions_spark.sources.tables import load_table, save_table

    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",  # REST metrics source
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    # FIXED batch at every multiple: the registry's ingest slice of the
    # BASE table (identical rows regardless of corpus multiple)
    batch = emb.filter(F.col("vec_id") % _ANN_MOD == _ANN_REM)
    queries = batch.select(F.col("vec_id").alias("query_id"), "embedding")
    n_batch = batch.count()
    print(f"fixed batch/query size: {n_batch} vectors")

    base_dir = os.path.join(tempfile.gettempdir(), "hds_scaleup_r11")

    def timed(label, fn):
        w0, r0 = shuffle_totals(ui, app_id)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        w1, r1 = shuffle_totals(ui, app_id)
        print(
            f"  {label:18s}: {dt:7.2f}s  shuffle_write={(w1 - w0) / 1e6:8.1f} MB"
            f"  shuffle_read={(r1 - r0) / 1e6:8.1f} MB"
            + (f"  rows={out}" if out is not None else "")
        )
        return dt

    for times in multiples:
        wide = emb
        for i in range(1, times):
            wide = wide.unionByName(
                emb.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * (max_id + 1))
                )
            )
        n_corpus = times * (max_id + 1)
        print(f"-- {times}x corpus (~{n_corpus} vectors) --")

        td = {
            "ivf_index": {
                "path": os.path.join(base_dir, f"ivf_{times}x"),
                "format": "parquet",
            }
        }
        shutil.rmtree(td["ivf_index"]["path"], ignore_errors=True)

        def build():
            idx = ivf_index_build(wide, n_centroids=_ANN_CENTROIDS)
            save_table(idx, "ivf_index", td, partition_by="centroid_id")
            return None

        timed("ivf_build+save", build)
        loaded = load_table("ivf_index", td)

        def probe():
            out = ivf_probe_index(
                loaded, queries, k=_ANN_K,
                n_centroids=_ANN_CENTROIDS, n_probe=_ANN_PROBE,
            )
            out.write.format("noop").mode("overwrite").save()
            return None

        timed("ivf_probe(saved)", probe)

        def append():
            ivf_index_append(
                loaded, batch, n_centroids=_ANN_CENTROIDS
            ).write.format("noop").mode("overwrite").save()
            return None

        timed("ivf_append(batch)", append)

        def train():
            globals()["_books"] = pq_train(wide, m=4, k=8)
            return None

        timed("pq_train(corpus)", train)

        def encode():
            pq_encode(batch, globals()["_books"]).write.format("noop").mode(
                "overwrite"
            ).save()
            return None

        timed("pq_encode(batch)", encode)

    shutil.rmtree(base_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
