"""Round-14 scale rows.

A) The ntile->quantile-cut re-spell at 16x: wall + total shuffle for
   the four re-spelled queries (pipeline_curriculum_order,
   classify_nb_calibration, pipeline_perplexity_buckets,
   pipeline_web_curation) on a 16x-replicated documents corpus, with
   a plan assertion that no ntile survives — the r13 verdict's "16x
   row showing the sort gone".

B) 16x pipeline_image_curation: wall + shuffle for the whole
   synthesize -> decode -> two-tier dedup -> card DAG. The decode is
   Arrow-batched per-row Python, so the expectation is executor-linear
   wall and signature-sized (never pixel-sized) shuffle.

C) Auto-dispatch geometry verdicts at scale: choose_assign_method on
   (i) the 64x-replicated real embedding corpus with isotropic random
   centroids at k*dim > 2^20 (expected: broadcast — the r13 row where
   tree lost), and (ii) the clustered synthetic corpus from
   scaleup_r13 part D (expected: tree — where it won 3.2x). Prints the
   verdict + probe wall so the dispatch cost is on the record.

Usage: python tools/scaleup_r14.py [sf_dir] [parts]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
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


def shuffle_mb_of_new_stages(base: str, app_id: str, old_ids: set[int]):
    stages = rest(
        base, f"/api/v1/applications/{app_id}/stages?status=complete"
    )
    new = [s for s in stages if s["stageId"] not in old_ids]
    read = sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6
    write = sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6
    return read, write


def replicate_docs_16x(spark, sf_dir: str, tmp: str) -> int:
    """documents x16 with doc_id shifts of 10M (fresh ids for every
    protocol stage); other tables symlinked."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wide = docs
    for i in range(1, 16):
        wide = wide.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    shutil.rmtree(tmp, ignore_errors=True)
    wide = wide.persist()
    n = wide.count()
    wide.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    wide.unpersist()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        src = f"{sf_dir}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{tmp}/{t}.parquet")
    return n


def _run(spark, ui, app_id, label, fn, collector):
    old = stage_ids(ui.rstrip("/"), app_id) if ui else set()
    t0 = time.time()
    rows = collector(fn())
    dt = time.time() - t0
    sh = ""
    if ui:
        rd, wr = shuffle_mb_of_new_stages(ui.rstrip("/"), app_id, old)
        sh = f"  shuffle read/write {rd:.1f}/{wr:.1f} MB"
    print(f"  {label}: {dt:7.2f}s  out_rows={rows}{sh}", flush=True)
    return dt


def part_a(spark, sf_dir, ui, app_id, tmp16):
    import re

    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.registry import QUERIES

    queries = [
        "pipeline_curriculum_order",
        "classify_nb_calibration",
        "pipeline_perplexity_buckets",
        "pipeline_web_curation",
    ]
    print("== A: ntile->cut re-spell, 1x vs 16x ==", flush=True)
    for q in queries:
        plan = (
            QUERIES[q](spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert not re.search(r"\bntile\(", plan), f"{q} still plans ntile"
        for label, d in (("1x ", sf_dir), ("16x", tmp16)):
            _run(
                spark, ui, app_id, f"{q:32s} {label}",
                lambda d=d, q=q: QUERIES[q](spark, d),
                lambda df: len(df.collect()),
            )


def part_b(spark, sf_dir, ui, app_id, tmp16):
    import hds_functions_spark.registry_ext  # noqa: F401
    from hds_functions_spark.registry import QUERIES

    print("== B: pipeline_image_curation, 1x vs 16x ==", flush=True)
    for label, d in (("1x ", sf_dir), ("16x", tmp16)):
        _run(
            spark, ui, app_id, f"pipeline_image_curation {label}",
            lambda d=d: QUERIES["pipeline_image_curation"](spark, d),
            lambda df: len(df.collect()),
        )


def part_c(spark, sf_dir, ui, app_id):
    import numpy as np
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.clustering import (
        choose_assign_method,
    )

    print("== C: auto-dispatch geometry verdicts at scale ==", flush=True)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wide = emb
    for i in range(1, 64):
        wide = wide.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        )
    rng = np.random.default_rng(11)
    # isotropic centroids over the real (near-isotropic) corpus: the
    # r13 regime where the tree LOST — auto must answer broadcast
    dim = len(wide.select("embedding").first()[0])
    iso_cents = rng.uniform(-1.0, 1.0, size=(16384, dim)).tolist()
    t0 = time.time()
    verdict, _ = choose_assign_method(wide, iso_cents, id_col="vec_id")
    print(
        f"  isotropic 64x corpus (k=16384, dim={dim}): verdict={verdict} "
        f"probe={time.time() - t0:.2f}s",
        flush=True,
    )
    assert verdict == "broadcast", verdict
    # clustered regime (scaleup_r13 part D's construction): blob
    # centers spread, centroids + vectors near them — tree won 3.2x
    blobs = rng.uniform(0.0, 1.0, size=(128, dim)) * 200.0
    cents = (
        blobs[rng.integers(0, 128, size=16384)]
        + rng.normal(0.0, 0.05, size=(16384, dim))
    ).tolist()
    data = (
        blobs[rng.integers(0, 128, size=4096)]
        + rng.normal(0.0, 0.05, size=(4096, dim))
    )
    cl = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(data)],
        "vec_id long, embedding array<double>",
    )
    t0 = time.time()
    verdict, cb = choose_assign_method(cl, cents, id_col="vec_id")
    print(
        f"  clustered corpus (k=16384, dim={dim}): verdict={verdict} "
        f"probe={time.time() - t0:.2f}s",
        flush=True,
    )
    assert verdict == "tree" and cb is not None, verdict


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = (sys.argv[2] if len(sys.argv) > 2 else "ABC").upper()

    from hds_functions_spark.plans import build_session

    spark = build_session(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "12g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    tmp16 = "/tmp/hds_r14_docs_16x"
    if ("A" in parts or "B" in parts) and not os.path.exists(
        f"{tmp16}/documents.parquet"
    ):
        n = replicate_docs_16x(spark, sf_dir, tmp16)
        print(f"replicated documents 16x: {n} rows at {tmp16}", flush=True)
    if "A" in parts:
        part_a(spark, sf_dir, ui, app_id, tmp16)
    if "B" in parts:
        part_b(spark, sf_dir, ui, app_id, tmp16)
    if "C" in parts:
        part_c(spark, sf_dir, ui, app_id)
    spark.stop()


if __name__ == "__main__":
    main()
