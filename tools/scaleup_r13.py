"""Round-13 scale rows.

A) TREE QUANTIZER AT BEYOND-BROADCAST k — the escalation SCALE.md:466
   named but r12 did not build: when k*dim outgrows the broadcast
   budget (k=65k x dim 768 ~ 400 MB), assignment becomes a coarse-cell
   probe + centroid-side equi-join. Measured here at k=16384, dim 64
   on the 64x-replicated sf0.1 embedding corpus (131k vectors):

   1. identity + wall on a 16k-vector slice, tree vs broadcast,
      checksummed (the broadcast full-scan at this k costs ~k/1024 x
      the r12 88.7 s row ~ 23 min of interpreted HOF arithmetic — the
      slice keeps the A/B honest without burning half a session);
   2. probe-fanout stats on the full corpus — the honest NEGATIVE:
      near-isotropic geometry concentrates distances, the bounds
      prune nothing (127.65 of 128 cells probed), so the exact tree
      degenerates to the broadcast scan there. Part D measures the
      clustered regime (the one IVF-style quantization exists for).

B) 16x pipeline_web_curation row (wall + shuffle).
C) 16x audio-phash throughput row (clips/s, zero shuffle).
D) tree quantizer on a CLUSTERED 128k-vector corpus at k=16384 —
   fanout, tree wall vs broadcast wall, checksummed identical.

Usage: python tools/scaleup_r13.py [sf_dir] [parts]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def stage_ids(base: str, app_id: str) -> set[int]:
    stages = rest(base, f"/api/v1/applications/{app_id}/stages")
    return {s["stageId"] for s in stages}


def shuffle_mb_of_new_stages(base: str, app_id: str, old_ids: set[int]):
    stages = rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    new = [s for s in stages if s["stageId"] not in old_ids]
    read = sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6
    write = sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6
    return read, write


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = (sys.argv[2] if len(sys.argv) > 2 else "A").upper()

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

    if "A" in parts:
        part_a(spark, sf_dir, ui, app_id)
    if "B" in parts:
        part_b(spark, sf_dir, ui, app_id)
    if "C" in parts:
        part_c(spark, sf_dir, ui, app_id)
    if "D" in parts:
        part_d(spark, sf_dir, ui, app_id)
    spark.stop()


def part_a(spark, sf_dir, ui, app_id):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.clustering import (
        build_tree_codebook,
        kmeans_assign,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    wide = emb
    for i in range(1, 64):
        wide = wide.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * (max_id + 1)))
        )
    wide = wide.persist()
    n = wide.count()
    k = 16384
    print(f"== A: tree quantizer, k={k}, dim 64, 64x corpus ({n} vectors) ==",
          flush=True)

    # k "centroids": the first 16384 corpus vectors (8.4 MB driver-side
    # — the point of the tree is that they need not broadcast as a
    # literal/plan object, not that the driver cannot hold them)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in wide.orderBy("vec_id").limit(k).collect()
    ]
    t0 = time.time()
    coarse, children = build_tree_codebook(cents)
    dt_build = time.time() - t0
    sizes = sorted(len(v) for v in children.values())
    print(
        f"  codebook: {len(coarse)} cells in {dt_build:.2f}s driver-side; "
        f"children/cell p50={sizes[len(sizes)//2]} max={sizes[-1]}",
        flush=True,
    )

    def assign_sum(src, method, label):
        old = stage_ids(ui.rstrip('/'), app_id) if ui else set()
        t0 = time.time()
        row = (
            kmeans_assign(src, cents, method=method, id_col="vec_id")
            .agg(
                F.sum("cluster").alias("cs"),
                F.sum(F.round("dist", 6)).alias("ds"),
                F.count("cluster").alias("nn"),
            )
            .collect()[0]
        )
        dt = time.time() - t0
        chk = (row["cs"], round(row["ds"] or 0.0, 3), row["nn"])
        sh = ""
        if ui:
            rd, wr = shuffle_mb_of_new_stages(ui.rstrip('/'), app_id, old)
            sh = f"  shuffle read/write {rd:.1f}/{wr:.1f} MB"
        print(f"  {label:28s}: {dt:7.2f}s  checksum={chk}{sh}", flush=True)
        return chk

    # probe fanout: how many coarse cells each vector actually joins
    # against (the shuffle amplification factor of the tree's one
    # exchange) — measured on the full corpus
    cells_probed = _fanout(spark, wide, cents, coarse)
    print(f"  probe fanout (cells/vector): {cells_probed}", flush=True)

    slice_df = wide.filter(F.col("vec_id") < 16384).persist()
    n_slice = slice_df.count()
    print(f"  -- identity A/B on {n_slice}-vector slice --", flush=True)
    chk_b = assign_sum(slice_df, "broadcast", f"slice broadcast k={k}")
    chk_t = assign_sum(slice_df, "tree", f"slice tree      k={k}")
    print(
        "  slice checksums "
        + ("IDENTICAL" if chk_b == chk_t else "MISMATCH!"),
        flush=True,
    )
    slice_df.unpersist()

    # NO full-corpus tree row here: with fanout ~128/128 (isotropic
    # geometry, bounds prune nothing) the tree pass IS the broadcast
    # scan plus join overhead — part D measures the clustered regime
    # where the tree is the win.
    wide.unpersist()


def _fanout(spark, wide, cents, coarse):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.clustering import (
        _TREE_BOUND_SLACK,
        _TREE_CELLS,
    )
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    cells_type = ArrayType(
        StructType(
            [
                StructField("cid", IntegerType()),
                StructField("c", ArrayType(DoubleType())),
                StructField("r", DoubleType()),
                StructField("m", DoubleType()),
            ]
        )
    )
    cells_df = spark.createDataFrame(
        [([(x["cid"], x["c"], x["r"], x["m"]) for x in coarse],)],
        schema=StructType([StructField(_TREE_CELLS, cells_type)]),
    )

    def sq_to(target):
        return F.coalesce(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    target,
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
            F.lit(float("inf")),
        )

    from hds_functions_spark.functions.exprs import let_

    cd_expr = F.transform(
        F.col(_TREE_CELLS),
        lambda cell: F.struct(
            F.sqrt(sq_to(cell["c"])).alias("bd"),
            cell["cid"].alias("cid"),
            cell["r"].alias("r"),
            cell["m"].alias("m"),
        ),
    )
    # bind-once (let_), same as the operator — a named intermediate
    # would be inlined into the filter and recomputed per element
    n_probed = let_(
        cd_expr,
        lambda cd: let_(
            F.array_min(cd),
            lambda best: F.size(
                F.filter(
                    cd,
                    lambda x: x["bd"] - x["r"]
                    <= (best["bd"] + best["m"])
                    * (1.0 + _TREE_BOUND_SLACK)
                    + _TREE_BOUND_SLACK,
                )
            ),
        ),
    )
    stats = (
        wide.crossJoin(F.broadcast(cells_df))
        .select(n_probed.alias("np"))
        .agg(
            F.round(F.avg("np"), 2).alias("avg"),
            F.expr("percentile(np, 0.5)").alias("p50"),
            F.max("np").alias("max"),
        )
        .collect()[0]
    )
    return f"avg={stats['avg']} p50={stats['p50']} max={stats['max']}"




def part_b(spark, sf_dir, ui, app_id):
    """16x web-curation pipeline row: wall + total shuffle for the whole
    WARC->curated DAG on a 16x-replicated documents corpus. The
    replication shifts doc_ids by multiples of 10M so every protocol
    stage (slice mod, hash buckets, KN train split) sees fresh ids."""
    import time as _t

    from pyspark.sql import functions as F

    from hds_functions_spark.registry import QUERIES
    import hds_functions_spark.registry_ext  # noqa: F401

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wide = docs
    for i in range(1, 16):
        wide = wide.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    wide = wide.persist()
    n = wide.count()
    tmp = f"/tmp/hds_r13_webcur_16x"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    wide.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    wide.unpersist()
    # the other tables the registry loader may touch
    import os
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        src = f"{sf_dir}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{tmp}/{t}.parquet")
    print(f"== B: pipeline_web_curation on 16x docs ({n} rows) ==", flush=True)
    for label, d in (("1x", sf_dir), ("16x", tmp)):
        old = stage_ids(ui.rstrip('/'), app_id) if ui else set()
        t0 = _t.time()
        out = QUERIES["pipeline_web_curation"](spark, d)
        rows = out.collect()
        dt = _t.time() - t0
        kept = sum(r["n_docs"] for r in rows if r["kept"])
        sh = ""
        if ui:
            rd, wr = shuffle_mb_of_new_stages(ui.rstrip('/'), app_id, old)
            sh = f"  shuffle read/write {rd:.1f}/{wr:.1f} MB"
        print(
            f"  {label:4s}: {dt:7.2f}s  out_rows={len(rows)} "
            f"kept_docs={kept}{sh}",
            flush=True,
        )


def part_c(spark, sf_dir, ui, app_id):
    """16x audio-phash row: clips/s through synthesize->RIFF walk->hash
    (pure per-row Python behind Arrow; the claim is zero shuffle and
    executor-linear throughput, like the image/video codec rows)."""
    import time as _t

    from pyspark.sql import functions as F

    from hds_functions_spark.operators.multimodal import (
        audio_phash,
        synthesize_media_payloads,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    wide = docs
    for i in range(1, 16):
        wide = wide.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    wide = wide.persist()
    n = wide.count()
    print(f"== C: audio phash on 16x docs ({n} clips) ==", flush=True)
    for label, src, nn in (("1x", docs, n // 16), ("16x", wide, n)):
        old = stage_ids(ui.rstrip('/'), app_id) if ui else set()
        t0 = _t.time()
        row = (
            audio_phash(synthesize_media_payloads(src, "wav_tones"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("aphash") % 1000003).alias("chk"))
            .collect()[0]
        )
        dt = _t.time() - t0
        sh = ""
        if ui:
            rd, wr = shuffle_mb_of_new_stages(ui.rstrip('/'), app_id, old)
            sh = f"  shuffle read/write {rd:.1f}/{wr:.1f} MB"
        print(
            f"  {label:4s}: {dt:7.2f}s  {row['n']} clips "
            f"({row['n']/dt:,.0f}/s) chk={row['chk']}{sh}",
            flush=True,
        )
    wide.unpersist()


def part_d(spark, sf_dir, ui, app_id):
    """Tree quantizer on a CLUSTERED 64x corpus — the regime coarse
    quantization exists for. Part A's honest negative: on the
    near-isotropic synthetic embeddings the triangle bounds prune
    NOTHING (fanout 127.65 of 128 cells — distances concentrate, r_c
    swamps the coarse gap; the same geometry that collapsed ANN recall
    in the r12 audit), so an exact tree pass degenerates to the
    broadcast full scan plus join overhead. Real embedding corpora are
    clustered (that is why IVF works in production); this part plants
    128k vectors at 0.05-noise around the 16384 centroids and measures
    the fanout, the tree wall, and the broadcast wall at the same k."""
    import time as _t

    import numpy as np
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.clustering import (
        build_tree_codebook,
        kmeans_assign,
    )

    # 32k rows: the broadcast leg alone costs ~19 min of interpreted
    # HOF at this k (measured 580 s per 16k rows in part A); the
    # tree-vs-broadcast RATIO is row-count-independent, so the smaller
    # corpus keeps the A/B inside a session without weakening the row
    # HIERARCHICAL geometry, both levels: 128 super-centers, the 16384
    # centroids at +-0.1 around them, the data at +-0.02 around the
    # centroids. The first attempt drew the centroids uniform-random and
    # measured fanout 128/128 EVEN with clustered data — the pruning
    # bound lives in CENTROID space, and 16384 uniform points in 64-dim
    # are as isotropic as the part-A corpus (r_c spans the space, the
    # bound excludes nothing). Real 65k-centroid coarse quantizers are
    # trained ON clustered embeddings, so centroid space inherits the
    # manifold structure this fixture plants explicitly; n=16k keeps the
    # broadcast leg (~580 s measured per 16k rows at this k) affordable.
    k, dim, n = 16384, 64, 16_000
    rng = np.random.default_rng(1337)
    supers = rng.uniform(-1.0, 1.0, size=(128, dim))
    centers = (
        supers[np.arange(k) % 128]
        + rng.uniform(-0.1, 0.1, size=(k, dim))
    )
    cents = [[float(x) for x in c] for c in centers]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_v = []
            for i in ids:
                r = np.random.default_rng(int(i))
                v = centers[int(i) % k] + r.uniform(-0.02, 0.02, size=dim)
                out_v.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": ids, "embedding": out_v})

    corpus = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .persist()
    )
    corpus.count()
    print(f"== D: tree quantizer, HIERARCHICALLY clustered corpus "
          f"({n} vectors, k={k}, dim {dim}) ==", flush=True)
    t0 = _t.time()
    coarse, children = build_tree_codebook(cents)
    print(f"  codebook: {len(coarse)} cells in {_t.time()-t0:.2f}s",
          flush=True)
    fanout = _fanout(spark, corpus, cents, coarse)
    print(f"  probe fanout (cells/vector): {fanout}", flush=True)

    def assign_sum(method, label):
        old = stage_ids(ui.rstrip('/'), app_id) if ui else set()
        t0 = _t.time()
        row = (
            kmeans_assign(corpus, cents, method=method, id_col="vec_id")
            .agg(F.sum("cluster").alias("cs"),
                 F.sum(F.round("dist", 6)).alias("ds"))
            .collect()[0]
        )
        dt = _t.time() - t0
        sh = ""
        if ui:
            rd, wr = shuffle_mb_of_new_stages(ui.rstrip('/'), app_id, old)
            sh = f"  shuffle read/write {rd:.1f}/{wr:.1f} MB"
        chk = (row["cs"], round(row["ds"] or 0.0, 3))
        print(f"  {label:22s}: {dt:7.2f}s  checksum={chk}{sh}", flush=True)
        return chk

    chk_t = assign_sum("tree", f"tree       k={k}")
    chk_b = assign_sum("broadcast", f"broadcast  k={k}")
    print("  checksums " + ("IDENTICAL" if chk_b == chk_t else "MISMATCH!"),
          flush=True)
    corpus.unpersist()

if __name__ == "__main__":
    main()
