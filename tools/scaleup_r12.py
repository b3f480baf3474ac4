"""Round-12 scale rows (verdict items 3 and 5).

A) LARGE-K CENTROID ASSIGNMENT — three ways to get the centroid
   matrix to the executors, on the 64x-replicated sf0.1 embedding
   corpus (128k vectors, dim 64), k in {256, 1024, 4096}:
   `codegen` (k unrolled literal distance expressions), `bulk` (one
   folded matrix literal, argmin looped over it), and `broadcast`
   (the matrix as a broadcast-joined DATA column — O(1) plan). All
   three are bit-identical (tests/test_clustering.py pins it). The
   1-row-corpus rows isolate plan/compile overhead (the term that
   grows with k*dim for BOTH literal methods — a folded literal still
   pays O(k*dim) driver-side analysis); the full-scan row at k=1024
   is the verdict's measured large-k row, checksummed across methods.

B) SKEW-STRESS FOR THE JOIN LAYER — the synthetic corpora are
   near-uniform, so the salting path has never been measured under a
   genuinely hot key. Plant a head key holding ~20% of a 16x events
   corpus (1.6M rows -> 320k on one user), force a shuffle join
   (autoBroadcastJoinThreshold=-1 — at real scale the dim side is
   broadcast-too-big), and measure three configs:
     1. plain join, AQE skewJoin OFF  (the naive worst case)
     2. plain join, AQE skewJoin ON   (Spark's runtime mitigation)
     3. salted_join, AQE skewJoin OFF (the operator's own mitigation)
   Metric: join-stage task-time spread (p50 vs max via the REST
   taskSummary) + wall. The hot partition's max-task time is the
   number that becomes the straggler at 1000 executors.

Usage: python tools/scaleup_r12.py [sf_dir]
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


def hottest_stage_spread(base: str, app_id: str, new_ids: set[int]):
    """Task spread of the stage with the largest shuffle read among
    ``new_ids`` (the reduce side of the join): (records_p50,
    records_max, runtime_p50_s, runtime_max_s, stage_shuffle_MB).
    Records-per-task is the deterministic skew signal — the hot
    partition's record count is what becomes the wall-clock straggler
    once per-row work is 100TB-real; runtime spread is reported too
    but is noise-prone at local bench scale."""
    stages = rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    cand = [s for s in stages if s["stageId"] in new_ids]
    if not cand:
        return None
    s = max(cand, key=lambda x: x.get("shuffleReadBytes", 0))
    q = rest(
        base,
        f"/api/v1/applications/{app_id}/stages/{s['stageId']}/"
        f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0",
    )
    rp50, rmx = q["shuffleReadMetrics"]["readRecords"]
    tp50, tmx = q["executorRunTime"]
    return rp50, rmx, tp50 / 1e3, tmx / 1e3, s.get("shuffleReadBytes", 0) / 1e6


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    parts = (sys.argv[2] if len(sys.argv) > 2 else "AB").upper()

    from pyspark.sql import functions as F

    from hds_functions_spark.operators.clustering import kmeans_assign
    from hds_functions_spark.operators.joins import salted_join
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

    # ---- A: large-k assignment ------------------------------------------
    if "A" in parts:
        part_a(spark, sf_dir)
    if "B" in parts:
        part_b(spark, sf_dir, ui, app_id)
    spark.stop()


def part_a(spark, sf_dir):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.clustering import kmeans_assign

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
    print(f"== A: large-k assignment on 64x corpus ({n} vectors, dim 64) ==",
          flush=True)
    base_vecs = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(4096).collect()
    ]
    one_row = emb.limit(1).persist()
    one_row.count()

    def assign_sum(src, cents, method):
        t0 = time.time()
        row = (
            kmeans_assign(src, cents, method=method)
            .agg(
                F.sum("cluster").alias("cs"),
                F.sum(F.round("dist", 6)).alias("ds"),
            )
            .collect()[0]
        )
        return time.time() - t0, (row["cs"], round(row["ds"] or 0.0, 3))

    # plan+compile OVERHEAD in isolation: a 1-row corpus pays plan
    # analysis + codegen but ~zero scan. Literal methods (codegen,
    # bulk) grow with k*dim; broadcast ships the matrix as data and
    # stays flat. This is the term that makes literal centroids
    # unusable at large k.
    print("  -- plan/compile overhead (1-row corpus) --", flush=True)
    for k in (256, 1024, 4096):
        for method in ("codegen", "bulk", "broadcast"):
            dt, _ = assign_sum(one_row, base_vecs[:k], method)
            print(f"  k={k:5d} {method:9s} overhead: {dt:7.2f}s", flush=True)
    # the verdict's measured row: k=1024 full 64x scan, literal-codegen
    # vs broadcast, checksummed identical. (k=4096 full-scan rows are
    # deliberately absent: the overhead rows above already disqualify
    # literal methods there, and the broadcast execution cost is the
    # same per-centroid arithmetic as k=1024, linearly scaled.)
    print("  -- full 64x scan, k=1024 --", flush=True)
    sums = {}
    for method in ("codegen", "broadcast"):
        dt, chk = assign_sum(wide, base_vecs[:1024], method)
        sums[method] = chk
        print(
            f"  k= 1024 {method:9s}: {dt:7.2f}s  checksum="
            f"(sum_cluster={chk[0]}, sum_dist~{chk[1]})",
            flush=True,
        )
    tag = ("IDENTICAL" if sums["codegen"] == sums["broadcast"]
           else "MISMATCH!")
    print(f"  k= 1024 checksums {tag}", flush=True)
    wide.unpersist()
    one_row.unpersist()


def part_b(spark, sf_dir, ui, app_id):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.joins import salted_join

    # ---- B: skew stress --------------------------------------------------
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    wide_ev = ev
    for i in range(1, 64):
        wide_ev = wide_ev.unionByName(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        )
    # plant the hot key AFTER replication: ~20% of all rows -> user 1
    skewed = wide_ev.withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(5)) == 0, F.lit(1))
        .otherwise(F.col("user_id")),
    ).persist()
    n_rows = skewed.count()
    hot = skewed.filter(F.col("user_id") == 1).count()
    dim = skewed.select("user_id").distinct().withColumn(
        "segment", F.pmod(F.col("user_id"), F.lit(7))
    ).persist()
    n_dim = dim.count()
    print(
        f"\n== B: skew stress (64x events: {n_rows} rows, hot key holds "
        f"{hot} = {100 * hot / n_rows:.1f}%, dim side {n_dim} keys) =="
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # throwaway warm-up join so run order doesn't bias the walls
    skewed.join(dim, on="user_id").groupBy("segment").count().collect()

    def run(label, skew_aqe: bool, salted: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_aqe).lower()
        )
        before = stage_ids(ui, app_id)
        t0 = time.time()
        if salted:
            out = salted_join(skewed, dim, on="user_id", salt_partitions=16)
        else:
            out = skewed.join(dim, on="user_id")
        res = out.groupBy("segment").count()
        rows = sorted(map(tuple, res.collect()))
        dt = time.time() - t0
        new = stage_ids(ui, app_id) - before
        spread = hottest_stage_spread(ui, app_id, new)
        rp50, rmx, tp50, tmx, srd = spread if spread else (0, 0, 0, 0, 0)
        print(
            f"  {label:28s}: {dt:6.2f}s  task-records p50={rp50:9.0f} "
            f"max={rmx:9.0f} spread={rmx / max(rp50, 1e-9):6.1f}x  "
            f"task-time p50={tp50:5.2f}s max={tmx:5.2f}s  "
            f"shuffle_read={srd:7.1f} MB",
            flush=True,
        )
        return rows

    r1 = run("plain join, skewJoin OFF", False, False)
    r2 = run("plain join, skewJoin ON", True, False)
    r3 = run("salted_join (16 salts)", False, True)
    print(
        "  result sets identical:",
        "YES" if r1 == r2 == r3 else "NO — INVESTIGATE",
        flush=True,
    )
    skewed.unpersist()
    dim.unpersist()


if __name__ == "__main__":
    main()
