"""16x scale-up for the round-10 persisted-index incremental ANN and
embedding-decontamination operators.

Protocol/caveat as tools/scaleup.py: 16x = id-offset replication of
sf0.1 embeddings. The A/Bs that matter here:

- IVF: probe-a-PERSISTED-index vs full rebuild+probe at 16x — the
  saving the persistence exists for (corpus assignment not repeated
  per batch);
- PQ: the fixed-size ingest-encode must be FLAT in corpus scale (a
  pure projection over the batch against literal codebooks), while
  train+encode+save is the one-time cost that scales;
- embedding decontam at 1x/16x (NOTE: the hash-split eval set grows
  with the corpus under replication — both sides widen 16x, the worst
  case; organic growth keeps the eval side benchmark-sized).

Usage: python tools/scaleup_r10.py [sf_dir]
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

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def widen(df, id_cols, times=16):
        maxes = df.agg(*[F.max(c).alias(c) for c in id_cols]).collect()[0]
        out = df
        for i in range(1, times):
            rep = df
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * (maxes[c] + 1)))
            out = out.unionByName(rep)
        return out

    emb16 = widen(emb, ["vec_id"])

    import hds_functions_spark.registry_ext  # noqa: F401  (registry chain head)
    from hds_functions_spark.operators.contamination import (
        embedding_contamination,
    )
    from hds_functions_spark.operators.sampling import split_bucket
    from hds_functions_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_index_build,
        ivf_probe_index,
        pq_adc_topk,
        pq_codebooks_from_rows,
        pq_codebooks_to_rows,
        pq_encode,
        pq_train,
    )
    from hds_functions_spark.registry_ext8 import (
        _ANN_CENTROIDS,
        _ANN_K,
        _ANN_MOD,
        _ANN_PROBE,
        _ANN_REM,
    )
    from hds_functions_spark.sources.tables import load_table, save_table

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:52s}: {dt:6.1f}s  out_rows={n}")
        return dt

    # fixed probe batch at BOTH scales: the 1x table's ingest slice
    batch = emb.filter(F.col("vec_id") % _ANN_MOD == _ANN_REM).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    tmp = tempfile.mkdtemp(prefix="hds_scaleup_r10_")
    try:
        for tag, corpus in (("1x", emb), ("16x", emb16)):
            td = {
                "idx": {
                    "path": os.path.join(tmp, f"idx_{tag}"),
                    "format": "parquet",
                }
            }
            # one-time build + save (the cost persistence amortises)
            run(
                f"ivf build+save {tag}",
                lambda c=corpus, td=td: (
                    save_table(
                        ivf_index_build(c, n_centroids=_ANN_CENTROIDS),
                        "idx", td, partition_by="centroid_id",
                    ),
                    load_table("idx", td).limit(1),
                )[1],
            )
            loaded = load_table("idx", td)
            # per-batch probe of the persisted index (the recurring cost)
            run(
                f"ivf probe persisted (fixed batch) {tag}",
                lambda ld=loaded: ivf_probe_index(
                    ld, batch, k=_ANN_K,
                    n_centroids=_ANN_CENTROIDS, n_probe=_ANN_PROBE,
                ),
            )
            # what a batch WOULD cost without the saved index
            run(
                f"ivf full rebuild+probe {tag}",
                lambda c=corpus: ivf_cosine_topk(
                    c, batch, k=_ANN_K,
                    n_centroids=_ANN_CENTROIDS, n_probe=_ANN_PROBE,
                ),
            )

        # --- PQ: one-time vs recurring ---
        for tag, corpus in (("1x", emb), ("16x", emb16)):
            td = {
                "codes": {
                    "path": os.path.join(tmp, f"codes_{tag}"),
                    "format": "parquet",
                },
                "books": {
                    "path": os.path.join(tmp, f"books_{tag}"),
                    "format": "parquet",
                },
            }
            books_box = {}

            def train_save(c=corpus, td=td, bb=books_box):
                bb["books"] = pq_train(
                    c, m=4, k=8, n_iter=2, dim=64, round_digits=4
                )
                save_table(pq_encode(c, bb["books"]), "codes", td)
                save_table(
                    pq_codebooks_to_rows(spark, bb["books"]), "books", td
                )
                return load_table("codes", td).limit(1)

            run(f"pq train+encode+save {tag}", train_save)
            books = pq_codebooks_from_rows(load_table("books", td))
            codes = load_table("codes", td)
            run(
                f"pq ingest-encode fixed batch {tag}",
                lambda b=books: pq_encode(
                    batch.withColumnRenamed("query_id", "vec_id"), b
                ),
            )
            run(
                f"pq adc probe persisted (fixed batch) {tag}",
                lambda c=codes, b=books: pq_adc_topk(c, batch, b, k=5),
            )

        # --- embedding decontam (both sides widen under replication) ---
        for tag, corpus in (("1x", emb), ("16x", emb16)):
            bucket = split_bucket("vec_id", "decontam")
            cor = corpus.filter(bucket >= 1000)
            ev = corpus.filter(bucket < 1000).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            run(
                f"embedding decontam {tag}",
                lambda c=cor, e=ev: embedding_contamination(
                    ivf_index_build(c, n_centroids=_ANN_CENTROIDS),
                    e, threshold=0.3,
                    n_centroids=_ANN_CENTROIDS, n_probe=_ANN_PROBE,
                ),
            )

        # --- embedding decontam, ORGANIC shape: the eval set stays
        # benchmark-sized (the 1x split slice) while the corpus widens —
        # production eval sets do not grow with the corpus
        ev_fixed = emb.filter(split_bucket("vec_id", "decontam") < 1000).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for tag, corpus in (("1x", emb), ("16x", emb16)):
            cor = corpus.filter(split_bucket("vec_id", "decontam") >= 1000)
            run(
                f"embedding decontam FIXED eval {tag}",
                lambda c=cor: embedding_contamination(
                    ivf_index_build(c, n_centroids=_ANN_CENTROIDS),
                    ev_fixed, threshold=0.3,
                    n_centroids=_ANN_CENTROIDS, n_probe=_ANN_PROBE,
                ),
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
