"""16x scale-up for the round-9 operators: DSIR selection, incremental
exact-substring spans, product quantization, and Kneser-Ney scoring.

Protocol/caveat as tools/scaleup.py: 16x = id-offset replication of
sf0.1 (documents AND embeddings). Replication effects to read with
care: (a) DSIR bucket distributions are scale-INVARIANT under
replication (counts scale uniformly, the log-ratio is unchanged), so
the weights stage measures pure throughput; (b) replicated docs make
every batch gram corpus-duplicated for the incremental span probe —
worst case for candidate volume; (c) PQ training cost scales with the
corpus but its state (m*k sub-centroids) does not; (d) the KN stat
tables are vocabulary-bounded — replication adds counts, not rows, so
the joins back are probe traffic.

Usage: python tools/scaleup_r9.py [sf_dir]
"""

from __future__ import annotations

import sys
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
        "doc_id", "text", "lang"
    )
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

    docs16 = widen(docs, ["doc_id"])
    emb16 = widen(emb, ["vec_id"])

    def run(label, frame_fn):
        t0 = time.time()
        out = frame_fn()
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        release_operator_caches()
        print(f"{label:40s}: {dt:6.1f}s  out_rows={n}")

    # --- DSIR: weights + selection ---
    from hds_functions_spark.operators.selection import (
        dsir_gumbel_topk,
        dsir_log_weights,
    )
    from hds_functions_spark.registry_ext6 import _DSIR_ALPHA, _DSIR_BUCKETS

    for tag, d in (("1x", docs), ("16x", docs16)):
        raw = d.filter(F.col("lang") != "en")
        tgt = d.filter(F.col("lang") == "en")
        run(f"dsir_weights {tag}",
            lambda raw=raw, tgt=tgt: dsir_log_weights(
                raw, tgt, buckets=_DSIR_BUCKETS, alpha=_DSIR_ALPHA))
        run(f"dsir_topk {tag}",
            lambda raw=raw, tgt=tgt: dsir_gumbel_topk(
                dsir_log_weights(raw, tgt, buckets=_DSIR_BUCKETS,
                                 alpha=_DSIR_ALPHA),
                k=50, salt="r9"))

    # --- incremental exact spans: fixed-size batch against a growing
    # corpus (the production shape), then 16x batch too ---
    from hds_functions_spark.operators.dedup import (
        exact_substring_spans_incremental,
    )
    from hds_functions_spark.registry_ext6 import _XSI_BATCH_MOD, _XSI_MIN_LEN

    batch1 = docs.filter(F.col("doc_id") % _XSI_BATCH_MOD == 0)
    corpus1 = docs.filter(F.col("doc_id") % _XSI_BATCH_MOD != 0)
    corpus16 = docs16.filter(F.col("doc_id") % _XSI_BATCH_MOD != 0)
    batch16 = docs16.filter(F.col("doc_id") % _XSI_BATCH_MOD == 0)
    run("xspans_inc 1x batch / 1x corpus",
        lambda: exact_substring_spans_incremental(
            batch1, corpus1, min_len=_XSI_MIN_LEN))
    run("xspans_inc 1x batch / 16x corpus",
        lambda: exact_substring_spans_incremental(
            batch1, corpus16, min_len=_XSI_MIN_LEN))
    run("xspans_inc 16x batch / 16x corpus",
        lambda: exact_substring_spans_incremental(
            batch16, corpus16, min_len=_XSI_MIN_LEN))

    # --- PQ: train (corpus-scaling fit), encode, ADC ---
    from hds_functions_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from hds_functions_spark.registry_ext6 import (
        _PQ_DIM, _PQ_ITER, _PQ_K, _PQ_M, _PQ_QUERY_MOD, _PQ_RD, _PQ_TOPK,
    )

    for tag, d in (("1x", emb), ("16x", emb16)):
        t0 = time.time()
        books = pq_train(d, m=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER, dim=_PQ_DIM,
                         round_digits=_PQ_RD)
        print(f"{'pq_train ' + tag:40s}: {time.time() - t0:6.1f}s  "
              f"(codebooks: {_PQ_M}x{_PQ_K}x{_PQ_DIM // _PQ_M})")
        queries = d.filter(F.col("vec_id") % _PQ_QUERY_MOD == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        run(f"pq_encode {tag}", lambda d=d, b=books: pq_encode(d, b))
        run(f"pq_adc_topk {tag}",
            lambda d=d, b=books, q=queries: pq_adc_topk(
                pq_encode(d, b), q, b, k=_PQ_TOPK))

    # --- Kneser-Ney: train on half, score all ---
    from hds_functions_spark.operators.profiling import (
        kn_trigram_logprob_scores,
    )

    for tag, d in (("1x", docs), ("16x", docs16)):
        train = d.filter(F.col("doc_id") % 2 == 0)
        run(f"kn_trigram {tag}",
            lambda d=d, t=train: kn_trigram_logprob_scores(t, d))

    spark.stop()


if __name__ == "__main__":
    import __spark_entry__  # noqa: F401  (registry import order: ext6's
    # recall oracle composes ORACLES entries registered by earlier parts)
    main()
