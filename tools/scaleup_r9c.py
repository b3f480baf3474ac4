"""16x scale-up for the round-9 continuation operators: Naive Bayes
classification, token-budget mixture planning, n-gram novelty, KN
context gain, k-th-NN outlier audit, and the quality-gated mixture
curation capstone.

Protocol/caveat as tools/scaleup.py: 16x = id-offset replication of
sf0.1 (documents AND embeddings). Replication effects to read with
care: (a) NB stat tables are vocabulary-bounded — replication scales
COUNTS, not model rows, so training measures pure aggregate
throughput and scoring measures the token-keyed probe join; (b) the
novelty gram table IS corpus-sized (the one linear exchange) and
replication makes every replica gram non-novel — worst case for the
min-combine's reduction ratio is unaffected (gram keys dedup 16:1);
(c) the outlier audit holds the QUERY sample fixed while the corpus
grows 16x — the production shape (audit cost must scale linearly in
corpus size, not quadratically); (d) the capstone composes (a), (b)
and the KN chain in one plan.

Usage: python tools/scaleup_r9c.py [sf_dir]
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
        "doc_id", "text", "lang", "source"
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

    # --- Naive Bayes: train + predict ---
    from hds_functions_spark.operators.classify import (
        nb_class_stats,
        nb_predict,
        nb_token_loglik,
    )
    from hds_functions_spark.registry_ext7 import _NB_ALPHA, _NB_HOLDOUT_MOD

    for tag, d in (("1x", docs), ("16x", docs16)):
        train = d.filter(F.col("doc_id") % _NB_HOLDOUT_MOD != 0)
        score = d.filter(F.col("doc_id") % _NB_HOLDOUT_MOD == 0)
        run(f"nb_model {tag}",
            lambda train=train: nb_token_loglik(
                train, nb_class_stats(train, alpha=_NB_ALPHA),
                alpha=_NB_ALPHA))
        run(f"nb_predict {tag}",
            lambda train=train, score=score: nb_predict(
                score,
                nb_token_loglik(
                    train, nb_class_stats(train, alpha=_NB_ALPHA),
                    alpha=_NB_ALPHA),
                nb_class_stats(train, alpha=_NB_ALPHA)))

    # --- mixture plan + novelty + context gain ---
    from hds_functions_spark.functions.text import token_count
    from hds_functions_spark.operators.profiling import (
        kn_context_gain_scores,
        ngram_novelty,
    )
    from hds_functions_spark.operators.sampling import mixture_epoch_plan
    from hds_functions_spark.registry_ext7 import (
        _CG_D,
        _CG_TRAIN_MOD,
        _MIX_ALPHA,
        _MIX_BUDGET_MULT,
        _NOV_NGRAM,
    )

    for tag, d in (("1x", docs), ("16x", docs16)):
        run(f"mixture_epoch_plan {tag}",
            lambda d=d: mixture_epoch_plan(
                d.select("source", token_count(F.col("text")).alias(
                    "n_tokens")),
                alpha=_MIX_ALPHA, budget_multiplier=_MIX_BUDGET_MULT))
        run(f"text_novelty {tag}",
            lambda d=d: ngram_novelty(
                d.select("doc_id", "text"), ngram=_NOV_NGRAM))
        train = d.filter(F.col("doc_id") % _CG_TRAIN_MOD == 0).select(
            "doc_id", "text")
        run(f"context_gain {tag}",
            lambda d=d, train=train: kn_context_gain_scores(
                train, d.select("doc_id", "text"), discount=_CG_D))

    # --- outlier audit: FIXED query sample, growing corpus ---
    from hds_functions_spark.operators.similarity import knn_outlier_scores
    from hds_functions_spark.registry_ext7 import _OUT_K, _OUT_MOD

    queries = emb.filter(F.col("vec_id") % _OUT_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    run("outlier_knn 1x corpus",
        lambda: knn_outlier_scores(emb, queries, k=_OUT_K))
    run("outlier_knn 16x corpus (fixed queries)",
        lambda: knn_outlier_scores(emb16, queries, k=_OUT_K))

    # --- capstone pipeline end-to-end ---
    import hds_functions_spark.registry_ext7 as ext7

    class _FakeDirReader:
        pass

    def capstone(d):
        # replicate the registered query body over an in-memory frame
        train = d.filter(F.col("doc_id") % _CG_TRAIN_MOD == 0).select(
            "doc_id", "text")
        gain = kn_context_gain_scores(train, d.select("doc_id", "text"),
                                      discount=_CG_D)
        nov = ngram_novelty(d.select("doc_id", "text"), ngram=_NOV_NGRAM)
        base = (
            d.select("doc_id", "source",
                     token_count(F.col("text")).alias("n_tok"))
            .join(gain.select("doc_id", "context_gain"), on="doc_id")
            .join(nov.select("doc_id", "novelty"), on="doc_id")
        )
        mean_gain = base.agg(F.round(F.avg("context_gain"), 6).alias("_mg"))
        kept = base.crossJoin(F.broadcast(mean_gain)).filter(
            (F.col("context_gain") > F.col("_mg"))
            & (F.col("novelty") >= ext7._PMC_MIN_NOVELTY)
        )
        quality = kept.groupBy("source").agg(
            F.round(F.avg("context_gain"), 4).alias("mean_gain"),
            F.round(F.avg("novelty"), 4).alias("mean_novelty"),
        )
        mix = mixture_epoch_plan(
            kept.select("source", F.col("n_tok").alias("n_tokens")),
            alpha=_MIX_ALPHA, budget_multiplier=_MIX_BUDGET_MULT,
        )
        return mix.join(quality, on="source")

    run("pipeline_mixture_curation 1x", lambda: capstone(docs))
    run("pipeline_mixture_curation 16x", lambda: capstone(docs16))


if __name__ == "__main__":
    main()
