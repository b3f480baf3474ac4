"""BM25 MaxScore pruning: measure the two cost regimes.

The registry's `retrieval_bm25_pruned` is gated for EXACTNESS (its
oracle is the full-scoring SQL); this tool measures WHEN the pruning
pays. Two corpora at matched size:

1. `testdata` — the synthetic sf documents table (bigram config, the
   registry constants): near-uniform term df profile, the adversarial
   regime for MaxScore (every term is similarly discriminative, so few
   terms are non-essential).
2. `zipf` — a planted Zipfian corpus (the shape of real text): each doc
   carries 1-2 rare topic terms plus a long frequent tail; queries mix
   one topic term with stopword-tier terms. The frequent tail dominates
   sum(df) in the full scoring join but is provably non-essential, so
   pruning skips it.

Metric: pair rows entering the score aggregate (the shuffle volume the
100 TB story cares about) + wall clock, full vs pruned.

Usage: python tools/bm25_prune_regime.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def zipf_corpus(spark, n_docs=20000, vocab=400, doc_len=40, seed=11):
    """Deterministic planted-Zipf corpus, generated distributed: term
    ranks drawn ~ Zipf(alpha~1.0) via inverse-CDF over xxhash64 draws;
    each doc also gets topic term 'topic<doc_id % 500>' (df ~ n/500)."""
    from pyspark.sql import functions as F

    # harmonic-number inverse CDF as a literal map: rank r has mass 1/r
    hs = []
    total = sum(1.0 / r for r in range(1, vocab + 1))
    acc = 0.0
    for r in range(1, vocab + 1):
        acc += 1.0 / r / total
        hs.append(acc)
    cdf = F.array(*[F.lit(x) for x in hs])
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    words = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.lit(doc_len))).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        (
            (F.abs(F.xxhash64("doc_id", "pos", F.lit(seed)))
             % 1000000) / 1000000.0
        ).alias("u"),
    ).select(
        "doc_id",
        "pos",
        F.concat(
            F.lit("w"),
            F.size(F.filter(cdf, lambda c: c < F.col("u"))).cast("string"),
        ).alias("w"),
    )
    body = words.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "w"))
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("body")
    )
    return body.select(
        "doc_id",
        F.concat(
            F.lit("topic"), (F.col("doc_id") % 500).cast("string"),
            F.lit(" "), F.col("body"),
        ).alias("text"),
    )


def measure(docs, queries, label, term_ngram, max_df_frac, k=5):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_pruned,
        _bm25_frames,
    )

    kw = dict(term_ngram=term_ngram, max_df_frac=max_df_frac)
    post, kept, qterms = _bm25_frames(
        docs, queries, "doc_id", "text", "query_id", "query_text",
        1.2, 0.75, max_df_frac, term_ngram,
    )
    full_pairs = post.join(kept, "term").join(qterms, "term").count()

    t0 = time.time()
    full = sorted(tuple(r) for r in bm25_topk(docs, queries, k=k, **kw).collect())
    t_full = time.time() - t0
    t0 = time.time()
    pruned = sorted(
        tuple(r) for r in bm25_topk_pruned(docs, queries, k=k, **kw).collect()
    )
    t_pruned = time.time() - t0
    assert pruned == full, f"{label}: pruned != full"

    # pruned-path pair rows (mirror of the operator's two joins)
    from pyspark.sql import Window

    k1, b = 1.2, 0.75
    qub = qterms.join(kept.select("term", "idf"), "term").select(
        "query_id", "term", (F.col("idf") * (k1 + 1)).alias("_ub"))
    w_seed = Window.partitionBy("query_id").orderBy(F.col("_ub").desc(), "term")
    seed = (qub.withColumn("_r", F.row_number().over(w_seed))
            .filter(F.col("_r") <= 2).select("query_id", "term"))
    seed_hits = post.join(F.broadcast(seed), "term")
    seed_pairs = seed_hits.count()
    cand_seed = seed_hits.select("query_id", "doc_id").distinct()
    from hds_functions_spark.operators.retrieval import _score_agg
    seed_partial = (seed_hits.join(kept, "term").groupBy("query_id", "doc_id")
                    .agg(_score_agg(k1, b, 6)))
    w_rank = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    theta = (seed_partial.withColumn("_r", F.row_number().over(w_rank))
             .filter(F.col("_r") == k).select("query_id", F.col("score").alias("_theta")))
    w_cum = (Window.partitionBy("query_id").orderBy(F.col("_ub").asc(), "term")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    essential = (qub.withColumn("_cum", F.sum("_ub").over(w_cum))
                 .join(F.broadcast(theta), "query_id", "left")
                 .filter(F.col("_theta").isNull()
                         | (F.round(F.col("_cum"), 6) >= F.col("_theta")))
                 .select("query_id", "term"))
    n_ess, n_qt = essential.count(), qub.count()
    cand = (post.join(F.broadcast(essential), "term").select("query_id", "doc_id")
            .unionByName(cand_seed).distinct())
    cand_pairs = (post.join(cand, "doc_id")
                  .join(qterms, ["query_id", "term"]).count())
    total = seed_pairs + cand_pairs
    print(f"{label}: full {full_pairs} pair rows {t_full:.1f}s | pruned "
          f"{total} ({seed_pairs} seed + {cand_pairs} cand) {t_pruned:.1f}s | "
          f"essential {n_ess}/{n_qt} terms | volume ratio {total/full_pairs:.3f}")


def main():
    from pyspark.sql import functions as F

    from hds_functions_spark.plans import build_session
    from hds_functions_spark.registry_ext3 import _bm25_inputs

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(
        master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false",
                    "spark.ui.showConsoleProgress": "false"},
    )
    docs, queries = _bm25_inputs(spark, sf_dir)
    measure(docs.cache(), queries.cache(), "testdata-bigram", 2, 0.5)

    z = zipf_corpus(spark).cache()
    zq = z.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("query_id"),
        # topic term + 8 body terms (frequent-tail-heavy, like real queries)
        F.array_join(F.slice(F.split("text", " "), 1, 9), " ").alias("query_text"),
    ).cache()
    measure(z, zq, "planted-zipf-unigram", 1, 0.9)

    # --- the auto-dispatcher: probe each corpus+suite, check it picks
    # the regime the measurements above say is cheaper. (A corpus-only
    # idf-dispersion statistic was tried first and FAILED calibration:
    # rare-term outliers push the synthetic bigram corpus's dispersion
    # to ~0.6, indistinguishable from the Zipf corpus's ~0.64, despite
    # opposite measured regimes — the regime is query-dependent, so the
    # probe simulates MaxScore per query instead.) ---
    from hds_functions_spark.operators.retrieval import (
        bm25_prune_volume_ratio,
    )

    r_flat = bm25_prune_volume_ratio(
        docs, queries, max_df_frac=0.5, term_ngram=2)
    r_zipf = bm25_prune_volume_ratio(z, zq, max_df_frac=0.9, term_ngram=1)
    pick = lambda r: "pruned" if r < 0.8 else "full"
    print(f"probe testdata-bigram   : predicted ratio={r_flat:.3f} -> "
          f"{pick(r_flat)} (measured 1.207 -> want full)")
    print(f"probe planted-zipf      : predicted ratio={r_zipf:.3f} -> "
          f"{pick(r_zipf)} (measured 0.577 -> want pruned)")
    assert pick(r_flat) == "full" and pick(r_zipf) == "pruned", \
        "auto-dispatcher picked the wrong regime"
    print("auto-dispatcher picks the measured-cheaper regime on both corpora")


if __name__ == "__main__":
    import __spark_entry__  # noqa: F401  (registry import order)
    main()
