"""Distributed BM25 retrieval over a document corpus.

The sparse-retrieval primitive a pretraining pipeline uses for
decontamination-by-retrieval (does any benchmark prompt retrieve a
training document too well?) and for nearest-document audits where no
embedding model is in the loop. No reference analogue (``hds_functions``
has no retrieval surface); part of the LLM-data-pipeline extension bar.

Spark-first shape:

- **Postings are a DataFrame, not an index structure.** ``(doc_id, term,
  tf)`` from one explode + one map-side-combinable groupBy; document
  lengths and the corpus aggregate (N, avgdl) are tiny frames attached
  by 1-row-broadcast crossJoin.
- **The scoring join is equi on the term key.** Query terms (small —
  benchmark suites are thousands of rows, corpora are billions)
  broadcast against the postings; per-(query, doc) partial scores
  combine map-side in ONE aggregate.
- **The stopword pressure valve bounds fanout.** A term matching half
  the corpus contributes ~zero idf but would explode the join
  (|queries| x df rows for that term). ``max_df_frac`` drops terms
  with df > frac * N from BOTH sides — same design as the hot-gram cap
  in :mod:`dedup` (measured there: 17.5x at 16x scale). At 100 TB this
  is the difference between a bounded join and a broadcast storm.
- **Determinism**: scores round to ``round_digits`` BEFORE the top-k
  rank (ties then break by doc_id ascending), so an oracle rounding
  identically ranks identically; the rank-filter rides Catalyst's
  WindowGroupLimit (per-partition pre-prune before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngrams

__all__ = [
    "doc_postings",
    "bm25_scores",
    "bm25_topk",
    "bm25_topk_pruned",
    "bm25_topk_auto",
    "bm25_prune_volume_ratio",
    "tfidf_doc_topk",
    "retrieval_decontam",
    "rrf_fuse",
]


def _terms(text_col: str, term_ngram: int) -> Column:
    """Lowercased whitespace-token terms; ``term_ngram > 1`` switches to
    space-joined word n-grams — the right unit when the unigram
    vocabulary is small/undiscriminative (phrase retrieval)."""
    lowered = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    if term_ngram == 1:
        return lowered
    return word_ngrams(lowered, term_ngram)


def doc_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_ngram: int = 1,
) -> DataFrame:
    """``(doc_id, term, tf)`` postings + per-doc length ``dl`` — the
    whole 'index build' is one explode and one combinable groupBy;
    whitespace tokens of lowercased trimmed text (the registry's shared
    tokenizer convention)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_terms(text_col, term_ngram)).alias("term"),
    )
    return (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
        )
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    term_ngram: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Okapi BM25 score of every (query, document) pair sharing at least
    one term: ``sum over shared terms of idf(t) * tf*(k1+1) / (tf + k1*
    (1 - b + b*dl/avgdl))`` with the always-positive idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Query terms are DISTINCT per
    query (standard for short queries; repeated prompt words do not
    multiply the score). Terms with ``df > max_df_frac * N`` are dropped
    from both sides — near-zero idf, unbounded join fanout (see module
    docstring). Output: ``(query_id, doc_id, score)`` rounded.
    """
    post, kept, qterms = _bm25_frames(
        docs, queries, doc_id_col, doc_text_col, query_id_col,
        query_text_col, k1, b, max_df_frac, term_ngram,
    )
    return (
        post.join(kept, on="term")
        .join(F.broadcast(qterms), on="term")
        .groupBy("query_id", "doc_id")
        .agg(_score_agg(k1, b, round_digits))
    )


def _bm25_frames(
    docs, queries, doc_id_col, doc_text_col, query_id_col,
    query_text_col, k1, b, max_df_frac, term_ngram,
):
    """Validate + build the three BM25 frames: corpus postings, the
    df-capped term stats (term, df, idf, _avgdl), and the distinct query
    terms. Shared by the full scorer and the max-score-pruned top-k."""
    if not 0 < max_df_frac <= 1:
        raise ValueError(f"max_df_frac must be in (0, 1] (got {max_df_frac})")
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError(f"need k1 >= 0 and 0 <= b <= 1 (got {k1}, {b})")
    if term_ngram < 1:
        raise ValueError(f"term_ngram must be >= 1 (got {term_ngram})")

    post = doc_postings(docs, doc_id_col, doc_text_col, term_ngram)
    # corpus stats: one row, broadcast everywhere; dl/avgdl count TERMS
    # (ngram occurrences), consistently with the postings
    stats = docs.agg(
        F.count(F.lit(1)).alias("_n"),
        (
            F.sum(F.size(_terms(doc_text_col, term_ngram)))
            / F.count(F.lit(1))
        ).alias("_avgdl"),
    )
    df_t = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        df_t.crossJoin(F.broadcast(stats))
        .filter(F.col("df") <= F.col("_n") * max_df_frac)
        .select(
            "term",
            "df",
            F.log(
                F.lit(1.0)
                + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
            "_avgdl",
        )
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(_terms(query_text_col, term_ngram)).alias("term"),
    ).distinct()
    return post, kept, qterms


def _score_agg(k1: float, b: float, round_digits: int):
    """The BM25 per-(query, doc) aggregate over joined posting rows
    carrying (tf, dl, idf, _avgdl) — one expression, so the full scorer
    and the pruned scorer cannot drift."""
    return F.round(
        F.sum(
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))
            )
        ),
        round_digits,
    ).alias("score")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    **kwargs,
) -> DataFrame:
    """Top-``k`` documents per query by BM25 — rank over the ROUNDED
    score (ties by doc_id ascending) so engines agree at boundaries;
    rank-then-filter rides WindowGroupLimit. Output ``(query_id, doc_id,
    score, rank)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    scored = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk_pruned(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    seed_terms: int = 2,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    term_ngram: int = 1,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` BM25 with MaxScore dynamic pruning (Turtle & Flood 1995
    / the WAND family, PAPERS.md) — returns EXACTLY :func:`bm25_topk`'s
    rows, provably, while never joining the frequent query terms'
    posting lists against the whole corpus. Two passes:

    1. **Seed**: per query, the ``seed_terms`` terms with the largest
       score upper bound ``ub(t) = idf(t) * (k1+1)`` (the highest-idf =
       RAREST terms, so their posting lists are the shortest). Docs
       holding a seed term get a PARTIAL score over the seed terms only
       — a lower bound of their full score, so the k-th best rounded
       partial is a valid (slightly loose) pruning threshold
       ``theta(q)`` at the cost of only ``|queries| * df(seed)`` pair
       rows — no full scoring in phase 1.
    2. **Prune**: sort each query's terms by ub ascending; a prefix
       whose running ub total rounds below ``theta`` is *non-essential*
       — a doc matching ONLY those terms scores ``s <= sum(ub) <
       theta`` and (rounding being monotone) ``round(s) <= round(sum
       ub) < theta``, while every doc at/above theta's partial bound
       survives, so nothing prunable can displace the true top-k. Only
       the *essential* terms' postings join the corpus; candidate docs
       (seed hits + essential hits) are then scored over ALL their
       query terms via the doc_id-side join, which reuses the postings'
       existing doc_id hash partitioning (the ``dl`` window already
       exchanged on it — at 100 TB, bucket the postings table by doc_id
       and this join is shuffle-free).

    Why this is the scale win: the full scoring join shuffles
    ``sum over query terms of df(t)`` pair rows — dominated by frequent
    terms times every query that mentions them. Pruned, the frequent
    terms (small idf => small ub => non-essential first) never fan out;
    shuffle volume drops to the candidates' own posting rows. Queries
    with fewer than ``k`` seed-scored docs get no theta and fall back to
    exact full scoring of all their term hits — still correct, never
    wrong, just unpruned.

    Output ``(query_id, doc_id, score, rank)`` — byte-identical to
    ``bm25_topk`` (the registry oracle pins this: the pruned query's
    oracle IS the full-scoring SQL).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if seed_terms < 1:
        raise ValueError(f"seed_terms must be >= 1 (got {seed_terms})")
    from ..caching import tracked_persist

    post, kept, qterms = _bm25_frames(
        docs, queries, doc_id_col, doc_text_col, query_id_col,
        query_text_col, k1, b, max_df_frac, term_ngram,
    )
    post = tracked_persist(post)
    # per-(query, term) upper bound; suite-sized frame (distinct query
    # terms only), every later per-query window runs on it
    qub = tracked_persist(
        qterms.join(kept.select("term", "idf"), on="term").select(
            "query_id", "term", (F.col("idf") * (k1 + 1)).alias("_ub")
        )
    )

    def exact_scores(cand: DataFrame) -> DataFrame:
        """Score candidate (query_id, doc_id) pairs over ALL their query
        terms: doc_id-equi join into the postings (reuses the dl
        window's hash partitioning), then the shared aggregate. No
        broadcast hint on the candidate side — it grows with df(seed
        terms), i.e. with the corpus; AQE picks broadcast when it
        measures small (the scale-gate convention)."""
        return (
            post.join(cand, on="doc_id")
            .join(F.broadcast(qterms), on=["query_id", "term"])
            .join(kept, on="term")
            .groupBy("query_id", "doc_id")
            .agg(_score_agg(k1, b, round_digits))
        )

    w_seed = Window.partitionBy("query_id").orderBy(
        F.col("_ub").desc(), F.col("term")
    )
    seed = (
        qub.withColumn("_r", F.row_number().over(w_seed))
        .filter(F.col("_r") <= seed_terms)
        .select("query_id", "term")
    )
    seed_hits = post.join(F.broadcast(seed), on="term")
    cand_seed = seed_hits.select("query_id", "doc_id").distinct()
    # partial score over seed terms only: a LOWER bound of the full
    # score (idf/tf/dl all non-negative), so its k-th best is a valid
    # pruning threshold without a full-scoring pass
    seed_partial = (
        seed_hits.join(kept, on="term")
        .groupBy("query_id", "doc_id")
        .agg(_score_agg(k1, b, round_digits))
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    theta = (
        seed_partial.withColumn("_r", F.row_number().over(w_rank))
        .filter(F.col("_r") == k)
        .select("query_id", F.col("score").alias("_theta"))
    )
    # essential terms: ascending-ub running total; a term is essential
    # once round(running total) >= theta (no theta row -> no pruning)
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy(F.col("_ub").asc(), F.col("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    essential = (
        qub.withColumn("_cum", F.sum("_ub").over(w_cum))
        .join(F.broadcast(theta), on="query_id", how="left")
        .filter(
            F.col("_theta").isNull()
            | (F.round(F.col("_cum"), round_digits) >= F.col("_theta"))
        )
        .select("query_id", "term")
    )
    cand = (
        post.join(F.broadcast(essential), on="term")
        .select("query_id", "doc_id")
        .unionByName(cand_seed)
        .distinct()
    )
    return (
        exact_scores(cand)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )


def bm25_prune_volume_ratio(
    docs: DataFrame,
    queries: DataFrame,
    seed_terms: int = 2,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 0.5,
    term_ngram: int = 1,
) -> float:
    """The MaxScore regime probe: PREDICTED pruned/full scoring-join
    volume, from a driver-free simulation of the pruning decision over
    the suite-sized ``(query, term, ub, df)`` frame.

    The regime is query-dependent, not a corpus property (a corpus-only
    idf-dispersion statistic cannot separate the measured regimes —
    tools/bm25_prune_regime.py records the failed attempt), so the
    probe replays MaxScore's own arithmetic per query with one
    approximation: the unknown threshold ``theta(q)`` (the k-th best
    seed PARTIAL score, which would cost the seed join to compute) is
    estimated as ``sum(seed ubs) / (k1+1)`` — a doc matching every
    seed term at tf=1 and dl=avgdl, the typical k-th candidate. Terms
    in a query's ascending-ub prefix whose running total stays below
    theta-hat are predicted non-essential; the prediction is

        ratio = (seed df + essential df) / total query-term df

    i.e. pruned pair rows (seed pass + candidate scoring, both
    df-proportional) over the full join's pair rows. Flat ub profiles
    predict ratio >= 1 (nothing non-essential, the seed pass is pure
    overhead); stopword-tailed profiles predict <<1. Costs ONE
    postings/df build (a corpus scan + one state-sized aggregate);
    everything after the ``kept`` join is suite-sized. Empty inputs
    return 1.0 (no reason to prune).
    """
    post, kept, qterms = _bm25_frames(
        docs, queries, doc_id_col, doc_text_col, query_id_col,
        query_text_col, k1, b, max_df_frac, term_ngram,
    )
    qub = qterms.join(
        kept.select("term", "idf", "df"), on="term"
    ).select(
        "query_id", "term", "df",
        (F.col("idf") * (k1 + 1)).alias("_ub"),
    )
    w_seed = Window.partitionBy("query_id").orderBy(
        F.col("_ub").desc(), F.col("term")
    )
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy(F.col("_ub").asc(), F.col("term"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        qub.withColumn("_seed", F.row_number().over(w_seed) <= seed_terms)
        .withColumn("_cum", F.sum("_ub").over(w_cum))
        .withColumn(
            "_theta_hat",
            F.sum(F.when(F.col("_seed"), F.col("_ub")).otherwise(0.0)).over(
                Window.partitionBy("query_id")
            ) / (k1 + 1),
        )
        .withColumn("_essential", F.col("_cum") >= F.col("_theta_hat"))
    )
    row = flagged.agg(
        F.sum("df").alias("_full"),
        F.sum(
            F.when(F.col("_seed"), F.col("df")).otherwise(0)
            + F.when(F.col("_essential"), F.col("df")).otherwise(0)
        ).alias("_pruned"),
    ).collect()[0]
    if not row._full:
        return 1.0
    return float(row._pruned) / float(row._full)


def bm25_topk_auto(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_volume_ratio: float = 0.8,
    **kwargs,
) -> DataFrame:
    """Top-``k`` BM25 with the pruning regime chosen by measurement,
    not by the caller (both regimes return byte-identical rows — this
    picks the CHEAPER one). Runs :func:`bm25_prune_volume_ratio`;
    below ``max_volume_ratio`` the predicted candidate volume makes
    :func:`bm25_topk_pruned` the win, at/above it the ub profile is
    too flat for pruning to shed volume and the seed pass is pure
    overhead (measured 1.21x shuffle on the flat synthetic corpus —
    tools/bm25_prune_regime.py), so plain :func:`bm25_topk` runs. The
    decision and the predicted ratio are logged at INFO on the
    ``hds_functions_spark.retrieval`` logger. The 0.8 default is
    calibrated by the same tool: the planted-Zipf corpus (measured
    0.58x volume, pruning wins) predicts well under it, the flat
    synthetic corpus (measured 1.21x, pruning loses) predicts >= 1.
    """
    import logging

    probe_kw = {
        key: kwargs[key]
        for key in (
            "seed_terms", "doc_id_col", "doc_text_col", "query_id_col",
            "query_text_col", "k1", "b", "max_df_frac", "term_ngram",
        )
        if key in kwargs
    }
    ratio = bm25_prune_volume_ratio(docs, queries, **probe_kw)
    prune = ratio < max_volume_ratio
    logging.getLogger("hds_functions_spark.retrieval").info(
        "bm25_topk_auto: predicted_volume_ratio=%.3f threshold=%.3f -> %s",
        ratio, max_volume_ratio, "pruned" if prune else "full",
    )
    if prune:
        return bm25_topk_pruned(docs, queries, k=k, **kwargs)
    # bm25_topk routes remaining kwargs to bm25_scores (no seed_terms)
    kwargs.pop("seed_terms", None)
    return bm25_topk(docs, queries, k=k, **kwargs)


def retrieval_decontam(
    docs: DataFrame,
    queries: DataFrame,
    threshold: float,
    **kwargs,
) -> DataFrame:
    """Decontamination-by-retrieval: per corpus document, how many
    benchmark queries retrieve it with BM25 >= ``threshold`` and the
    strongest such score — the flag list fed to the removal join.
    ONE combinable aggregate over the scored pairs; output ``(doc_id,
    n_hits, max_score)``, hit documents only."""
    scored = bm25_scores(docs, queries, **kwargs)
    return (
        scored.filter(F.col("score") >= threshold)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.max("score").alias("max_score"),
        )
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 5,
    k_rrf: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    or more per-query rankings — the standard hybrid-retrieval
    combiner: a document ranked ``r`` by a leg contributes
    ``1 / (k_rrf + r)``; legs that missed it contribute nothing.
    Rank-based fusion needs no score calibration between legs, which
    is exactly why it is THE way to combine BM25 (unbounded
    tf-saturated sums) with embedding cosine ([-1, 1]).

    Scale shape: the expensive work is the legs themselves (each
    already a bounded-candidate top-k); their outputs are
    ``|queries| * k``-row frames, so the fusion — one union, one
    combinable groupBy, one per-query window riding WindowGroupLimit —
    is suite-sized no matter the corpus. Determinism: each
    contribution is one IEEE double division; per (query, doc) at most
    one row per leg is summed (callers pass top-k frames, where
    (query, doc) is unique per leg), and the fused score is rounded to
    ``round_digits`` BEFORE the final rank (ties by doc id), so a SQL
    oracle summing the same contributions ranks identically. With two
    legs the sum is a single commutative add — bit-exact in any
    aggregation order; callers fusing 4+ legs should lower
    ``round_digits`` if they need cross-engine hash equality.

    Output: ``(query_id, doc_id, rrf_score, n_legs, rank)`` with
    ``rank <= k`` per query.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if k_rrf < 0:
        raise ValueError(f"k_rrf must be >= 0 (got {k_rrf})")
    if len(rankings) < 2:
        raise ValueError(
            f"rrf_fuse needs at least 2 rankings (got {len(rankings)})"
        )
    contrib = None
    for leg in rankings:
        c = leg.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(rank_col)))
            .alias("_c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("_c"), round_digits).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_legs"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def tfidf_doc_topk(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_ngram: int = 2,
    max_df_frac: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` nearest documents per document by TF-IDF cosine — the
    classic all-pairs similarity search (APSS) over the sparse term
    space, the no-embedding-model complement to the dense
    ``similarity.cosine_topk``: MinHash answers "are these sets of
    shingles similar", this answers "do these documents emphasise the
    same DISCRIMINATIVE terms" (weighted, not set-based).

    Plan: postings -> df-capped idf weights (``w = tf * idf``,
    ``idf = ln(1 + N/df)``) -> per-doc norms (one combinable groupBy)
    -> term-keyed self-join (never all-pairs; the df cap bounds
    per-term fanout at ``(max_df_frac * N)^2`` — the hot-gram-cap
    design, and as with ``ngram_jaccard_pairs`` the cosine is computed
    over the KEPT terms on both sides, so it stays a true cosine over
    that vocabulary) -> both directions of each pair -> rank riding
    WindowGroupLimit. Cosines round to ``round_digits`` before the
    rank (ties then break by neighbour id), so a SQL oracle ranks
    identically. Output ``(doc_id, neighbor_id, cosine, rank)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if not 0 < max_df_frac <= 1:
        raise ValueError(f"max_df_frac must be in (0, 1] (got {max_df_frac})")
    from ..caching import tracked_persist

    post = doc_postings(docs, id_col, text_col, term_ngram).drop("dl")
    stats = docs.agg(F.count(F.lit(1)).alias("_n"))
    df_t = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        df_t.crossJoin(F.broadcast(stats))
        .filter(F.col("df") <= F.col("_n") * max_df_frac)
        .select(
            "term",
            F.log(F.lit(1.0) + F.col("_n") / F.col("df")).alias("idf"),
        )
    )
    w = tracked_persist(
        post.join(kept, on="term").select(
            "doc_id", "term", (F.col("tf") * F.col("idf")).alias("w")
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    a = w.select(
        F.col("term"), F.col("doc_id").alias("id_a"), F.col("w").alias("wa")
    )
    b = w.select(
        F.col("term"), F.col("doc_id").alias("id_b"), F.col("w").alias("wb")
    )
    dots = (
        a.join(b, on="term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = (
        dots.join(
            norms.select(
                F.col("doc_id").alias("id_a"), F.col("norm").alias("_na")
            ),
            on="id_a",
        )
        .join(
            norms.select(
                F.col("doc_id").alias("id_b"), F.col("norm").alias("_nb")
            ),
            on="id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("dot") / (F.col("_na") * F.col("_nb")), round_digits
            ).alias("cosine"),
        )
    )
    both = cos.select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").alias("neighbor_id"),
        "cosine",
    ).unionByName(
        cos.select(
            F.col("id_b").alias("doc_id"),
            F.col("id_a").alias("neighbor_id"),
            "cosine",
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        both.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )
