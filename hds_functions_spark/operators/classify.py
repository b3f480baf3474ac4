"""Distributed multinomial Naive Bayes text classification.

The fasttext-shaped curation tool every large pretraining pipeline
carries — a linear bag-of-words classifier used for language ID,
quality scoring (e.g. the GPT-3 / LLaMA "looks like Wikipedia/books"
filter), and domain routing — expressed as pure Spark aggregations.
Multinomial NB is the one text classifier whose training is CLOSED
FORM: the model is two combinable groupBys over the training corpus,
so it trains in a single pass at any scale with no driver-side
iteration, no gradient loop, no collect. Extension layer — no
reference counterpart (SURVEY.md §7).

Spark-first shape:

- **Training is two map-side-combinable groupBys**: token counts per
  ``(token, label)`` and document/token totals per ``label``. The
  model stays SPARSE — only observed (token, label) pairs are
  materialised; smoothing for unobserved pairs is carried by a
  per-class floor scalar, never a vocab × classes densify (at 100 TB
  the vocab is billions of rows; the floor trick keeps model size =
  observed pairs, which token frequency caps far below vocab × C).
- **Scoring uses the sparse-delta identity**: with add-``alpha``
  smoothing over the training vocab V,

      score(d, c) = log_prior(c)
                  + n_invocab(d) * floor(c)
                  + sum_{t in d, (t,c) observed} cnt_d(t) * (ll(t,c) - floor(c))

  where ``floor(c) = ln(alpha / (tokens(c) + alpha * |V|))`` is the
  smoothed log-likelihood of any class-unseen vocab token. The doc
  explode joins the sparse model once on ``token`` (broadcast when the
  model fits, shuffle-on-token otherwise — never on doc), partial sums
  combine map-side, and the tiny class-stats frame (C rows) broadcasts
  into the final per-(doc, class) frame. Out-of-vocabulary tokens are
  dropped (they shift every class score equally up to smoothing and
  carry no training signal).
- **Argmax is a C-row-per-doc window**, ordered by the rounded score
  then label — deterministic across engines, retries, partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = [
    "nb_token_counts",
    "nb_class_stats",
    "nb_token_loglik",
    "nb_predict",
]


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(doc_id, token)`` lowercased whitespace-token explode."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    ).select("doc_id", F.lower(F.col("_t")).alias("token"))


def nb_token_counts(
    train_docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Observed-pair counts ``(token, label, cnt)`` — the ONE training
    explode both model halves derive from. :func:`nb_class_stats` and
    :func:`nb_token_loglik` each accept it precomputed (``token_counts=``)
    so a caller building both (the usual case) persists this frame once
    instead of running the tokenise/explode scan once per half —
    profiled r17: the two halves' explodes ran as twin ~941 KB-shuffle
    stages (9.0 s + 5.2 s task time) that neither exchange reuse nor a
    shared cache deduplicated, because the subplans differ below each
    consumer's join."""
    return (
        train_docs.select(
            F.col(label_col).alias("label"),
            F.explode(tokens(F.col(text_col))).alias("_t"),
        )
        .select("label", F.lower(F.col("_t")).alias("token"))
        .groupBy("token", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def nb_class_stats(
    train_docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Per-class model scalars: ``(label, n_docs, n_tokens, vocab_size,
    log_prior, floor_ll)``.

    ``log_prior = ln(n_docs_c / n_docs_total)``;
    ``floor_ll = ln(alpha / (n_tokens_c + alpha * |V|))`` — the smoothed
    log-likelihood of a vocab token the class never saw. ``|V|`` is the
    training vocabulary size (distinct lowercased tokens across ALL
    classes), attached via a 1-row crossJoin (the BM25 stats pattern).
    Output is C rows — broadcast-sized by construction.

    Token-dimension statistics (``n_tokens``, ``|V|``) derive from the
    :func:`nb_token_counts` frame (pass ``token_counts=`` to share one
    persisted copy with :func:`nb_token_loglik`): ``n_tokens_c`` is the
    exact integer ``sum(cnt)`` per label and ``|V|`` the distinct-token
    count over observed pairs — identical values to aggregating the raw
    explode. Doc-dimension statistics come from ONE tokenless pass over
    ``train_docs``: ``n_docs_c`` counts distinct ids among docs with at
    least one token (exactly the ids the explode would surface)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha})")
    tc = (
        token_counts
        if token_counts is not None
        else nb_token_counts(train_docs, label_col, text_col)
    )
    per_class = (
        train_docs.filter(F.size(tokens(F.col(text_col))) > 0)
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .join(
            tc.groupBy("label").agg(F.sum("cnt").alias("n_tokens")),
            on="label",
        )
    )
    totals = tc.select(
        F.count_distinct("token").alias("_v"),
    ).crossJoin(
        train_docs.select(
            F.count_distinct(F.col(id_col)).alias("_nd")
        )
    )
    return per_class.crossJoin(F.broadcast(totals)).select(
        "label",
        "n_docs",
        "n_tokens",
        F.col("_v").alias("vocab_size"),
        F.log(F.col("n_docs") / F.col("_nd")).alias("log_prior"),
        F.log(
            F.lit(float(alpha))
            / (F.col("n_tokens") + F.lit(float(alpha)) * F.col("_v"))
        ).alias("floor_ll"),
    )


def nb_token_loglik(
    train_docs: DataFrame,
    class_stats: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Sparse smoothed model ``(token, label, cnt, log_lik)`` over
    OBSERVED (token, label) pairs only:
    ``log_lik = ln((cnt + alpha) / (n_tokens_c + alpha * |V|))``.

    One map-side-combinable groupBy over the token explode (or the
    precomputed/persisted :func:`nb_token_counts` frame), then a
    broadcast join to the C-row class stats. Unobserved pairs are NOT
    materialised — scoring carries them via ``floor_ll`` (module doc)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (got {alpha})")
    counts = (
        token_counts
        if token_counts is not None
        else nb_token_counts(train_docs, label_col, text_col)
    )
    return counts.join(
        F.broadcast(class_stats.select("label", "n_tokens", "vocab_size")),
        on="label",
    ).select(
        "token",
        "label",
        "cnt",
        F.log(
            (F.col("cnt") + F.lit(float(alpha)))
            / (F.col("n_tokens") + F.lit(float(alpha)) * F.col("vocab_size"))
        ).alias("log_lik"),
    )


def nb_predict(
    score_docs: DataFrame,
    token_loglik: DataFrame,
    class_stats: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document class scores and the argmax prediction:
    ``(doc_id, label_pred, score, n_invocab)``.

    Implements the sparse-delta identity from the module doc. The doc
    token explode joins the sparse model on ``token`` only (Spark/AQE
    picks broadcast when the model is small; at vocab scale this is a
    shuffle on token, never on doc_id, so skewed documents don't skew
    the join). Per-(doc, class) deltas combine map-side; documents and
    classes then densify through a crossJoin against the C-row stats
    frame so a doc scores against EVERY class even when it shares no
    observed pair with it. Scores round to ``round_digits`` before the
    deterministic (score desc, label asc) argmax window so cross-engine
    ulp drift cannot flip ranks. Docs with zero in-vocab tokens score
    ``log_prior`` for every class (argmax = the prior mode)."""
    tok = (
        _doc_tokens(score_docs, id_col, text_col)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt_d"))
    )
    # sparse deltas: only (doc, class) pairs sharing an observed token
    deltas = (
        tok.join(
            token_loglik.select("token", "label", "log_lik"), on="token"
        )
        .join(F.broadcast(class_stats.select("label", "floor_ll")), on="label")
        .groupBy("doc_id", "label")
        .agg(
            F.sum(
                F.col("cnt_d") * (F.col("log_lik") - F.col("floor_ll"))
            ).alias("delta")
        )
    )
    # in-vocab token mass per doc (vocab = distinct model tokens)
    vocab = token_loglik.select("token").distinct()
    inv = (
        tok.join(vocab, on="token")
        .groupBy("doc_id")
        .agg(F.sum("cnt_d").alias("n_invocab"))
    )
    base = (
        score_docs.select(F.col(id_col).alias("doc_id"))
        .crossJoin(
            F.broadcast(class_stats.select("label", "log_prior", "floor_ll"))
        )
        .join(inv, on="doc_id", how="left")
        .withColumn("n_invocab", F.coalesce(F.col("n_invocab"), F.lit(0)))
    )
    scored = base.join(deltas, on=["doc_id", "label"], how="left").select(
        "doc_id",
        "label",
        "n_invocab",
        F.round(
            F.col("log_prior")
            + F.col("n_invocab") * F.col("floor_ll")
            + F.coalesce(F.col("delta"), F.lit(0.0)),
            round_digits,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("label").alias("label_pred"), "score", "n_invocab")
    )
