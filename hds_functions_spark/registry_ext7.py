"""Extension-layer query registry, part 7 (round-9 continuation).

Same contract as ``registry_ext.py``: every query has a DuckDB oracle
generated from the SAME constants so both sides compute identical
values by construction. This part: the closed-form multinomial Naive
Bayes text classifier (the fasttext-shaped language-ID / quality /
domain-routing filter every pretraining pipeline carries), trained and
scored entirely with Spark aggregations — plus downstream curation
queries built on it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import ORACLES, QUERIES, _register, _t  # noqa: F401

# --- multinomial Naive Bayes language classifier ----------------------------

#: add-alpha smoothing for token likelihoods
_NB_ALPHA = 1.0
#: holdout: every ``mod``-th doc is scored, the rest train
_NB_HOLDOUT_MOD = 5
#: model-inspection query keeps tokens observed at least this often
_NB_MIN_CNT = 5

#: DuckDB mirror of ``functions.text.tokens`` + per-token lower()
_NB_DUCK_TOK = (
    "CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)


def _duck_nb_model_cte() -> str:
    """CTE chain ending in ``ll(token, label, cnt, log_lik)`` +
    ``stats(label, n_docs, n_tokens, vocab_size, log_prior, floor_ll)``
    — the oracle mirror of :func:`operators.classify.nb_class_stats` /
    :func:`nb_token_loglik` trained on the ``doc_id % mod <> 0`` slice
    with ``lang`` as the label."""
    a, mod = _NB_ALPHA, _NB_HOLDOUT_MOD
    return f"""
tok_train AS (
  SELECT lang AS label, doc_id, unnest({_NB_DUCK_TOK}) AS token
  FROM documents WHERE doc_id % {mod} <> 0),
cls AS (
  SELECT label, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens
  FROM tok_train GROUP BY 1),
vtot AS (SELECT count(DISTINCT token) AS v FROM tok_train),
ndtot AS (SELECT count(DISTINCT doc_id) AS ndocs FROM documents
          WHERE doc_id % {mod} <> 0),
stats AS (
  SELECT label, n_docs, n_tokens, v AS vocab_size,
         ln(n_docs / (1.0 * ndocs)) AS log_prior,
         ln({a} / (n_tokens + {a} * v)) AS floor_ll
  FROM cls CROSS JOIN vtot CROSS JOIN ndtot),
cnts AS (
  SELECT token, label, count(*) AS cnt FROM tok_train GROUP BY 1, 2),
ll AS (
  SELECT token, cnts.label, cnt,
         ln((cnt + {a}) / (n_tokens + {a} * vocab_size)) AS log_lik
  FROM cnts JOIN stats ON cnts.label = stats.label)
"""


def _duck_nb_predict_cte() -> str:
    """Extends the model CTEs with ``pred(doc_id, label_pred, score,
    n_invocab)`` — the oracle mirror of
    :func:`operators.classify.nb_predict` over the holdout slice."""
    mod = _NB_HOLDOUT_MOD
    return f"""{_duck_nb_model_cte()},
tok_score AS (
  SELECT doc_id, token, count(*) AS cnt_d
  FROM (SELECT doc_id, unnest({_NB_DUCK_TOK}) AS token
        FROM documents WHERE doc_id % {mod} = 0)
  GROUP BY 1, 2),
deltas AS (
  SELECT doc_id, ll.label,
         sum(cnt_d * (log_lik - floor_ll)) AS delta
  FROM tok_score JOIN ll USING (token)
  JOIN stats ON ll.label = stats.label
  GROUP BY 1, 2),
inv AS (
  SELECT doc_id, CAST(sum(cnt_d) AS BIGINT) AS n_invocab
  FROM tok_score
  WHERE token IN (SELECT DISTINCT token FROM ll)
  GROUP BY 1),
scored AS (
  SELECT d.doc_id, stats.label,
         coalesce(inv.n_invocab, 0) AS n_invocab,
         round(stats.log_prior
               + coalesce(inv.n_invocab, 0) * stats.floor_ll
               + coalesce(deltas.delta, 0.0), 6) AS score
  FROM (SELECT doc_id FROM documents WHERE doc_id % {mod} = 0) d
  CROSS JOIN stats
  LEFT JOIN inv ON d.doc_id = inv.doc_id
  LEFT JOIN deltas ON d.doc_id = deltas.doc_id
                  AND stats.label = deltas.label),
pred AS (
  SELECT doc_id, label AS label_pred, score, n_invocab
  FROM scored
  QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, label) = 1)
"""


def _nb_slices(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    train = docs.filter(F.col("doc_id") % _NB_HOLDOUT_MOD != 0)
    score = docs.filter(F.col("doc_id") % _NB_HOLDOUT_MOD == 0)
    return train, score


def _nb_predictions(spark, sf_dir):
    from .operators.classify import nb_class_stats, nb_predict, nb_token_loglik

    train, score = _nb_slices(spark, sf_dir)
    stats = nb_class_stats(train, alpha=_NB_ALPHA)
    model = nb_token_loglik(train, stats, alpha=_NB_ALPHA)
    return score, nb_predict(score, model, stats)


@_register(
    "classify_nb_model",
    f"""
WITH {_duck_nb_model_cte()}
SELECT token, label, cnt, round(log_lik, 6) AS log_lik
FROM ll WHERE cnt >= {_NB_MIN_CNT}
""",
)
def classify_nb_model(spark, sf_dir):
    """The trained sparse NB model (tokens observed >= {m} times):
    per-(token, label) add-{a}-smoothed log-likelihoods over the
    training slice. Training is two map-side-combinable groupBys plus a
    broadcast of the C-row class-stats frame — closed form, one pass,
    no iteration (operators/classify.py module doc). The min-count
    filter bounds the INSPECTION output only; scoring uses the full
    sparse model.""".format(m=_NB_MIN_CNT, a=_NB_ALPHA)
    from .operators.classify import nb_class_stats, nb_token_loglik

    train, _ = _nb_slices(spark, sf_dir)
    stats = nb_class_stats(train, alpha=_NB_ALPHA)
    model = nb_token_loglik(train, stats, alpha=_NB_ALPHA)
    return model.filter(F.col("cnt") >= _NB_MIN_CNT).select(
        "token", "label", "cnt", F.round("log_lik", 6).alias("log_lik")
    )


@_register(
    "classify_nb_predict",
    f"""
WITH {_duck_nb_predict_cte()}
SELECT pred.doc_id, d.lang, label_pred, score, n_invocab
FROM pred JOIN documents d ON pred.doc_id = d.doc_id
""",
)
def classify_nb_predict(spark, sf_dir):
    """Held-out language-ID predictions (every {mod}-th doc): the
    sparse-delta NB argmax with the true label attached. The doc
    explode joins the model on ``token`` only; per-(doc, class) deltas
    combine map-side; the argmax is a C-row-per-doc window over scores
    ROUNDED before ranking so cross-engine ulp drift cannot flip the
    prediction.""".format(mod=_NB_HOLDOUT_MOD)
    score, pred = _nb_predictions(spark, sf_dir)
    return pred.join(
        score.select("doc_id", "lang"), on="doc_id"
    ).select(
        "doc_id",
        "lang",
        "label_pred",
        "score",
        F.col("n_invocab").cast("long").alias("n_invocab"),
    )


@_register(
    "classify_nb_confusion",
    f"""
WITH {_duck_nb_predict_cte()}
SELECT d.lang, label_pred, count(*) AS n,
       CAST(sum(CASE WHEN d.lang = label_pred THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct
FROM pred JOIN documents d ON pred.doc_id = d.doc_id
GROUP BY 1, 2
""",
)
def classify_nb_confusion(spark, sf_dir):
    """Language-ID confusion matrix over the holdout: (true lang,
    predicted label, count). The classifier's quality-gate view — in a
    curation pipeline this is the audit table that decides whether the
    filter is trustworthy enough to route documents. Output is at most
    C^2 rows.""".format()
    score, pred = _nb_predictions(spark, sf_dir)
    return (
        pred.join(score.select("doc_id", "lang"), on="doc_id")
        .groupBy("lang", "label_pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("lang") == F.col("label_pred"), 1).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
    )
