"""Extension-layer query registry, part 5 (round-8 additions).

Same contract as ``registry_ext.py``: every query has a DuckDB oracle
generated from the SAME constants so both sides compute identical values
by construction. Round-8 focus (VERDICT r7 item 1): exact substring
deduplication — the Lee et al. suffix-family operator the pipeline was
missing — plus its removal half and an end-to-end pipeline chaining it
before decontamination.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import ORACLES, QUERIES, _register, _t  # noqa: F401

# Direct `import hds_functions_spark.registry_extN` must see every
# upstream ORACLES/QUERIES entry this module reads at import time:
# pull the chain head, which registers all earlier ext modules before
# this body continues. Via the normal chain import this resolves to
# the already-in-progress module in sys.modules (PEP 328 circular
# import), a no-op.
from . import registry_ext  # noqa: E402,F401

# --- exact duplicated-substring spans (Lee et al. 2022) -------------------

#: span detection length: every maximal range of characters covered by a
#: >=30-char substring occurring at least twice in the corpus
_XS_MIN_LEN = 30


def _duck_exact_spans_cte() -> str:
    """CTE chain ending in ``spans(doc_id, span_start, span_end,
    span_len)`` — the duplicated-substring spans both round-8 dedup
    oracles build on. Mirrors operators/dedup.py:exact_substring_spans:
    duplicated gram starts (global count >= 2 of the literal
    ``_XS_MIN_LEN``-char substring), then the per-doc gaps-and-islands
    interval merge. The Spark side's xxhash64 stage is a lossless
    pre-filter (its confirming group key is the real substring), so
    grouping directly on the substring here is the same computation.
    """
    L = _XS_MIN_LEN
    return f"""
d AS (SELECT doc_id, text FROM documents),
g AS (SELECT d.doc_id, p, substr(d.text, p, {L}) AS gram
      FROM d, LATERAL (SELECT unnest(range(1, length(d.text) - {L} + 2)) AS p)),
dupg AS (SELECT gram FROM g GROUP BY 1 HAVING count(*) >= 2),
hit AS (SELECT doc_id, p FROM g JOIN dupg USING (gram)),
brk AS (SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                         > {L} THEN 1 ELSE 0 END AS is_brk
        FROM hit),
isl AS (SELECT doc_id, p,
               sum(is_brk) OVER (PARTITION BY doc_id ORDER BY p) AS island
        FROM brk),
spans AS (SELECT doc_id,
                 CAST(min(p) AS BIGINT) AS span_start,
                 CAST(max(p) + {L} - 1 AS BIGINT) AS span_end,
                 CAST(max(p) + {L} - min(p) AS BIGINT) AS span_len
          FROM isl GROUP BY doc_id, island)"""


def _duck_span_removal_cte() -> str:
    """Extends :func:`_duck_exact_spans_cte` to ``cleaned(doc_id,
    text_clean, n_removed)`` over ALL documents: kept segments between
    consecutive spans (lag of span_end, default 0) plus the tail after
    the last span, re-concatenated in position order; span-free docs
    pass through verbatim."""
    return f"""{_duck_exact_spans_cte()},
segs AS (
    SELECT doc_id,
           lag(span_end, 1, 0) OVER (PARTITION BY doc_id
                                     ORDER BY span_start) + 1 AS seg_start,
           span_start - lag(span_end, 1, 0)
               OVER (PARTITION BY doc_id ORDER BY span_start) - 1 AS seg_len
    FROM spans
    UNION ALL
    SELECT doc_id, max(span_end) + 1 AS seg_start, NULL AS seg_len
    FROM spans GROUP BY doc_id
),
recon AS (
    SELECT s.doc_id,
           string_agg(CASE WHEN seg_len IS NULL
                           THEN substr(d.text, CAST(seg_start AS INTEGER))
                           ELSE substr(d.text, CAST(seg_start AS INTEGER),
                                       CAST(seg_len AS INTEGER)) END,
                      '' ORDER BY seg_start) AS kept
    FROM segs s JOIN d USING (doc_id) GROUP BY s.doc_id
),
cleaned AS (
    SELECT d.doc_id,
           coalesce(kept, d.text) AS text_clean,
           CAST(length(d.text) - length(coalesce(kept, d.text)) AS BIGINT)
               AS n_removed
    FROM d LEFT JOIN recon USING (doc_id)
)"""


@_register(
    "dedup_exact_spans",
    f"""
WITH {_duck_exact_spans_cte()}
SELECT * FROM spans
""",
)
def dedup_exact_spans(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): the maximal character
    ranges covered by >=30-char substrings occurring at least twice in
    the corpus — the exact-boundary operation winnowing only samples.
    Gram-hash frequency grouping (20-byte shuffle rows, never the
    grams), candidate-only substring confirmation (collision-proof),
    then a per-doc gaps-and-islands merge. See
    operators/dedup.py:exact_substring_spans."""
    from .operators.dedup import exact_substring_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_substring_spans(docs, min_len=_XS_MIN_LEN)


@_register(
    "dedup_span_removal",
    f"""
WITH {_duck_span_removal_cte()}
SELECT doc_id, text_clean, n_removed FROM cleaned
""",
)
def dedup_span_removal(spark, sf_dir):
    """Cut the exact duplicated spans out of every document (the second
    half of the Lee et al. pipeline): span-free docs pass through
    verbatim, fully-covered docs become empty strings, and the cut is
    one JVM ``aggregate`` fold over each doc's sorted span array — the
    text column never enters an exchange. The driver hash-verifies the
    full reconstructed strings, character for character. See
    operators/dedup.py:remove_duplicate_spans."""
    from .operators.dedup import exact_substring_spans, remove_duplicate_spans
    from .functions.partitioning import ensure_min_partitions

    # widen once at the source scan: remove_duplicate_spans' cut fold
    # runs on the DOCS partitioning (the text column never exchanges by
    # design), so a single-file scan pinned the whole reconstruction on
    # one core (profiled: a 2.9 s 1-task stage at sf0.1); the span
    # detector's internal widen probes become no-ops on the same exchange
    docs = ensure_min_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    spans = exact_substring_spans(docs, min_len=_XS_MIN_LEN)
    return remove_duplicate_spans(docs, spans)


# --- pipeline: exact-span dedup before decontamination --------------------

_XP_NGRAM = 5
_XP_EVAL_MOD = 97
_XP_MAX_EVAL_DF = 100

#: lowercased whitespace tokens of text_clean ('' -> empty list)
_DUCK_TOKENS_CLEAN = (
    "CASE WHEN trim(text_clean) = '' THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(lower(text_clean)), '\\s+') END"
)


def _duck_exact_dedup_prep_sql() -> str:
    return f"""
WITH {_duck_span_removal_cte()},
ltoks AS (
    SELECT doc_id, text_clean, n_removed, {_DUCK_TOKENS_CLEAN} AS t
    FROM cleaned
),
lgrams AS (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) < {_XP_NGRAM} THEN []::VARCHAR[]
             ELSE list_transform(
                 generate_series(1, len(t) - {_XP_NGRAM - 1}),
                 i -> array_to_string(t[i:i+{_XP_NGRAM - 1}], ' '))
        END)) AS gram
    FROM ltoks
),
eval_grams AS (
    SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS df
        FROM lgrams WHERE doc_id % {_XP_EVAL_MOD} = 0 GROUP BY 1
    ) WHERE df <= {_XP_MAX_EVAL_DF}
),
contaminated AS (
    SELECT DISTINCT doc_id FROM lgrams JOIN eval_grams USING (gram)
    WHERE doc_id % {_XP_EVAL_MOD} <> 0
),
final AS (
    SELECT l.doc_id, l.text_clean, l.n_removed, d2.source
    FROM ltoks l
    JOIN documents d2 ON l.doc_id = d2.doc_id
    LEFT JOIN contaminated c ON l.doc_id = c.doc_id
    WHERE c.doc_id IS NULL AND l.doc_id % {_XP_EVAL_MOD} <> 0
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text_clean)) AS BIGINT) AS total_chars,
       CAST(sum(n_removed) AS BIGINT) AS total_removed
FROM final GROUP BY 1
"""


@_register("pipeline_exact_dedup_prep", None)  # oracle attached below
def pipeline_exact_dedup_prep(spark, sf_dir):
    """The Lee et al. corpus-prep spine as ONE lazy Catalyst plan: exact
    duplicated-span REMOVAL (not just doc-level filtering — the spans
    are cut out of the surviving text) feeding 5-gram decontamination
    against a synthetic held-out benchmark (every 97th doc of the
    CLEANED corpus; contaminated docs and the benchmark itself removed),
    then per-source document / kept-char / removed-char totals. The
    decontamination runs on the POST-removal text — the ordering that
    matters in production, since a duplicated span that also hits the
    benchmark must not contaminate a doc it was already cut from."""
    from .operators.contamination import ngram_contamination
    from .operators.dedup import exact_substring_spans, remove_duplicate_spans

    from .caching import tracked_persist
    from .functions.partitioning import ensure_min_partitions

    # widen ONCE at the source scan (cheap probe on a leaf plan); the
    # persisted cleaned frame inherits the parallelism, so the
    # contamination operator skips its own probes (each would force a
    # full physical plan of the deep cleaned-subtree, ~3 s driver time)
    docs = ensure_min_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    )
    spans = exact_substring_spans(docs, min_len=_XS_MIN_LEN)
    # three consumers downstream (evals, corpus grams, final agg) — persist
    # the expensive span-detection + removal subplan once instead of
    # recomputing it per consumer
    cleaned = tracked_persist(remove_duplicate_spans(docs, spans))
    evals = cleaned.filter(F.col("doc_id") % _XP_EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_id"), F.col("text_clean")
    )
    corpus = cleaned.filter(F.col("doc_id") % _XP_EVAL_MOD != 0)
    contaminated = ngram_contamination(
        corpus,
        evals,
        text_col="text_clean",
        eval_text_col="text_clean",
        ngram=_XP_NGRAM,
        min_shared=1,
        max_eval_df=_XP_MAX_EVAL_DF,
        widen_inputs=False,
    ).select("doc_id")
    final = (
        corpus.join(contaminated, on="doc_id", how="left_anti")
        .join(docs.select("doc_id", "source"), on="doc_id")
    )
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text_clean")).cast("long").alias("total_chars"),
        F.sum("n_removed").cast("long").alias("total_removed"),
    )


ORACLES["pipeline_exact_dedup_prep"] = _duck_exact_dedup_prep_sql()

from . import registry_ext6  # noqa: E402,F401  (round-9 registrations)
