"""Extension-layer query registry: sub-document (paragraph) near-dedup
family (r16). Family-named module per the registry-maintainability
convention; same oracle contract as ``registry_ext.py``.

MassiveText-style paragraph dedup (Rae et al. 2021; the r15 verdict's
item 4): near-dedup BELOW document granularity so a syndicated
paragraph or injected boilerplate block pairs up even when the
surrounding documents are unrelated. The corpus text carries no
newline structure (TESTDATA.md), so the query synthesizes the
paragraph layout deterministically — two 80-char content windows per
document plus one boilerplate paragraph whose text is shared across
``doc_id % 120`` groups exactly (``code doc_id % 3`` injects the
near-but-not-exact variants) — the established lined-document pattern
(``clean_dedup_lines``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _register,
    _t,
)

# chain head (no-op when already importing; makes direct
# `import hds_functions_spark.registry_subdoc` self-contained)
from . import registry_ext  # noqa: E402,F401
from .registry_ext import (  # noqa: E402
    _MH_BANDS,
    _MH_NUM_HASHES,
    _MH_SHINGLE,
    _duck_minhash_sql,
)

_PP_STRIDE = 1000  # packs (doc_id, para_pos); docs here have 3 paras
_PP_WIN = 80  # content-window width (chars)
_PP_GROUPS = 120  # boilerplate text groups: doc_id % 120 share one issue
_PP_MIN_J = 0.5

# Boilerplate design notes (measured, r16): each group gets a
# DISTINCTIVE pseudo-word body — a single global template with numeric
# suffixes made ~every boiler pair >= 0.5 similar (123.5k of 124.8k doc
# pairs emitted, a quadratic blowup); per-group word sets push
# cross-group est below the threshold (2 stragglers at sf0.01). The
# mutation code uses ``(doc_id DIV groups) % 3`` — ``doc_id % 3`` is
# CONSTANT within a ``doc_id % 120`` group (120 ≡ 0 mod 3), which
# silently removed every near-but-not-exact pair.
def _pp_boiler_spark(d):
    """TWIN of ``_PP_BOILER_SQL`` — edit together."""
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda k: F.concat(
                F.lit("w"),
                (((d % _PP_GROUPS) * 13 + k * 7) % 997).cast("string"),
            ),
        ),
        " ",
    )
    return F.concat(
        F.lit("promo code "),
        F.expr(f"(doc_id DIV {_PP_GROUPS}) % 3").cast("string"),
        F.lit(" "),
        body,
    )


_PP_BOILER_SQL = (
    "('promo code ' || "
    f"CAST((doc_id // {_PP_GROUPS}) % 3 AS VARCHAR) || ' ' || "
    "array_to_string(list_transform(generate_series(0, 9), "
    f"k -> 'w' || CAST(((doc_id % {_PP_GROUPS}) * 13 + k * 7) % 997 "
    "AS VARCHAR)), ' '))"
)


def _duck_paragraph_pairs_sql() -> str:
    mh = _duck_minhash_sql(src="pp_paras", id_col="pid")
    return f"""
WITH pp_paras AS (
  SELECT doc_id * {_PP_STRIDE} + 0 AS pid,
         substr(text, 1, {_PP_WIN}) AS text FROM documents
  UNION ALL
  SELECT doc_id * {_PP_STRIDE} + 1 AS pid,
         substr(text, {_PP_WIN + 1}, {_PP_WIN}) AS text FROM documents
  UNION ALL
  SELECT doc_id * {_PP_STRIDE} + 2 AS pid,
         {_PP_BOILER_SQL} AS text FROM documents
), pp_pairs AS (
  SELECT * FROM ({mh}) WHERE est_jaccard >= {_PP_MIN_J}
    AND (id_a // {_PP_STRIDE}) <> (id_b // {_PP_STRIDE})
)
SELECT id_a // {_PP_STRIDE} AS doc_a,
       id_b // {_PP_STRIDE} AS doc_b,
       CAST(count(*) AS BIGINT) AS n_para_pairs,
       CAST(sum(CASE WHEN est_jaccard = 1.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_paras,
       max(est_jaccard) AS max_est_jaccard
FROM pp_pairs GROUP BY 1, 2
"""


@_register("dedup_paragraph_pairs", _duck_paragraph_pairs_sql())
def dedup_paragraph_pairs(spark, sf_dir):
    """Paragraph-granularity MinHash-LSH near-dedup with doc re-attach,
    rolled up to document pairs: per (doc_a, doc_b) the count of
    paragraph-level candidate pairs at est_jaccard >= 0.5, how many are
    signature-exact, and the best estimate — the MassiveText signal
    "these documents share syndicated/boilerplate blocks" that
    doc-level minhash dilutes below its threshold.

    Engine: :func:`operators.dedup.minhash_pairs_subdoc` — the packed
    ``doc_id * stride + pos`` key reuses the full banded-LSH pair
    machinery (band-hash groupBy, never a cross join; persist
    discipline) verbatim, then unpacks with exact integer DIV. Slice
    identity with doc-level minhash on single-paragraph corpora is
    pinned in tests/test_dedup.py.

    100 TB: identical shape to dedup_minhash_pairs — the paragraph
    explosion multiplies rows but every exchange still carries
    fixed-width keys/signatures, pair work stays band-collision-bound,
    and the rollup is one combinable groupBy on doc pairs."""
    from .operators.dedup import minhash_pairs_subdoc

    d = F.col("doc_id")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    paras = docs.select(
        "doc_id",
        F.posexplode(
            F.array(
                F.substring("text", 1, _PP_WIN),
                F.substring("text", _PP_WIN + 1, _PP_WIN),
                _pp_boiler_spark(d),
            )
        ).alias("para_pos", "para"),
    )
    pairs = minhash_pairs_subdoc(
        paras,
        para_stride=_PP_STRIDE,
        num_hashes=_MH_NUM_HASHES,
        shingle_size=_MH_SHINGLE,
        bands=_MH_BANDS,
        min_jaccard=_PP_MIN_J,
    )
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_para_pairs"),
        F.sum((F.col("est_jaccard") == 1.0).cast("int"))
        .cast("long")
        .alias("n_exact_paras"),
        F.max("est_jaccard").alias("max_est_jaccard"),
    )
