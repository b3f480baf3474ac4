"""Extension-layer query registry, part 4 (round-7 additions).

Same contract as ``registry_ext.py``: every query has a DuckDB oracle
generated from the SAME constants so both sides compute identical values
by construction. Round-7 focus: depth on existing families (VERDICT r6
item 9) — each query here also sits in the round-7 ``DRIVER_PRIORITY``
window so it lands a driver-green row the round it ships.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import ORACLES, QUERIES, _register, _t  # noqa: F401
from .registry_ext3 import (
    _BM25_B,
    _BM25_K1,
    _BM25_MAX_DF,
    _BM25_NGRAM,
    _BM25_TOPK,
    _bm25_inputs,
    _duck_bm25_scored,
)

# --- BM25 with MaxScore dynamic pruning ----------------------------------


@_register(
    "retrieval_bm25_pruned",
    f"""
WITH {_duck_bm25_scored()}
SELECT query_id, doc_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS INTEGER)
           AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id) <= {_BM25_TOPK}
""",
)
def retrieval_bm25_pruned(spark, sf_dir):
    """MaxScore dynamic pruning (Turtle & Flood; the WAND family) over
    the same corpus/queries/constants as retrieval_bm25 — and the ORACLE
    IS retrieval_bm25's full-scoring SQL: the driver hash-verifies that
    pruning is lossless, not approximately-close. Frequent (low-idf)
    query terms never join the corpus postings; a seed pass over the
    rarest terms sets the per-query threshold, the ub running total
    marks non-essential terms, and only candidate docs are scored (over
    all their terms, via the doc_id-side join that reuses the postings'
    existing hash partitioning). See operators/retrieval.py:
    bm25_topk_pruned for the exactness argument."""
    from .operators.retrieval import bm25_topk_pruned

    docs, queries = _bm25_inputs(spark, sf_dir)
    return bm25_topk_pruned(
        docs, queries, k=_BM25_TOPK,
        k1=_BM25_K1, b=_BM25_B, max_df_frac=_BM25_MAX_DF,
        term_ngram=_BM25_NGRAM,
    )
