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


# --- triangle counting on the similarity graph ---------------------------

_TRI_MIN_JACCARD = 0.5


def _duck_triangles_sql() -> str:
    from .registry_ext import _duck_minhash_sql

    return f"""
WITH mh AS (SELECT * FROM ({_duck_minhash_sql()})),
e AS (SELECT id_a AS a, id_b AS b FROM mh
      WHERE est_jaccard >= {_TRI_MIN_JACCARD}),
deg AS (SELECT n, count(*) AS deg
        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1),
o AS (SELECT CASE WHEN (da.deg, a) < (db.deg, b) THEN a ELSE b END AS u,
             CASE WHEN (da.deg, a) < (db.deg, b) THEN b ELSE a END AS v
      FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n),
w AS (SELECT e1.u AS u, e1.v AS x, e2.v AS y
      FROM o e1 JOIN o e2 ON e1.u = e2.u WHERE e1.v < e2.v),
t AS (SELECT w.u, w.x, w.y
      FROM w JOIN (SELECT least(u, v) AS x, greatest(u, v) AS y FROM o) c
      USING (x, y)),
corners AS (SELECT unnest([u, x, y]) AS node FROM t)
SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY 1
"""


@_register("graph_triangles", None)  # oracle attached below
def graph_triangles(spark, sf_dir):
    """Per-node triangle counts over the MinHash similarity graph
    (edges = LSH candidate pairs with est_jaccard >= 0.5 — the same
    edge set the connected-components dedup consumes): the local
    clustering signal that separates core near-duplicates (deep in a
    near-clique, many triangles) from bridge documents chaining two
    unrelated clusters together (few). Degree-ordered compact-forward
    scheme — sum(outdeg^2) <= m^1.5 wedge fanout, each triangle found
    once at its smallest apex; see operators/graph.py:triangle_count."""
    from .operators.graph import triangle_count
    from .operators.dedup import minhash_pairs
    from .registry_ext import _MH_BANDS, _MH_NUM_HASHES, _MH_SHINGLE

    docs = _t(spark, sf_dir, "documents").filter(
        F.length("text") >= _MH_SHINGLE
    )
    pairs = minhash_pairs(
        docs,
        num_hashes=_MH_NUM_HASHES,
        shingle_size=_MH_SHINGLE,
        bands=_MH_BANDS,
    ).filter(F.col("est_jaccard") >= _TRI_MIN_JACCARD)
    return triangle_count(pairs, "id_a", "id_b")


ORACLES["graph_triangles"] = _duck_triangles_sql()
