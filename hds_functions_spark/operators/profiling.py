"""Data-profiling operators: per-column statistics and TF-IDF term scoring.

Extension layer (SURVEY.md §7). Curation at 100 TB starts with knowing the
data: null rates, cardinalities, and the terms that characterise each
document. Both operators are single-pass compositions of built-in
aggregates — no UDFs, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens

__all__ = ["profile_columns", "tf_idf_top_terms"]


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with row/null/distinct counts
    and min/max (stringified so heterogeneous column types stack).

    Single wide aggregate over one scan — Catalyst computes all columns'
    statistics in the same hash-agg pass (contrast with calling
    ``df.agg(...)`` per column, which is one scan *each*). ``countDistinct``
    here is exact; swap for ``approx_count_distinct`` at extreme
    cardinalities where a 2% error is acceptable.
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.lit(1)).alias(f"{c}__n"),
                F.sum(
                    F.when(F.col(c).isNull(), 1).otherwise(0)
                ).alias(f"{c}__nulls"),
                F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
                F.min(F.col(c).cast("string")).alias(f"{c}__min"),
                F.max(F.col(c).cast("string")).alias(f"{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row into one row per column — the stack is
    # over a 1-row table, so this is driver-cheap and shuffle-free
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select("p.*")


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF.

    tf = term count within the doc; idf = ln((N + 1) / (df + 1)) + 1
    (sklearn's smoothed variant — never zero or negative, published
    formula). Ties broken by term ascending for determinism. Output:
    (id, term, tf, score) — ``score`` rounded for cross-engine parity.

    Plan shape: explode tokens -> two hash aggregations (per-doc-term tf,
    per-term df) -> broadcast the corpus size (a literal via scalar agg is
    avoided; N comes from countDistinct over the exploded frame's source)
    -> window top-k per doc. The df table is doc-frequency keyed by term —
    orders of magnitude smaller than the corpus — and joins the tf table on
    term (broadcast when it fits, AQE decides).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    doc_freq = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    n_docs = df.select(id_col).distinct().count()  # scalar; one tiny job
    idf = doc_freq.withColumn(
        "idf", F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)
    )
    scored = tf.join(idf, on="term").withColumn(
        "score", F.round(F.col("tf") * F.col("idf"), round_digits)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(id_col, "term", "tf", "score")
    )
