"""Fuzzy record linkage: edit-distance name matching + canonicalisation.

The entity-resolution primitive a curation pipeline runs over free-text
names (product catalogs, author/affiliation strings, source domains):
find near-identical name variants and collapse them to one canonical
entity. No reference analogue; part of the LLM-data-pipeline extension
bar.

Scale-first design: fuzzy-match the DICTIONARY, not the corpus. Names
repeat heavily (a 100 TB catalog has millions of rows but a far smaller
distinct-name vocabulary), so the quadratic-ish work runs over
``distinct(normalised name)`` only; corpus rows rejoin the canonical map
by exact key afterwards. Candidate generation is rare-token blocking
(names sharing at least one token whose document frequency is below the
cap — the same pressure-valve design as the dedup hot-gram cap and the
BM25 df valve), so the pair space is bounded per block; the exact
``levenshtein`` verify runs only on candidates. Both the blocking and
the distance are plain built-ins any SQL engine reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fuzzy_name_pairs",
    "canonical_name_map",
]


def _norm(col):
    return F.lower(F.trim(col))


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
    max_token_df: int | None = None,
) -> DataFrame:
    """Near-identical name pairs from the distinct-name dictionary:
    ``(name_a, name_b, distance)`` with ``name_a < name_b`` and
    Levenshtein ``distance <= max_distance``.

    Candidates are names sharing at least one whitespace token with
    dictionary frequency ``<= max_token_df`` (default: no cap — correct
    for small vocabularies; SET IT on large dictionaries, where a
    universal token would otherwise regenerate the full cross product).
    Recall caveat (standard for token blocking): a pair sharing NO
    under-cap token is not considered — e.g. two single-token names
    that differ in that token.
    """
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1 (got {max_distance})")
    names = df.select(_norm(F.col(name_col)).alias("_name")).filter(
        F.col("_name").isNotNull() & (F.col("_name") != "")
    ).distinct()
    toks = names.select(
        "_name", F.explode(F.split(F.col("_name"), r"\s+")).alias("_tok")
    ).distinct()
    if max_token_df is not None:
        if max_token_df < 1:
            raise ValueError(
                f"max_token_df must be >= 1 (got {max_token_df})"
            )
        tok_df = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
        toks = toks.join(
            tok_df.filter(F.col("_df") <= max_token_df).select("_tok"),
            on="_tok",
        )
    a = toks.select(F.col("_name").alias("name_a"), "_tok")
    b = toks.select(F.col("_name").alias("name_b"), "_tok")
    return (
        a.join(b, on="_tok")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("distance") <= max_distance)
    )


def canonical_name_map(
    df: DataFrame,
    name_col: str,
    max_distance: int = 2,
    max_token_df: int | None = None,
    max_iterations: int = 25,
) -> DataFrame:
    """Canonical entity per name variant: connected components over the
    fuzzy pair graph (transitive closure — 'gray widget' ~ 'grey widget'
    ~ 'grey  widget' form ONE entity even when the ends exceed
    ``max_distance``), canonical = the lexicographically smallest name
    of the component. Output ``(name, canonical_name)`` for every
    distinct normalised name; corpus rows join this map by exact key.

    Reuses the large-star/small-star :func:`~hds_functions_spark.
    operators.dedup.connected_components` machinery — the pair graph is
    dictionary-sized, so the CC loop runs over a frame that does not
    grow with the corpus.
    """
    from .dedup import connected_components

    pairs = fuzzy_name_pairs(df, name_col, max_distance, max_token_df)
    names = df.select(_norm(F.col(name_col)).alias("_name")).filter(
        F.col("_name").isNotNull() & (F.col("_name") != "")
    ).distinct()
    comps = connected_components(
        pairs.select(
            F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b")
        ),
        nodes=names.select(F.col("_name")),
        id_col="_name",
        max_iterations=max_iterations,
    )
    return comps.select(
        F.col("_name").alias("name"),
        F.col("component").alias("canonical_name"),
    )
