"""Distributed WordPiece merge training (likelihood-scored BPE).

The tokenizer trainer behind BERT-family vocabularies (Schuster &
Nakajima 2012; Wu et al. 2016 §3.1): identical mechanics to BPE —
iteratively merge the best adjacent symbol pair over the word-frequency
dictionary — but the merge is chosen by the LIKELIHOOD gain

    score(a, b) = count(ab) / (count(a) * count(b))

(the pair whose merge most increases corpus likelihood under a unigram
symbol model), not by raw pair count. Completes the trainer trio next
to :mod:`operators.bpe` (count-scored merges) and
:mod:`operators.unigram` (EM-pruned piece LM). No reference analogue
(``hds_functions`` has no tokenizer surface); part of the
LLM-data-pipeline extension bar.

Spark-first shape — shared with the BPE trainer (same dictionary
collapse, two-space separator protocol, literal non-overlapping
``replace`` rewrite driven by the collected per-step argmax — one
Spark job per step, lazy dictionary chain):

- The corpus collapses to its ``(word, n)`` dictionary in ONE
  combinable aggregate; every per-step frame after that is
  vocabulary-sized regardless of corpus scale.
- Each step adds ONE vocabulary-sized aggregate over BPE's: the
  current symbol unigram counts (explode symbols + combinable
  groupBy), equi-joined onto the pair counts to form the score. Both
  sides are vocabulary-sized; at 100 TB this loop never touches the
  corpus again after the dictionary build.
- **Cross-engine exactness**: pair and symbol counts are exact
  bigints; the score is ONE IEEE double division of a double product
  (counts < 2**53 convert exactly; *, / are correctly rounded and
  identical in Spark and DuckDB), so an oracle replaying the same
  arithmetic reproduces every argmax bit-exactly. Ties on score break
  to the lexicographically smallest (a, b). The count product is
  formed in DOUBLE, not bigint, so a web-scale corpus (symbol counts
  ~1e12) cannot overflow the multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .bpe import _SEP, _initial_symbols, word_frequency_table

__all__ = [
    "wordpiece_train_merges",
    "wordpiece_word_segmentation",
    "wordpiece_encode_stats",
]


def _train(
    docs: DataFrame, text_col: str, n_merges: int
) -> tuple[list[tuple], DataFrame]:
    """Shared training loop: per-step merge tuples ``(step, merge_left,
    merge_right, pair_count, count_left, count_right, raw_score)`` + the
    final word dictionary ``(word, n, sym)`` — the BPE loop with the
    likelihood argmax. See :func:`operators.bpe._train` for the
    separator/rewrite/lineage commentary (one Spark job per step: the
    1-row argmax collect; the rewrite uses the collected pair as LITERAL
    ``replace`` strings, so the former per-step ``localCheckpoint`` jobs
    and the crossJoin-broadcast disappear); only the scoring differs.
    The raw double score crosses the Python boundary bit-exactly
    (1-row collect + ``createDataFrame`` round-trip doubles exactly);
    display rounding stays in Spark (`F.round`) for oracle identity."""
    from ..caching import tracked_persist

    words = tracked_persist(
        word_frequency_table(docs, text_col).select(
            "word", "n", _initial_symbols(F.col("word")).alias("sym")
        )
    )
    merges = []
    for step in range(1, n_merges + 1):
        arr = F.split(F.trim(F.col("sym")), _SEP)
        # current symbol unigram counts — the denominator model; one
        # explode + one combinable groupBy, vocabulary-sized output
        sym_counts = (
            words.select("n", F.explode(arr).alias("s"))
            .groupBy("s")
            .agg(F.sum("n").alias("s_cnt"))
        )
        pairs = words.select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice(arr, 1, F.size(arr) - 1).alias("a"),
                    F.slice(arr, 2, F.size(arr) - 1).alias("b"),
                )
            ).alias("p"),
        ).select("n", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        scored = (
            pairs.groupBy("a", "b")
            .agg(F.sum("n").alias("cnt"))
            .join(
                sym_counts.select(
                    F.col("s").alias("a"), F.col("s_cnt").alias("cnt_a")
                ),
                on="a",
            )
            .join(
                sym_counts.select(
                    F.col("s").alias("b"), F.col("s_cnt").alias("cnt_b")
                ),
                on="b",
            )
            .withColumn(
                "score",
                F.col("cnt")
                / (
                    F.col("cnt_a").cast("double")
                    * F.col("cnt_b").cast("double")
                ),
            )
        )
        # exhaustion guard — same contract as the BPE trainer: an
        # all-NULL min(struct) row means no adjacent pair anywhere
        probe = (
            scored.agg(
                F.min(
                    F.struct(
                        (-F.col("score")).alias("neg"),
                        F.col("a").alias("a"),
                        F.col("b").alias("b"),
                        F.col("cnt").alias("cnt"),
                        F.col("cnt_a").alias("cnt_a"),
                        F.col("cnt_b").alias("cnt_b"),
                    )
                ).alias("best")
            )
            .select(
                F.col("best.a").alias("_ba"),
                F.col("best.b").alias("_bb"),
                F.col("best.cnt").alias("_bcnt"),
                F.col("best.cnt_a").alias("_bca"),
                F.col("best.cnt_b").alias("_bcb"),
                (-F.col("best.neg")).alias("_bscore"),
            )
            .first()
        )
        if probe is None or probe["_bcnt"] is None:
            break
        ba, bb = probe["_ba"], probe["_bb"]
        merges.append(
            (
                step,
                ba,
                bb,
                int(probe["_bcnt"]),
                int(probe["_bca"]),
                int(probe["_bcb"]),
                float(probe["_bscore"]),
            )
        )
        words = words.select(
            "word",
            "n",
            F.replace(
                F.col("sym"),
                F.lit(" " + ba + _SEP + bb + " "),
                F.lit(" " + ba + bb + " "),
            ).alias("sym"),
        )
    return merges, words


def wordpiece_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merges. One row per step:
    ``(step, merge_left, merge_right, pair_count, count_left,
    count_right, score)`` — the chosen rule, its weighted adjacent
    occurrences, the two symbols' current unigram counts, and the
    likelihood score ``pair_count / (count_left * count_right)``
    (rounded to 12 digits for display; the argmax compares unrounded).

    Deterministic by construction: exact integer counts, one IEEE
    double division for the score, ties to the lexicographically
    smallest pair — so an oracle unrolling the same steps reproduces
    the merge table exactly.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    merges, words = _train(docs, text_col, n_merges)
    # n_merges driver-side tuples (the per-step argmax collects) become
    # the merge table directly; empty on step-1 exhaustion. Display
    # rounding of the raw score stays in Spark for oracle bit-identity
    # (Python round() is round-half-even on binary, F.round is HALF_UP
    # on decimal text — not the same function).
    return words.sparkSession.createDataFrame(
        merges,
        "step: int, merge_left: string, merge_right: string, "
        "pair_count: bigint, count_left: bigint, count_right: bigint, "
        "_score_raw: double",
    ).select(
        "step",
        "merge_left",
        "merge_right",
        "pair_count",
        "count_left",
        "count_right",
        F.round(F.col("_score_raw"), 12).alias("score"),
    )


def wordpiece_word_segmentation(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> DataFrame:
    """The learned tokenizer as a lookup table: ``(word, n, subwords,
    n_subwords)`` after applying all ``n_merges`` WordPiece merges to
    the word dictionary. Dictionary-sized at any corpus scale."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1 (got {n_merges})")
    _, words = _train(docs, text_col, n_merges)
    sub = F.split(F.trim(F.col("sym")), _SEP)
    return words.select(
        "word",
        "n",
        sub.alias("subwords"),
        F.size(sub).alias("n_subwords"),
    )


def wordpiece_encode_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Apply the trained WordPiece merges back to the corpus: per
    document, word count, subword count, subwords-per-word (the
    fertility metric). Same join shape as
    :func:`operators.bpe.bpe_encode_stats` — exploded corpus words
    equi-join the vocabulary-sized segmentation table."""
    seg = wordpiece_word_segmentation(docs, text_col, n_merges).select(
        "word", "n_subwords"
    )
    doc_words = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
        ).alias("word"),
    )
    return (
        doc_words.join(seg, on="word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_subwords"),
        )
        .withColumn(
            "subwords_per_word",
            F.round(
                F.col("n_subwords") / F.col("n_words"), round_digits
            ),
        )
    )
