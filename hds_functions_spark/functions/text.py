"""Text-analysis functions for large-scale corpus curation.

Extension layer beyond the reference (SURVEY.md §7): tokenisation, n-gram
shingling, quality features, heuristic language ID, and document
fingerprinting — all as built-in JVM-side expressions (zero UDFs), so they
run inside whole-stage codegen at any scale and are oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import stable_hash64

__all__ = [
    "tokens",
    "token_count",
    "bpe_token_count",
    "BPE_ISH_PATTERN",
    "char_ngrams",
    "word_ngrams",
    "add_text_stats",
    "add_quality_score",
    "add_language_id",
    "add_fingerprint",
    "add_repetition_stats",
    "add_script_ratios",
    "STOPWORDS",
    "remove_stopwords",
    "add_type_token_ratio",
]

#: Tiny per-language stopword lists for the heuristic language identifier.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "was",
           "for", "on", "are", "with", "as", "be", "at", "by", "this", "not"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "du", "en",
           "est", "que", "pour", "dans", "ce", "il", "au", "sur", "ne", "pas"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den",
           "im", "für", "auf", "ein", "eine", "nicht", "als", "auch", "sich",
           "dem", "des"],
    "es": ["el", "los", "las", "de", "y", "que", "en", "un", "una", "es",
           "del", "para", "con", "por", "no", "se", "su", "al", "lo", "como"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the trimmed text; empty text -> empty array."""
    trimmed = F.trim(_c(col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_ngrams(col: Column | str, n: int) -> Column:
    """All overlapping character n-grams (with duplicates, in order).

    Texts shorter than ``n`` yield an empty array (guarded: Spark's
    ``sequence(1, 0)`` would count DOWN, not produce an empty sequence).

    Same evaluation-count discipline as :func:`word_ngrams`: the
    ``substr``-per-position lambda re-evaluated the captured string
    expression once PER SHINGLE (O(len^2) when callers pass
    ``lower(text)`` — the MinHash hot path); the zip_with fold over
    ``n`` shifted slices of the char array evaluates it ``n`` times
    per row.
    """
    c = _c(col)
    chars = F.split(c, "")
    m = F.size(chars) - F.lit(n - 1)
    shifted = [F.slice(chars, F.lit(k + 1), m) for k in range(n)]
    grams = shifted[0]
    for part in shifted[1:]:
        grams = F.zip_with(grams, part, lambda a, b: F.concat(a, b))
    return F.when(F.length(c) < n, F.array().cast("array<string>")).otherwise(grams)


def word_ngrams(tokens_col: Column, n: int) -> Column:
    """Space-joined n-grams over a token array; short docs -> empty array.

    Spelled as a ``zip_with`` fold over ``n`` shifted slices of the
    token array, NOT a ``transform`` whose lambda touches ``tokens_col``:
    higher-order-function lambdas re-evaluate captured subexpressions
    PER ELEMENT (no subexpression elimination in the interpreted path),
    so when the token array is itself a computed expression (split +
    lower + CASE) the per-gram spelling re-tokenises the document once
    per gram — measured 10x slower on the sf0.1 corpus. Here the array
    expression is evaluated exactly ``n`` times as direct slice children.
    """
    m = F.size(tokens_col) - F.lit(n - 1)
    shifted = [F.slice(tokens_col, F.lit(k + 1), m) for k in range(n)]
    grams = shifted[0]
    for part in shifted[1:]:
        grams = F.zip_with(
            grams, part, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(F.size(tokens_col) < n, F.array().cast("array<string>")).otherwise(
        grams
    )


def add_text_stats(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Add per-document statistics columns (single projection, no shuffle):

    ``n_chars_computed``, ``n_tokens``, ``avg_token_len`` (null for empty),
    ``punct_ratio``, ``digit_ratio``, ``space_ratio``, ``upper_ratio``
    (ratios of character classes over total length; null for empty text).
    """
    c = F.col(text_col)
    toks = tokens(c)
    length = F.length(c).cast("double")
    no_len = length == 0

    def ratio(stripped: Column) -> Column:
        return F.when(no_len, F.lit(None)).otherwise(
            (length - F.length(stripped)) / length
        )

    p = prefix
    return df.withColumns(
        {
            f"{p}n_chars_computed": F.length(c).cast("long"),
            f"{p}n_tokens": F.size(toks).cast("long"),
            f"{p}avg_token_len": F.when(F.size(toks) == 0, F.lit(None)).otherwise(
                F.aggregate(
                    toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
                )
                / F.size(toks)
            ),
            f"{p}punct_ratio": ratio(F.regexp_replace(c, r"\p{Punct}", "")),
            f"{p}digit_ratio": ratio(F.regexp_replace(c, r"[0-9]", "")),
            f"{p}space_ratio": ratio(F.regexp_replace(c, r"\s", "")),
            f"{p}upper_ratio": ratio(F.regexp_replace(c, r"[A-Z]", "")),
        }
    )


def add_quality_score(
    df: DataFrame, text_col: str = "text", score_col: str = "quality_score"
) -> DataFrame:
    """Heuristic [0, 1] quality score from length/token/punctuation signals.

    Deliberately simple and fully expression-based: length in a sane band,
    average token length in [3, 12], punctuation under 30%, digits under 30%.
    Each signal contributes 0.25.
    """
    with_stats = add_text_stats(df, text_col, prefix="_q_")
    n_chars = F.col("_q_n_chars_computed")
    avg_tok = F.col("_q_avg_token_len")
    punct = F.col("_q_punct_ratio")
    digit = F.col("_q_digit_ratio")
    score = (
        F.when((n_chars >= 50) & (n_chars <= 100000), 0.25).otherwise(0.0)
        + F.when((avg_tok >= 3) & (avg_tok <= 12), 0.25).otherwise(0.0)
        + F.when(F.coalesce(punct, F.lit(1.0)) <= 0.3, 0.25).otherwise(0.0)
        + F.when(F.coalesce(digit, F.lit(1.0)) <= 0.3, 0.25).otherwise(0.0)
    )
    return with_stats.withColumn(score_col, score).drop(
        *[c for c in with_stats.columns if c.startswith("_q_")]
    )


def add_language_id(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang_pred",
    stopwords: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Heuristic language ID: most stopword token hits wins (ties and
    zero-hit docs -> 'und' for undetermined; deterministic tie-break by
    language code order).
    """
    stopwords = stopwords or STOPWORDS
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    hit_cols = []
    out = df.withColumn("_lid_tokens", toks)
    for code in sorted(stopwords):
        words = F.array(*[F.lit(w) for w in stopwords[code]])
        hits = F.size(
            F.filter(F.col("_lid_tokens"), lambda t: F.array_contains(words, t))
        )
        col_name = f"_lid_{code}"
        out = out.withColumn(col_name, hits)
        hit_cols.append((code, col_name))
    best = F.greatest(*[F.col(c) for _, c in hit_cols])
    pred = F.lit("und")
    # first language (sorted order) achieving the max, if max > 0
    for code, col_name in reversed(hit_cols):
        pred = F.when((F.col(col_name) == best) & (best > 0), code).otherwise(pred)
    return out.withColumn(lang_col, pred).drop(
        "_lid_tokens", *[c for _, c in hit_cols]
    )


def add_fingerprint(
    df: DataFrame, text_col: str = "text", fp_col: str = "fingerprint"
) -> DataFrame:
    """Normalised-content fingerprint: lowercase, collapse whitespace,
    portable 60-bit hash. Identical content -> identical fingerprint across
    engines (used by exact dedup).
    """
    normalised = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(fp_col, stable_hash64(normalised))


#: GPT-2-style pre-tokeniser approximation, restricted to syntax shared by
#: Java regex (Spark) and RE2 (DuckDB) — no lookarounds: lowercase English
#: contraction suffixes, letter runs, digit runs, non-space symbol runs.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\p{L}\p{N}\s']+"


def bpe_token_count(col: Column | str) -> Column:
    """Approximate BPE token count: number of pre-tokeniser matches (the
    unit a byte-pair encoder would split further). JVM-side regex — no UDF."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def add_repetition_stats(
    df: DataFrame, text_col: str = "text", prefix: str = ""
) -> DataFrame:
    """Repetition signals used by published LLM-corpus quality filters
    (Gopher's repetition thresholds; RefinedWeb/MassiveText variants) —
    all computed in one shuffle-free projection:

    - ``dup_line_ratio``: 1 - distinct/total over newline-split lines
      (boilerplate, navigation menus);
    - ``dup_token_ratio``: 1 - distinct/total over whitespace tokens;
    - ``top_bigram_ratio``: occurrences of the most frequent word bigram /
      total bigrams (stuck-phrase repetition). Computed with array
      expressions (aggregate over distinct grams), not a per-doc groupBy —
      the doc never leaves its partition.

    All ratios are null for empty inputs (no lines/tokens/bigrams).
    """
    c = F.col(text_col)
    p = prefix
    lines = F.filter(F.split(c, r"\n"), lambda x: F.trim(x) != "")
    toks = tokens(c)
    bigrams = word_ngrams(toks, 2)

    def dup_ratio(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(n == 0, F.lit(None)).otherwise(
            1.0 - F.size(F.array_distinct(arr)).cast("double") / n
        )

    # max count of any single bigram == longest run of equal adjacent
    # elements in the SORTED gram array: O(n log n) per row. (The naive
    # "count each distinct gram with a nested filter" is O(n^2) in
    # interpreted HOF lambdas — measured 180 s on the 5k-doc bench table
    # vs 0.5 s for this formulation.) State: (prev gram, current run,
    # best run) folded once over the sorted array.
    run_state = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(acc["prev"].isNotNull() & (g == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(
                    acc["prev"].isNotNull() & (g == acc["prev"]), acc["run"] + 1
                ).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_bigram = F.when(F.size(bigrams) == 0, F.lit(None)).otherwise(
        run_state["best"].cast("double") / F.size(bigrams)
    )
    return (
        df.withColumn(f"{p}dup_line_ratio", dup_ratio(lines))
        .withColumn(f"{p}dup_token_ratio", dup_ratio(toks))
        .withColumn(f"{p}top_bigram_ratio", top_bigram)
    )


def remove_stopwords(toks: Column, words: list[str]) -> Column:
    """Filter stopwords out of a token array (case-insensitive membership,
    order and duplicates of the survivors preserved — unlike
    ``array_except``, which dedups). Pure array expression."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.filter(toks, lambda t: ~F.array_contains(wl, F.lower(t)))


#: Script classes for :func:`add_script_ratios`: output column -> Java
#: regex character class (Spark side). The DuckDB oracle uses RE2's
#: spelling of the same Unicode script property (``\p{Latin}`` vs Java's
#: ``\p{IsLatin}``); both engines implement the Unicode script database.
SCRIPT_CLASSES: dict[str, str] = {
    "latin": r"\p{IsLatin}",
    "cyrillic": r"\p{IsCyrillic}",
    "han": r"\p{IsHan}",
    "arabic": r"\p{IsArabic}",
    "digit": r"\p{Nd}",
    "space": r"\s",
}


def add_script_ratios(
    df: DataFrame, text_col: str = "text", round_digits: int = 6
) -> DataFrame:
    """Per-document character-class composition: ``{class}_ratio`` for each
    entry in :data:`SCRIPT_CLASSES` plus ``other_ratio`` (the remainder) —
    the script-mixture signal real corpus pipelines use next to language
    ID: a "French" document that is 40% Han characters is mislabelled or
    spam; a high digit ratio flags tables/logs masquerading as prose.

    Ratios are over total characters, rounded; empty documents get null
    ratios. Pure projection (regexp count per class — codegen, no UDF, no
    shuffle at any scale).
    """
    c = F.col(text_col)
    n = F.length(c)
    ratio_cols: dict[str, Column] = {}
    total = F.lit(0.0)
    for name, cls in SCRIPT_CLASSES.items():
        cnt = n - F.length(F.regexp_replace(c, cls, ""))
        r = F.when(n > 0, F.round(cnt / n, round_digits))
        ratio_cols[f"{name}_ratio"] = r
        total = total + F.coalesce(cnt / n, F.lit(0.0))
    ratio_cols["other_ratio"] = F.when(
        n > 0, F.round(F.lit(1.0) - total, round_digits)
    )
    return df.withColumns(ratio_cols)


def add_type_token_ratio(
    df: DataFrame,
    text_col: str = "text",
    ttr_col: str = "type_token_ratio",
    round_digits: int = 6,
) -> DataFrame:
    """Lexical diversity: distinct lowercased tokens / total tokens per
    document (empty docs -> NULL). Boilerplate and template text sit
    low; natural prose high. Pure array expressions, zero shuffle."""
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    n = F.size(toks)
    return df.withColumn(
        ttr_col,
        F.when(
            n > 0,
            F.round(F.size(F.array_distinct(toks)) / n, round_digits),
        ),
    )
