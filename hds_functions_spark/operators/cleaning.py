"""Text-cleaning operators: the text-rewriting steps a web-corpus
pipeline runs before training.

Extension layer (SURVEY.md §7; no reference counterpart):

- **PII scrubbing** — replace emails / URLs / phone-shaped strings with
  placeholder tokens (chained ``regexp_replace``, JVM-side, codegen);
- **line filtering** (C4-style) — drop lines that are too short or do not
  end in terminal punctuation, recomposing the document from survivors
  (``split`` → ``filter`` → ``array_join``, no UDF, no shuffle);
- **repeated-line dedup** — order-preserving first-occurrence filter
  (boilerplate: nav bars, cookie banners, repeated footers);
- **Unicode NFC normalisation** — the one justified Python crossing here
  (no Spark builtin): Arrow-batched ``pandas_udf`` over ``unicodedata``.

Regex patterns stay inside the Java-regex ∩ RE2 common subset (no
lookarounds, ASCII word boundaries) so the DuckDB oracles run the exact
same patterns — the same portability rule as the BPE-ish tokeniser.

Except for NFC, every operator is a narrow projection of built-ins: at
100 TB they fuse into the scan with zero exchanges, and Catalyst prunes
them away entirely for queries that don't read the rewritten column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "scrub_pii",
    "filter_lines",
    "normalize_unicode_nfc",
    "dedup_lines",
    "dedup_lines_across_corpus",
    "strip_markup",
]

#: HTML entities :func:`strip_markup` unescapes, in application order.
#: ``&amp;`` is deliberately LAST: unescaping it first would turn
#: ``&amp;lt;`` into ``&lt;`` and then into ``<`` — double-unescape.
MARKUP_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

#: (name, pattern, replacement) — ordered; applied left to right. Patterns
#: are valid and equivalent under both Java regex and RE2 (DuckDB).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("phone", r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Replace PII-shaped substrings with placeholder tokens.

    ``patterns`` defaults to :data:`PII_PATTERNS` (emails, URLs, phone
    shapes); pass your own ``(name, regex, replacement)`` list for other
    jurisdictions. Replacement order matters (URLs are scrubbed after
    emails so ``mailto:``-less addresses inside URLs are already gone);
    the chain applies in list order. Writes ``out_col`` (default:
    overwrite ``text_col``).
    """
    out_col = out_col or text_col
    col: Column = F.col(text_col)
    for _name, pattern, repl in patterns or PII_PATTERNS:
        col = F.regexp_replace(col, pattern, repl)
    return df.withColumn(out_col, col)


def filter_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_chars: int = 3,
    require_terminal_punct: bool = True,
    kept_col: str | None = "n_lines_kept",
    total_col: str | None = "n_lines_total",
) -> DataFrame:
    """C4-style line-level filter: keep lines with at least ``min_chars``
    non-whitespace-trimmed characters and (optionally) terminal
    punctuation (``.``, ``!`` or ``?``, allowing a closing quote), then
    recompose the document with newlines.

    Adds ``kept_col`` / ``total_col`` line counts (pass None to skip) so a
    downstream quality gate can drop documents that lost most of their
    lines. Writes ``out_col`` (default: overwrite ``text_col``).
    """
    out_col = out_col or text_col
    lines = F.split(F.col(text_col), "\n")

    def keep(line: Column) -> Column:
        trimmed = F.trim(line)
        cond = F.length(trimmed) >= min_chars
        if require_terminal_punct:
            cond = cond & trimmed.rlike(r"""[.!?]["']?$""")
        return cond

    kept = F.filter(lines, keep)
    out = df
    if total_col:
        out = out.withColumn(total_col, F.size(lines).cast("long"))
    if kept_col:
        out = out.withColumn(kept_col, F.size(kept).cast("long"))
    return out.withColumn(out_col, F.array_join(kept, "\n"))


def normalize_unicode_nfc(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Unicode NFC normalisation (compose combining sequences) — the
    canonicalisation step before hashing/dedup so visually-identical
    strings ('e' + COMBINING ACUTE vs precomposed 'é') hash identically.

    Spark exposes no Unicode-normalisation builtin, so this is one of the
    few justified Python crossings: an Arrow-batched ``pandas_udf``
    (vectorised batch transfer, not per-row Python) over ``unicodedata``.
    The DuckDB oracle uses its native ``nfc_normalize`` — both implement
    Unicode NFC, verified equal.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return df.withColumn(out_col or text_col, _nfc(F.col(text_col)))


def dedup_lines_across_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 2,
    out_col: str | None = None,
    kept_col: str | None = "n_lines_kept",
    total_col: str | None = "n_lines_total",
) -> DataFrame:
    """CORPUS-level boilerplate removal: drop every line occurring more than
    ``max_occurrences`` times across the whole corpus (the C4 line-dedup
    signal — cookie banners, nav bars and licence footers repeat across
    thousands of documents; :func:`dedup_lines` only sees repeats within
    one document).

    Plan shape for 100 TB: lines ``posexplode``; the occurrence count
    groups on ``xxhash64(line)`` — an 8-byte shuffle key with map-side
    combine, never the line text; the hot set (lines above the cap) is
    tiny relative to the corpus (only boilerplate survives the HAVING), so
    the anti-join against it is size-gated to a broadcast by the planner;
    documents are reassembled in original line order with one
    ``sort_array(collect_list(struct(pos, line)))`` aggregation. Documents
    whose every line is boilerplate come back as an empty string, not
    dropped. 64-bit hash collisions could in principle drop a rare line
    that collides with a hot one (birthday-bounded; negligible below ~1e9
    distinct lines — swap in a 128-bit hash beyond that).
    """
    out_col = out_col or text_col
    split = F.split(F.col(text_col), "\n")
    base = df.select(
        F.col(id_col).alias("_id"), F.size(split).alias("_n_total")
    )
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(split).alias("_pos", "_line"),
    ).withColumn("_h", F.xxhash64("_line"))
    hot = (
        lines.groupBy("_h")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_occurrences)
        .select("_h")
    )
    keep = lines.join(hot, on="_h", how="left_anti")
    agg = keep.groupBy("_id").agg(
        F.count("*").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_text"),
    )
    out = base.join(agg, on="_id", how="left").select(
        F.col("_id").alias(id_col),
        *([F.col("_n_total").cast("long").alias(total_col)] if total_col else []),
        *(
            [F.coalesce("_n_kept", F.lit(0)).cast("long").alias(kept_col)]
            if kept_col
            else []
        ),
        F.coalesce("_text", F.lit("")).alias(out_col),
    )
    return out


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kept_col: str | None = "n_lines_kept",
    total_col: str | None = "n_lines_total",
) -> DataFrame:
    """Order-preserving removal of repeated lines within each document —
    the boilerplate killer (nav bars, cookie banners, repeated footers
    produce identical lines): a line survives only at its FIRST
    occurrence. Pure array expressions: keep line i iff
    ``array_position(lines, line) == i+1``; per-document cost is
    O(lines²) on line counts, which are small — no shuffle, no UDF.
    """
    out_col = out_col or text_col
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines, lambda line, i: F.array_position(lines, line) == i + 1
    )
    out = df
    if total_col:
        out = out.withColumn(total_col, F.size(lines).cast("long"))
    if kept_col:
        out = out.withColumn(kept_col, F.size(kept).cast("long"))
    return out.withColumn(out_col, F.array_join(kept, "\n"))


def strip_markup(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Strip HTML/XML markup down to its text content: script and style
    blocks are removed WITH their contents, remaining tags are replaced by
    a space (so ``a<br>b`` stays two words), the common entities
    (:data:`MARKUP_ENTITIES`) are unescaped, and whitespace collapses to
    single spaces — the first cleaning pass for web-scraped corpora.

    Regex-only on purpose (no HTML parser): at corpus scale the input is
    overwhelmingly tag soup, a parser is 100x the cost, and the failure
    mode of regex stripping (rare pathological markup keeps a fragment) is
    acceptable for corpus text where the document would be quality-filtered
    anyway. Patterns avoid backreferences so the same expressions run on
    Java regex and RE2. Pure projection: no UDF, no shuffle.
    """
    c = F.col(text_col)
    for blk in ("script", "style"):
        c = F.regexp_replace(
            c, f"(?is)<{blk}\\b[^>]*>.*?</{blk}>", " "
        )
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, repl in MARKUP_ENTITIES:
        # literal (non-regex) replace on both engines
        c = F.replace(c, F.lit(ent), F.lit(repl))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col or text_col, c)
