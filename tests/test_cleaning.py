"""PII scrubbing + line-filter operator tests."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.cleaning import filter_lines, scrub_pii


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.co or visit https://a.io/x?q=1 now"),
            (2, "call 555-867-5309 or 555 123 4567 today"),
            (3, "clean text with no identifiers"),
            (4, None),
        ],
        "doc_id: long, text: string",
    )


def test_scrub_pii_defaults(spark, dirty):
    out = {r["doc_id"]: r["text"] for r in scrub_pii(dirty).collect()}
    assert out[1] == "mail <EMAIL> or visit <URL> now"
    assert out[2] == "call <PHONE> or <PHONE> today"
    assert out[3] == "clean text with no identifiers"
    assert out[4] is None


def test_scrub_pii_custom_out_col(spark, dirty):
    out = scrub_pii(dirty, out_col="clean")
    assert out.columns == ["doc_id", "text", "clean"]
    row = out.filter(F.col("doc_id") == 1).collect()[0]
    assert "@" in row["text"] and "<EMAIL>" in row["clean"]


def test_filter_lines_semantics(spark):
    text = "Good first line.\nno punct here\nab\nShort but fine!\n  x?  "
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    row = filter_lines(df, min_chars=3).collect()[0]
    # 'no punct here' dropped (no terminal punct), 'ab' dropped (short),
    # '  x?  ' dropped (trimmed length 2 < 3)
    assert row["text"] == "Good first line.\nShort but fine!"
    assert row["n_lines_total"] == 5
    assert row["n_lines_kept"] == 2


def test_filter_lines_no_punct_requirement(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta\nxy\nlong enough line")], "doc_id: long, text: string"
    )
    row = filter_lines(df, require_terminal_punct=False, min_chars=3).collect()[0]
    assert row["text"] == "alpha beta\nlong enough line"
    assert row["n_lines_kept"] == 2


def test_normalize_unicode_nfc(spark):
    from hds_functions_spark.operators.cleaning import normalize_unicode_nfc

    df = spark.createDataFrame(
        [(1, "café"), (2, "café"), (3, None)],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r["text"] for r in normalize_unicode_nfc(df).collect()}
    assert out[1] == out[2] == "café"   # decomposed == precomposed after NFC
    assert out[3] is None


def test_dedup_lines(spark):
    from hds_functions_spark.operators.cleaning import dedup_lines

    text = "Header\nbody one\nHeader\nbody two\nHeader"
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    row = dedup_lines(df).collect()[0]
    assert row["text"] == "Header\nbody one\nbody two"
    assert row["n_lines_total"] == 5
    assert row["n_lines_kept"] == 3


def test_dedup_lines_across_corpus(spark):
    from hds_functions_spark.operators.cleaning import dedup_lines_across_corpus

    rows = [(i, f"BOILER\nunique {i}\nBOILER TWICE" if i < 2 else f"BOILER\nunique {i}")
            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in
           dedup_lines_across_corpus(df, max_occurrences=2).collect()}
    # 'BOILER' occurs 5x (> 2): dropped everywhere; 'BOILER TWICE' occurs
    # exactly 2x (== cap): kept; unique lines kept in original order
    assert out[0]["text"] == "unique 0\nBOILER TWICE"
    assert out[3]["text"] == "unique 3"
    assert out[0]["n_lines_total"] == 3 and out[0]["n_lines_kept"] == 2
    assert out[3]["n_lines_total"] == 2 and out[3]["n_lines_kept"] == 1


def test_dedup_lines_across_corpus_all_boilerplate(spark):
    from hds_functions_spark.operators.cleaning import dedup_lines_across_corpus

    df = spark.createDataFrame(
        [(i, "SAME") for i in range(4)], "doc_id: long, text: string"
    )
    out = dedup_lines_across_corpus(df, max_occurrences=1).collect()
    # every doc loses its only line but is NOT dropped from the output
    assert len(out) == 4
    assert all(r["text"] == "" and r["n_lines_kept"] == 0 for r in out)


def test_strip_markup(spark):
    from hds_functions_spark.operators.cleaning import strip_markup

    df = spark.createDataFrame(
        [
            (1, '<p class="big">Hello <b>world</b></p>'),
            (2, "<script>var x = '<secret>';</script>keep"),
            (3, "<style type=text/css>body{}</style>styled"),
            (4, "a&lt;b &amp;amp; c&nbsp;d"),
            (5, "a<br>b"),
            (6, "no markup at all"),
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r["text"] for r in strip_markup(df).collect()}
    assert out[1] == "Hello world"
    assert out[2] == "keep"          # script content removed entirely
    assert out[3] == "styled"
    # &amp; unescapes LAST: '&amp;amp;' -> '&amp;' (no double unescape)
    assert out[4] == "a<b &amp; c d"
    assert out[5] == "a b"           # tag becomes a space, words separated
    assert out[6] == "no markup at all"
