"""gopher_rule_audit (operators/quality.py): golden per-rule failures
on crafted documents."""

from __future__ import annotations

import pytest

from hds_functions_spark.operators.quality import gopher_rule_audit

GOOD = (
    "the quick brown fox jumps over to be of and that have with lazy "
    "dogs near rivers and fields while children play games outside "
    "under bright skies watching clouds drift past tall trees in "
    "summer when warm winds blow gently across open meadows full of "
    "flowers and the world turns slowly onward every single day"
)  # 54 words, prose-like, >=2 stopwords


def _audit(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["rule"]: (r["n_fail"], r["fail_rate"])
        for r in gopher_rule_audit(df).collect()
    }


def test_good_doc_passes_all_rules(spark):
    out = _audit(spark, [(1, GOOD)])
    assert out["all_rules"] == (0, 0.0)
    for rule, (n, _) in out.items():
        assert n == 0, rule


def test_each_rule_fails_its_planted_doc(spark):
    rows = [
        (1, GOOD),
        (2, "too short"),  # word_count (and stopword_hits)
        (3, GOOD.replace("the", "the####################")),  # symbol_ratio
        (4, "\n".join("- bullet item here" for _ in range(10))
            + "\n" + GOOD),  # NOT bullet fail (11 lines, 10 bullets < 0.9*11? 10/11=0.909 > 0.9 -> fail)
        (5, GOOD + "\n" + "\n".join(
            f"trailing line {i}..." for i in range(10))),  # ellipsis_ratio
        (6, " ".join("1234" for _ in range(60))),  # alpha + stopwords
    ]
    out = _audit(spark, rows)
    # doc 2 (2 words) is the only word_count fail: docs 3-6 all carry
    # 54-60 words
    assert out["word_count"][0] == 1
    # doc 3 (planted #s) AND doc 5: its ten "..." line-enders are also
    # symbol occurrences (10 / ~84 words > 0.1) — the rules interact
    assert out["symbol_ratio"][0] == 2
    assert out["bullet_ratio"][0] == 1  # doc 4: 10/11 lines
    assert out["ellipsis_ratio"][0] == 1  # doc 5: 10/11 lines end ...
    assert out["alpha_ratio"][0] == 1  # doc 6
    assert out["stopword_hits"][0] == 2  # docs 2 and 6
    assert out["all_rules"][0] == 5  # docs 2..6 each fail something


def test_mean_word_length_rule(spark):
    long_words = " ".join("abcdefghijklmnop" for _ in range(60))  # 16 chars
    out = _audit(spark, [(1, long_words)])
    assert out["mean_word_length"][0] == 1
    # and the all_rules rollup counts the doc once despite multi-fails
    assert out["all_rules"][0] == 1


def test_empty_doc_fails_gracefully(spark):
    out = _audit(spark, [(1, "")])
    assert out["word_count"][0] == 1
    assert out["mean_word_length"][0] == 1
    assert out["symbol_ratio"][0] == 1  # null ratio -> conservative fail
    assert out["all_rules"][0] == 1
