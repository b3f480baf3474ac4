"""Seeded property-fuzz of the round-8 exact-substring dedup operators
(same strategy as test_property_round7.py): random corpora, engine
output checked character-for-character against a pure-Python oracle.

- ``exact_substring_spans``: parity vs a brute-force gram-count +
  interval-merge oracle on corpora engineered to contain shared
  templates, self-overlapping repeats, and multi-byte characters.
- ``remove_duplicate_spans``: the cut text equals the Python
  reconstruction; n_removed equals the covered-character count;
  span-free docs pass through verbatim; fully-covered docs become "".
"""

from __future__ import annotations

import collections
import random

import pytest
from pyspark.sql import functions as F


def _py_spans(corpus: dict[int, str], min_len: int) -> dict[int, list[tuple]]:
    """Brute-force oracle: 1-based inclusive (start, end, len) spans of
    the union of length-``min_len`` grams occurring >= 2 times corpus-wide
    (second occurrence anywhere — another doc or the same one)."""
    counts: collections.Counter = collections.Counter()
    for t in corpus.values():
        for p in range(len(t) - min_len + 1):
            counts[t[p : p + min_len]] += 1
    out: dict[int, list[tuple]] = {}
    for d, t in corpus.items():
        spans: list[list[int]] = []
        for p in range(len(t) - min_len + 1):
            if counts[t[p : p + min_len]] < 2:
                continue
            s, e = p + 1, p + min_len  # 1-based inclusive
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        if spans:
            out[d] = [(s, e, e - s + 1) for s, e in spans]
    return out


def _py_cut(text: str, spans: list[tuple]) -> str:
    """Remove 1-based inclusive spans (disjoint, sorted) from ``text``."""
    kept, prev_end = [], 0
    for s, e, _l in spans:
        kept.append(text[prev_end : s - 1])
        prev_end = e
    kept.append(text[prev_end:])
    return "".join(kept)


def _random_corpus(seed: int, alphabet: str, n_docs: int = 18) -> dict[int, str]:
    """Docs with planted shared templates + random filler so duplicated
    spans are common but boundaries are irregular."""
    rng = random.Random(seed)
    templates = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(8, 25)))
        for _ in range(4)
    ]
    corpus = {}
    for d in range(n_docs):
        parts = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.6:
                parts.append(rng.choice(templates))
            parts.append(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 15)))
            )
        corpus[d] = "".join(parts)
    return corpus


def _engine_spans(spark, corpus: dict[int, str], min_len: int):
    from hds_functions_spark.operators.dedup import exact_substring_spans

    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    rows = exact_substring_spans(docs, min_len=min_len).collect()
    got: dict[int, list[tuple]] = collections.defaultdict(list)
    for r in rows:
        got[r.doc_id].append((r.span_start, r.span_end, r.span_len))
    return {d: sorted(v) for d, v in got.items()}


@pytest.mark.parametrize("seed,min_len", [(11, 5), (29, 8), (47, 4)])
def test_spans_match_bruteforce_on_random_corpora(spark, seed, min_len):
    corpus = _random_corpus(seed, alphabet="abc ")
    assert _engine_spans(spark, corpus, min_len) == _py_spans(corpus, min_len)


@pytest.mark.parametrize("seed", [13, 61])
def test_spans_multibyte_codepoint_offsets(spark, seed):
    # Spark substr/length count codepoints, as does Python — parity must
    # hold with 2- and 3-byte UTF-8 characters in the alphabet.
    corpus = _random_corpus(seed, alphabet="aβ語 ", n_docs=12)
    min_len = 5
    assert _engine_spans(spark, corpus, min_len) == _py_spans(corpus, min_len)


def test_spans_edge_cases(spark):
    L = 5
    corpus = {
        0: "ab" * 50,            # self-overlapping repeat, fully covered
        1: "abcd",               # shorter than min_len -> no grams
        2: "zzzzz",              # exactly min_len, unique -> no spans
        3: "qq-no-shared-grams",  # shares nothing long enough
        4: "xxHELLOWORLDxx",     # template shared with doc 5
        5: "yyHELLOWORLDyy",
        6: "",                   # empty doc
    }
    got = _engine_spans(spark, corpus, L)
    exp = _py_spans(corpus, L)
    assert got == exp
    # the repeat doc is covered end-to-end by one merged span
    assert exp[0] == [(1, 100, 100)]
    # the shared template's span covers exactly HELLOWORLD in docs 4/5
    assert exp[4] == [(3, 12, 10)] and exp[5] == [(3, 12, 10)]
    for d in (1, 2, 3, 6):
        assert d not in exp


def test_spans_adjacent_islands_merge_boundary(spark):
    # Duplicated grams at positions p and p+L produce touching intervals
    # [p, p+L-1], [p+L, p+2L-1] — these MUST merge (gap == min_len);
    # positions p and p+L+1 leave a 1-char hole and MUST NOT.
    L = 4
    corpus = {
        0: "AAAA" + "BBBB" + "x",      # grams at 1 and 5: adjacent
        1: "AAAA" + "x" + "BBBB",      # grams at 1 and 6: gapped
        2: "AAAA" + "BBBB",            # second occurrence source
    }
    exp = _py_spans(corpus, L)
    assert exp[0] == [(1, 8, 8)]                 # merged
    assert exp[1] == [(1, 4, 4), (6, 9, 4)]      # two islands
    assert _engine_spans(spark, corpus, L) == exp


@pytest.mark.parametrize("seed,min_len", [(17, 5), (71, 7)])
def test_removal_matches_python_reconstruction(spark, seed, min_len):
    from hds_functions_spark.operators.dedup import (
        exact_substring_spans,
        remove_duplicate_spans,
    )

    corpus = _random_corpus(seed, alphabet="abβ ")
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    spans_df = exact_substring_spans(docs, min_len=min_len)
    got = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans(docs, spans_df).collect()
    }
    exp_spans = _py_spans(corpus, min_len)
    assert set(got) == set(corpus)  # every doc passes through
    for d, text in corpus.items():
        clean = _py_cut(text, exp_spans.get(d, []))
        assert got[d] == (clean, len(text) - len(clean)), f"doc {d}"


def test_removal_full_coverage_and_passthrough(spark):
    from hds_functions_spark.operators.dedup import (
        exact_substring_spans,
        remove_duplicate_spans,
    )

    corpus = {0: "ab" * 30, 1: "ab" * 30, 2: "unique text here", 3: ""}
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    spans_df = exact_substring_spans(docs, min_len=5)
    got = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_duplicate_spans(docs, spans_df).collect()
    }
    assert got[0] == ("", 60) and got[1] == ("", 60)  # fully covered -> ""
    assert got[2] == ("unique text here", 0)          # verbatim passthrough
    assert got[3] == ("", 0)                          # empty in, empty out


def test_min_len_validation(spark):
    from hds_functions_spark.operators.dedup import exact_substring_spans

    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        exact_substring_spans(docs, min_len=1)


@pytest.mark.parametrize("seed,min_len", [(19, 5), (83, 4)])
def test_incremental_spans_equal_full_build_slice(spark, seed, min_len):
    """The slice-identity theorem, fuzzed: incremental(batch, corpus)
    == full build over corpus+batch restricted to batch docs."""
    from hds_functions_spark.operators.dedup import (
        exact_substring_spans,
        exact_substring_spans_incremental,
    )

    corpus_all = _random_corpus(seed, alphabet="abc ", n_docs=24)
    batch = {d: t for d, t in corpus_all.items() if d % 3 == 0}
    corpus = {d: t for d, t in corpus_all.items() if d % 3 != 0}
    bdf = spark.createDataFrame(list(batch.items()), "doc_id long, text string")
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    alldf = spark.createDataFrame(
        list(corpus_all.items()), "doc_id long, text string"
    )
    inc = sorted(
        tuple(r)
        for r in exact_substring_spans_incremental(
            bdf, cdf, min_len=min_len
        ).collect()
    )
    full = sorted(
        tuple(r)
        for r in exact_substring_spans(alldf, min_len=min_len).collect()
        if r.doc_id % 3 == 0
    )
    assert inc == full


def test_incremental_spans_edge_cases(spark):
    from hds_functions_spark.operators.dedup import (
        exact_substring_spans_incremental,
    )

    L = 5
    batch = {
        0: "xxSHAREDyy",    # duplicated only via the corpus
        1: "ab" * 10,       # duplicated only batch-internally (vs doc 2)
        2: "zz" + "ab" * 10,
        3: "nothing here",  # clean
    }
    corpus = {100: "ppSHAREDqq", 101: "corpus only text"}
    bdf = spark.createDataFrame(list(batch.items()), "doc_id long, text string")
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.span_start, r.span_end)
        for r in exact_substring_spans_incremental(bdf, cdf, min_len=L).collect()
    }
    # "SHARED" (6 chars) at 3..8 in doc 0 — found via the corpus probe
    assert got[0] == (3, 8)
    # the "ab"*10 block: fully covered in doc 1, offset by 2 in doc 2
    assert got[1] == (1, 20) and got[2] == (3, 22)
    assert 3 not in got
    # corpus-internal duplication alone must NOT surface batch spans:
    cdf2 = spark.createDataFrame(
        [(100, "dup dup DUPLICATE!"), (101, "dup dup DUPLICATE!")],
        "doc_id long, text string",
    )
    bdf2 = spark.createDataFrame(
        [(0, "clean batch document")], "doc_id long, text string"
    )
    assert (
        exact_substring_spans_incremental(bdf2, cdf2, min_len=L).count() == 0
    )
