"""Dedup operator tests: exact, minhash, jaccard, simhash."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.dedup import (
    add_simhash,
    duplicate_groups,
    exact_dedup,
    minhash_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = "the quick brown fox jumps over the lazy dog and runs far away today"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE),  # exact duplicate of 1
            (3, BASE.replace("lazy", "sleepy")),  # near-dup of 1
            (4, "completely unrelated content about spark shuffles and joins"),
            (5, "xy"),  # shorter than shingle size
        ],
        "doc_id: long, text: string",
    )


def test_exact_dedup_keeps_min_id(docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3, 4, 5]  # doc 2 dropped (same text as 1, higher id)


def test_exact_dedup_keep_max(docs):
    out = exact_dedup(docs, ["text"], "doc_id", keep="max")
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [2, 3, 4, 5]


def test_duplicate_groups(docs):
    out = duplicate_groups(docs, ["text"], "doc_id").collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 2 and out[0]["keep_id"] == 1


def test_minhash_signature_properties(docs):
    sigs = {r["doc_id"]: r["signature"] for r in
            minhash_signatures(docs, num_hashes=16).collect()}
    assert len(sigs[1]) == 16
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    agree_14 = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert agree_13 > agree_14  # near-dup agrees more than unrelated
    assert all(v is None for v in sigs[5])  # too short for shingles


def test_minhash_pairs_finds_duplicates(docs):
    pairs = minhash_pairs(docs.filter("doc_id < 5"), num_hashes=16, bands=4)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    if (1, 3) in got:
        assert got[(1, 3)] > 0.3


def test_ngram_jaccard_pairs(docs):
    pairs = ngram_jaccard_pairs(docs, ngram=3, min_jaccard=0.2)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got  # one word changed -> still similar 3-gram sets
    assert (1, 4) not in got


def test_simhash_near_duplicates(docs):
    out = {r["doc_id"]: r["simhash"] for r in add_simhash(docs).collect()}
    assert out[1] == out[2]
    ham_13 = bin(out[1] ^ out[3]).count("1")
    ham_14 = bin(out[1] ^ out[4]).count("1")
    assert ham_13 < ham_14  # near-dup closer in hamming space


def test_simhash_pairs(docs):
    pairs = simhash_pairs(docs, max_hamming=6)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 2)] == 0
