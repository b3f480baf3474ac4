"""Seeded property-fuzz of the round-5 part-2 operators (same strategy
as test_property_numeric.py): random inputs, engine output checked
against pure-Python oracles / structural invariants.

- ``scd2_collapse``: random version stacks with gaps and value churn —
  every surviving (key, version) snapshot must be covered by exactly
  one validity range carrying its value; ranges never overlap.
- ``padding_waste_profile``: token-mass conservation per bucket.
- ``kmeans_assign``: argmin equality vs a brute-force Python oracle.
- ``transition_counts``: per-key count identity and pair recompute.
- ``ahash64``: container invariance on random seeds.
"""

from __future__ import annotations

import random

import pytest

from hds_functions_spark.operators.clustering import kmeans_assign
from hds_functions_spark.operators.events import transition_counts
from hds_functions_spark.operators.packing import padding_waste_profile
from hds_functions_spark.sources.tables import scd2_collapse


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_scd2_coverage_and_no_overlap(spark, seed):
    rng = random.Random(seed)
    rows = []
    for k in range(20):
        value = rng.choice("xyz")
        for v in range(1, 7):
            if rng.random() < 0.25:
                continue  # gap
            if rng.random() < 0.3:
                value = rng.choice("xyz")  # churn
            rows.append((k, value, v))
    if not rows:
        rows = [(0, "x", 1)]
    df = spark.createDataFrame(rows, "k long, v string, version int")
    hist = scd2_collapse(df, ["k"], "version", ["v"]).collect()

    by_key_max = {}
    for k, _v, ver in rows:
        by_key_max[k] = max(by_key_max.get(k, 0), ver)
    # coverage: every input snapshot sits in exactly one range with its value
    for k, val, ver in rows:
        hits = [
            r for r in hist
            if r["k"] == k
            and r["valid_from"] <= ver
            and ver <= (r["valid_to"] if r["valid_to"] is not None
                        else by_key_max[k])
        ]
        assert len(hits) == 1, (k, ver, hits)
        assert hits[0]["v"] == val
    # no overlapping ranges per key; exactly one current row per key
    for k in {r["k"] for r in hist}:
        ranges = sorted(
            (r["valid_from"],
             r["valid_to"] if r["valid_to"] is not None else by_key_max[k])
            for r in hist if r["k"] == k
        )
        for (a1, b1), (a2, _b2) in zip(ranges, ranges[1:]):
            assert b1 < a2, (k, ranges)
        assert sum(1 for r in hist if r["k"] == k and r["valid_to"] is None) == 1


@pytest.mark.parametrize("seed", [5, 6])
def test_padding_waste_mass_conservation(spark, seed):
    rng = random.Random(seed)
    lens = [(rng.randint(0, 700),) for _ in range(200)]
    df = spark.createDataFrame(lens, "n long")
    out = padding_waste_profile(df, "n", bucket=32, max_len=256).collect()
    assert sum(r["n_seqs"] for r in out) == len(lens)
    exp_tokens = sum(min(n, 256) for (n,) in lens)
    assert sum(r["total_tokens"] for r in out) == exp_tokens
    for r in out:
        assert r["bucket_len"] % 32 == 0 and 32 <= r["bucket_len"] <= 256
        assert r["total_padding"] == r["n_seqs"] * r["bucket_len"] - r["total_tokens"]


@pytest.mark.parametrize("seed", [7, 8])
def test_kmeans_assign_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    dim, k = 6, 4
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(80)]
    cents = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(k)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in kmeans_assign(df, cents).collect()}
    for i, v in vecs:
        dists = [sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents]
        best = min(range(k), key=lambda j: (dists[j], j))
        assert got[i][0] == best
        assert got[i][1] == pytest.approx(dists[best], rel=1e-12)


@pytest.mark.parametrize("seed", [9, 10])
def test_transition_counts_identity(spark, seed):
    from datetime import datetime, timedelta

    rng = random.Random(seed)
    rows, eid = [], 0
    per_key = {}
    for k in range(10):
        n = rng.randint(1, 15)
        t0 = datetime(2024, 1, 1)
        seq = []
        for i in range(n):
            ty = rng.choice("abc")
            rows.append((eid, k, t0 + timedelta(minutes=i), ty, 0.0))
            seq.append(ty)
            eid += 1
        per_key[k] = seq
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double"
    )
    got = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in transition_counts(df).collect()}
    expected = {}
    for seq in per_key.values():
        for a, b in zip(seq, seq[1:]):
            expected[(a, b)] = expected.get((a, b), 0) + 1
    assert got == expected


@pytest.mark.parametrize("seed", [12, 13, 14])
def test_ahash_container_invariance_fuzz(spark, seed):
    from hds_functions_spark.operators.media_codecs import (
        ahash64,
        synthesize_bmp,
        synthesize_ppm,
    )

    rng = random.Random(seed)
    for _ in range(25):
        s = "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(1, 30)))
        assert ahash64(synthesize_ppm(s)) == ahash64(synthesize_bmp(s))
