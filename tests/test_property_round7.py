"""Seeded property-fuzz of the round-7 operators (same strategy as
test_property_round6.py): random inputs, engine output checked against
pure-Python oracles / structural invariants.

- ``bm25_topk_pruned``: EXACT equality with the full scorer on random
  corpora (the losslessness theorem, fuzzed).
- ``triangle_count``: parity vs brute-force triangle enumeration on
  random graphs of varying density.
- ``kmv_pairwise_ops``: parity vs a pure-Python theta-sketch engine
  sharing the md5 hash protocol.
- ``histogram_quantiles``: estimates within one bin width of the true
  quantile, and invariant under input reordering.
- ``t_closeness_violations``: parity vs a Python ordered-EMD.
- ``cm_inner_product``: never below the true join size, and exact when
  the sketch is collision-free.
- ``winnowing_fingerprints``: parity vs a Python winnower.
"""

from __future__ import annotations

import collections
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [3, 23])
def test_pruned_bm25_lossless_on_random_corpora(spark, seed):
    from hds_functions_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_pruned,
    )

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    # Zipf-ish draw: low-index words frequent
    def word():
        r = rng.random() ** 2
        return vocab[int(r * len(vocab))]

    docs = spark.createDataFrame(
        [
            (i, " ".join(word() for _ in range(rng.randint(3, 20))))
            for i in range(80)
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [
            (q, " ".join(word() for _ in range(rng.randint(2, 6))))
            for q in range(12)
        ],
        "query_id long, query_text string",
    )
    for k, seed_terms, frac in ((3, 1, 0.9), (5, 2, 0.6)):
        kw = dict(k=k, max_df_frac=frac)
        full = sorted(
            tuple(r) for r in bm25_topk(docs, queries, **kw).collect()
        )
        pruned = sorted(
            tuple(r)
            for r in bm25_topk_pruned(
                docs, queries, seed_terms=seed_terms, **kw
            ).collect()
        )
        assert pruned == full


@pytest.mark.parametrize("seed,p", [(7, 0.08), (11, 0.3)])
def test_triangles_match_bruteforce(spark, seed, p):
    import itertools

    from hds_functions_spark.operators.graph import triangle_count

    rng = random.Random(seed)
    n = 40
    edges = [
        (a, b) for a in range(n) for b in range(a + 1, n)
        if rng.random() < p
    ]
    eset = set(edges)
    expect: dict[int, int] = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for v in (x, y, z):
                expect[v] = expect.get(v, 0) + 1
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_count(df).collect()
    }
    assert got == expect


def _py_kmv_u(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / (1 << 60)


@pytest.mark.parametrize("seed", [13, 29])
def test_theta_ops_match_python_engine(spark, seed):
    from hds_functions_spark.functions.sketches import kmv_pairwise_ops

    rng = random.Random(seed)
    k = 32
    sets = {
        "a": {rng.randrange(2000) for _ in range(600)},
        "b": {rng.randrange(2000) for _ in range(400)},
        "c": {rng.randrange(50) for _ in range(30)},
    }
    rows = [(s, v) for s, vs in sets.items() for v in vs]
    df = spark.createDataFrame(rows, "s: string, v: long")
    got = {
        (r["set_a"], r["set_b"]): r
        for r in kmv_pairwise_ops(df, "v", "s", k=k).collect()
    }

    sk = {
        s: sorted(_py_kmv_u(v) for v in vs)[:k] for s, vs in sets.items()
    }
    theta = {
        s: 1.0 if len(sets[s]) < k else sk[s][-1] for s in sets
    }
    for a, b in (("a", "b"), ("a", "c"), ("b", "c")):
        th = min(theta[a], theta[b])
        sa = {u for u in sk[a] if u < th}
        sb = {u for u in sk[b] if u < th}
        union_n, inter_n = len(sa | sb), len(sa & sb)
        r = got[(a, b)]
        assert r["union_n"] == union_n and r["intersect_n"] == inter_n
        assert r["union_est"] == round(union_n / th, 4)
        assert r["jaccard_est"] == round(inter_n / union_n, 4)


@pytest.mark.parametrize("seed", [19, 31])
def test_histogram_quantiles_error_bound_and_order_invariance(spark, seed):
    from hds_functions_spark.functions.sketches import histogram_quantiles

    rng = random.Random(seed)
    vals = [rng.uniform(-50, 250) for _ in range(700)]
    probs = [0.1, 0.5, 0.95]
    nb = 64
    df = spark.createDataFrame([(v,) for v in vals], "x: double")
    out = {
        r["prob"]: r["estimate"]
        for r in histogram_quantiles(df, "x", probs, n_bins=nb).collect()
    }
    w = (max(vals) - min(vals)) / nb
    svals = sorted(vals)
    for p in probs:
        # rank-p value by the histogram's count convention
        true = svals[min(len(svals) - 1, int(math.ceil(p * len(svals))) - 1)]
        assert abs(out[p] - true) <= w + 1e-9, (p, out[p], true)
    # order invariance: shuffled input -> identical estimates
    rng.shuffle(vals)
    df2 = spark.createDataFrame([(v,) for v in vals], "x: double")
    out2 = {
        r["prob"]: r["estimate"]
        for r in histogram_quantiles(df2, "x", probs, n_bins=nb).collect()
    }
    assert out == out2


@pytest.mark.parametrize("seed", [37, 41])
def test_t_closeness_matches_python_emd(spark, seed):
    from hds_functions_spark.operators.privacy import t_closeness_violations

    rng = random.Random(seed)
    rows = [
        (rng.choice("pqr"), rng.randrange(6)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g: string, s: long")
    got = {
        r["g"]: r["t_distance"]
        for r in t_closeness_violations(df, ["g"], "s", t=1e-12).collect()
    }

    vals = sorted({s for _, s in rows})
    n = len(rows)
    for g in "pqr":
        grp = [s for gg, s in rows if gg == g]
        cumq = cump = total = 0.0
        for v in vals:
            cumq += sum(1 for _, s in rows if s == v) / n
            cump += sum(1 for s in grp if s == v) / len(grp)
            total += abs(cump - cumq)
        expect = round(total / (len(vals) - 1), 6)
        if expect > 1e-12:
            assert got[g] == expect


@pytest.mark.parametrize("seed", [43, 47])
def test_cm_inner_product_bounds(spark, seed):
    from hds_functions_spark.functions.sketches import (
        cm_inner_product,
        count_min_table,
    )

    rng = random.Random(seed)
    va = [rng.randrange(150) for _ in range(400)]
    vb = [rng.randrange(150) for _ in range(250)]
    fa, fb = collections.Counter(va), collections.Counter(vb)
    true = sum(fa[k] * fb[k] for k in fa)
    da = spark.createDataFrame([(v,) for v in va], "k: long")
    db = spark.createDataFrame([(v,) for v in vb], "k: long")
    width = 128
    est = cm_inner_product(
        count_min_table(da, "k", depth=4, width=width),
        count_min_table(db, "k", depth=4, width=width),
        depth=4,
    ).collect()[0]["join_size_est"]
    assert est >= true
    assert est - true <= 3 * len(va) * len(vb) / width


@pytest.mark.parametrize("seed", [53, 59])
def test_winnowing_matches_python_on_random_text(spark, seed):
    from hds_functions_spark.operators.dedup import (
        WINNOW_BASE,
        WINNOW_PRIME,
        winnowing_fingerprints,
    )

    rng = random.Random(seed)
    k, w = 5, 6

    def py_winnow(text):
        s = text.lower()
        if len(s) < k + w - 1:
            return set()

        def gh(i):
            h = ord(s[i])
            for j in range(1, k):
                h = (h * WINNOW_BASE + ord(s[i + j])) % WINNOW_PRIME
            return h

        hs = [gh(i) for i in range(len(s) - k + 1)]
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    texts = [
        "".join(rng.choice("abc XYZ.,") for _ in range(rng.randint(0, 60)))
        for _ in range(20)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id: long, text: string"
    )
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(
        df, gram_size=k, window=w
    ).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == py_winnow(t), i
