"""Seeded property-fuzz of the round-6 operators (same strategy as
test_property_round5.py): random inputs, engine output checked against
pure-Python oracles / structural invariants.

- ``bpe_train_merges``: exact merge-table parity vs an in-memory
  Sennrich-style trainer on random corpora.
- ``kmv_distinct`` / ``hll_distinct``: exact parity vs pure-Python
  estimators sharing the md5 hash protocol.
- ``pagerank``: probability-mass conservation and parity vs a Python
  power iteration with the same rounding.
- ``plan_compaction``: bin assignment matches the running-sum rule;
  bin stats consistent.
- ``bm25_scores``: parity vs a Python scorer on random tiny corpora.
- ``word_ngrams`` / ``char_ngrams``: contents equal Python slicing.
"""

from __future__ import annotations

import collections
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("seed", [5, 17])
def test_bpe_matches_reference_on_random_corpora(spark, seed):
    from hds_functions_spark.operators.bpe import bpe_train_merges

    rng = random.Random(seed)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(0, " ".join(words[:30])), (1, " ".join(words[30:]))],
        "doc_id long, text string",
    )
    got = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=4).orderBy("step").collect()
    ]

    dic = collections.Counter(tuple(w) for w in words)
    expect = []
    for _ in range(4):
        pc = collections.Counter()
        for syms, c in dic.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((a, b, cnt))
        new = collections.Counter()
        for syms, c in dic.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += c
        dic = new
    assert got == expect


@pytest.mark.parametrize("seed", [7, 29])
def test_sketches_match_python_reference(spark, seed):
    from hds_functions_spark.functions.sketches import (
        hll_distinct,
        kmv_distinct,
    )

    rng = random.Random(seed)
    values = list({rng.randint(0, 10_000) for _ in range(800)})
    df = spark.createDataFrame([(v,) for v in values], "v long")

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    # KMV reference
    k = 64
    us = sorted(h60(v) / (1 << 60) for v in values)
    kth = us[k - 1]
    expect_kmv = round((k - 1) / kth, 4) if len(us) >= k else float(len(us))
    row = kmv_distinct(df, "v", k=k).collect()[0]
    assert row["estimate"] == expect_kmv

    # HLL reference
    regs: dict[int, int] = {}
    for v in values:
        h = h60(v)
        b, tail = h >> 52, h & ((1 << 52) - 1)
        rho = 53 if tail == 0 else 53 - tail.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    e = alpha * m * m / s
    zeros = m - len(regs)
    if e <= 2.5 * m and zeros > 0:
        e = m * math.log(m / zeros)
    assert hll_distinct(df, "v").collect()[0]["estimate"] == round(e, 4)


@pytest.mark.parametrize("seed", [3, 13])
def test_pagerank_matches_python_power_iteration(spark, seed):
    from hds_functions_spark.operators.graph import pagerank

    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(12)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(30)
        }
    )
    edges = [(a, b) for a, b in edges if a != b] or [("n0", "n1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, n_iter=3).collect()
    }

    universe = sorted({x for e in edges for x in e})
    n = len(universe)
    out = collections.defaultdict(list)
    for a, b in edges:
        out[a].append(b)
    ranks = {v: round(1 / n, 9) for v in universe}
    d = 0.85
    for _ in range(3):
        contrib = collections.defaultdict(float)
        dangling = 0.0
        for v in universe:
            if out[v]:
                share = ranks[v] / len(out[v])
                for w in out[v]:
                    contrib[w] += share
            else:
                dangling += ranks[v]
        ranks = {
            v: round((1 - d) / n + d * (contrib[v] + dangling / n), 9)
            for v in universe
        }
    assert got == ranks
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.parametrize("seed", [19, 23])
def test_compaction_matches_running_sum_rule(spark, seed):
    from hds_functions_spark.functions.layout import plan_compaction

    rng = random.Random(seed)
    sizes = [rng.randint(1, 500) for _ in range(40)]
    df = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate(sizes)],
        "part string, file_id long, size_bytes long",
    )
    target = 600
    rows = plan_compaction(
        df, target_bytes=target, partition_cols=["part"]
    ).collect()
    ordered = sorted(rows, key=lambda r: (-r["size_bytes"], r["file_id"]))
    acc = 0
    for r in ordered:
        assert r["bin"] == acc // target
        acc += r["size_bytes"]
    by_bin = collections.defaultdict(lambda: [0, 0])
    for r in rows:
        by_bin[r["bin"]][0] += r["size_bytes"]
        by_bin[r["bin"]][1] += 1
    for r in rows:
        assert (r["bin_bytes"], r["bin_files"]) == tuple(by_bin[r["bin"]])


@pytest.mark.parametrize("seed", [41])
def test_bm25_matches_python_scorer(spark, seed):
    from hds_functions_spark.operators.retrieval import bm25_scores

    rng = random.Random(seed)
    vocab = ["apple", "pear", "plum", "kiwi", "fig", "date"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8))))
        for i in range(12)
    ]
    queries = [(100, "apple fig"), (200, "plum plum date")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(ddf, qdf, max_df_frac=1.0).collect()
    }

    tf = {i: collections.Counter(t.split()) for i, t in docs}
    dl = {i: sum(c.values()) for i, c in tf.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df_t = collections.Counter(
        term for c in tf.values() for term in c
    )
    expect = {}
    for qid, qt in queries:
        terms = set(qt.split())
        for i in range(n):
            s = 0.0
            hit = False
            for t in terms:
                if tf[i].get(t):
                    hit = True
                    idf = math.log(
                        1 + (n - df_t[t] + 0.5) / (df_t[t] + 0.5)
                    )
                    f = tf[i][t]
                    s += idf * (f * 2.2) / (
                        f + 1.2 * (0.25 + 0.75 * dl[i] / avgdl)
                    )
            if hit:
                expect[(qid, i)] = round(s, 6)
    assert got == expect


@pytest.mark.parametrize("seed", [2, 8])
def test_ngrams_equal_python_slicing(spark, seed):
    from hds_functions_spark.functions.text import char_ngrams, word_ngrams

    rng = random.Random(seed)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 4)))
            for _ in range(rng.randint(0, 6))
        )
        for _ in range(20)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    out = df.select(
        "i",
        word_ngrams(F.split(F.col("t"), " "), 2).alias("w"),
        char_ngrams(F.col("t"), 3).alias("c"),
    ).collect()
    for r in out:
        t = texts[r["i"]]
        toks = t.split(" ")
        expect_w = (
            [f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)]
            if len(toks) >= 2
            else []
        )
        expect_c = (
            [t[i:i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []
        )
        assert list(r["w"]) == expect_w, (t, list(r["w"]))
        assert list(r["c"]) == expect_c, (t, list(r["c"]))
