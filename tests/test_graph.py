"""PageRank: hand-computed ranks, dangling mass, conservation,
determinism, validation, and plan boundedness."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_uniform_init_zero_iterations(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=0).collect()}
    assert out == {"a": round(1 / 3, 9), "b": round(1 / 3, 9),
                   "c": round(1 / 3, 9)}


def test_cycle_is_stationary(spark):
    # a 3-cycle's uniform distribution is the exact fixed point
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=4).collect()}
    for v in out.values():
        assert v == pytest.approx(1 / 3, abs=1e-6)


def test_hand_computed_one_iteration(spark):
    # a -> b, a -> c, b -> c; c dangling. N=3, d=0.85, r0 = 1/3 each.
    # dangling mass = r(c) = 1/3
    # in(b) = r(a)/2; in(c) = r(a)/2 + r(b)/1
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=1).collect()}
    r0 = round(1 / 3, 9)
    base = 0.15 / 3 + 0.85 * (r0 / 3)
    assert out["a"] == pytest.approx(base, abs=1e-9)
    assert out["b"] == pytest.approx(base + 0.85 * (r0 / 2), abs=1e-9)
    assert out["c"] == pytest.approx(base + 0.85 * (r0 / 2 + r0), abs=1e-9)


def test_dangling_free_replay_includes_zero_dangling_term(spark):
    # r16: dangling-free graphs skip the per-iteration dangling leg
    # (one upfront emptiness probe). Pin bit-equivalence against a pure-
    # Python replay that KEEPS the dangling term (always exactly 0.0
    # here): the skip must be a float no-op, not an approximation.
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")]
    e = _edges(spark, pairs)
    n_iter, d = 3, 0.85
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=n_iter).collect()}

    nodes = sorted({x for p in pairs for x in p})
    n = len(nodes)
    outs = {}
    for s, t in set(pairs):
        outs.setdefault(s, set()).add(t)
    ranks = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in ranks.items() if v not in outs)  # 0.0
        nxt = {}
        for v in nodes:
            cin = sum(
                ranks[u] / len(outs[u]) for u in nodes if v in outs.get(u, ())
            )
            nxt[v] = round((1 - d) / n + d * (cin + dangling / n), 9)
        ranks = nxt
    assert out == ranks


def test_total_rank_conserved(spark):
    # with dangling redistribution the ranks stay a probability vector
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")])
    total = (
        pagerank(e, n_iter=3).agg(F.sum("rank")).collect()[0][0]
    )
    assert total == pytest.approx(1.0, abs=1e-6)


def test_higher_indegree_ranks_higher(spark):
    # hub: everyone links to z
    e = _edges(spark, [("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")])
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=3).collect()}
    assert out["z"] == max(out.values())


def test_duplicate_edges_collapse(spark):
    once = _edges(spark, [("a", "b"), ("b", "a")])
    dup = _edges(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    r1 = sorted(map(tuple, pagerank(once, n_iter=2).collect()))
    r2 = sorted(map(tuple, pagerank(dup, n_iter=2).collect()))
    assert r1 == r2


def test_deterministic_across_runs(spark):
    e = _edges(spark, [(f"n{i}", f"n{(i * 7) % 20}") for i in range(40)])
    a = sorted(map(tuple, pagerank(e, n_iter=3).collect()))
    b = sorted(map(tuple, pagerank(e, n_iter=3).collect()))
    assert a == b


def test_validation(spark):
    e = _edges(spark, [("a", "b")])
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(e, n_iter=-1)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.5)


def test_null_endpoints_dropped(spark):
    e = spark.createDataFrame(
        [("a", "b"), (None, "c"), ("c", None)], "src: string, dst: string"
    )
    nodes = {r["node"] for r in pagerank(e, n_iter=1).collect()}
    assert nodes == {"a", "b"}  # null-endpoint edges contribute nothing


# --- triangle counting ---------------------------------------------------

def _tri(spark, edges):
    from hds_functions_spark.operators.graph import triangle_count

    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}


def test_single_triangle(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 1)]) == {1: 1, 2: 1, 3: 1}


def test_square_has_no_triangles(spark):
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {}


def test_k4_four_triangles(spark):
    # K4: each node sits in C(3,2) = 3 triangles; 4 triangles total
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_duplicates_self_loops_and_orientation_collapse(spark):
    # same triangle given twice in mixed orientations + a self-loop
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2)]
    assert _tri(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_two_triangles_sharing_an_edge(spark):
    # {1,2,3} and {2,3,4}: nodes 2,3 in both
    edges = [(1, 2), (2, 3), (3, 1), (2, 4), (3, 4)]
    assert _tri(spark, edges) == {1: 1, 2: 2, 3: 2, 4: 1}


def test_matches_bruteforce_random_graph(spark):
    import itertools
    import random

    rng = random.Random(13)
    nodes = range(30)
    edges = [
        (a, b)
        for a in nodes
        for b in nodes
        if a < b and rng.random() < 0.25
    ]
    eset = set(edges)
    expect = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in eset and (y, z) in eset and (x, z) in eset:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1
    assert _tri(spark, edges) == expect


# --- weighted PageRank ---------------------------------------------------

def test_weighted_pagerank_equal_weights_match_unweighted(spark):
    e = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "c", 2.0), ("c", "a", 2.0), ("a", "c", 2.0)],
        "src string, dst string, w double",
    )
    uw = {r["node"]: r["rank"] for r in pagerank(e, n_iter=3).collect()}
    wt = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=3, weight_col="w").collect()
    }
    assert uw == wt


def test_weighted_pagerank_flow_proportional_to_weight(spark):
    # a sends 9x more rank to b than to c
    e = spark.createDataFrame(
        [("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=1, weight_col="w").collect()
    }
    # after one iteration from uniform: b gets 0.9 of a's rank share
    assert out["b"] > out["c"]
    d, n = 0.85, 3
    expect_b = round((1 - d) / n + d * (0.9 / n), 9)
    expect_c = round((1 - d) / n + d * (0.1 / n), 9)
    assert out["b"] == expect_b and out["c"] == expect_c


def test_weighted_pagerank_nonpositive_weights_dropped(spark):
    e = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "c", 0.0), ("a", "d", None),
         ("b", "a", 1.0)],
        "src string, dst string, w double",
    )
    out = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=2, weight_col="w").collect()
    }
    # c and d receive no flow and are not sources: absent from the graph
    assert set(out) == {"a", "b"}


def test_weighted_pagerank_duplicate_edges_sum(spark):
    dup = spark.createDataFrame(
        [("a", "b", 1.0), ("a", "b", 2.0), ("a", "c", 3.0),
         ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    merged = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 3.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    r1 = sorted(
        tuple(r) for r in pagerank(dup, n_iter=2, weight_col="w").collect()
    )
    r2 = sorted(
        tuple(r)
        for r in pagerank(merged, n_iter=2, weight_col="w").collect()
    )
    assert r1 == r2


def test_pagerank_checkpoint_cadence_invariant(spark):
    """Ranks are identical for any lineage-truncation cadence — the knob
    changes plan management, never numbers."""
    from hds_functions_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src: long, dst: long"
    )
    base = {r.node: r.rank
            for r in pagerank(edges, n_iter=4, checkpoint_every=1).collect()}
    for cad in (2, 3, 99):
        got = {r.node: r.rank
               for r in pagerank(edges, n_iter=4, checkpoint_every=cad).collect()}
        assert got == base, f"cadence {cad}"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(edges, checkpoint_every=0)


def test_pagerank_reliable_checkpoint_when_dir_set(spark, tmp_path):
    """With a checkpoint dir configured, truncation uses RELIABLE
    checkpoint() — verified by files appearing under the dir."""
    import os
    from hds_functions_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src: long, dst: long"
    )
    sc = spark.sparkContext
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        ranks = {r.node: r.rank for r in pagerank(edges, n_iter=2).collect()}
        assert len(ranks) == 3
        written = [os.path.join(dp, f)
                   for dp, _dn, fn in os.walk(ckdir) for f in fn]
        assert written, "no reliable checkpoint files were written"
    finally:
        sc._jsc.sc().setCheckpointDir(None)


def test_label_propagation_splits_bridged_cliques(spark):
    """Two triangles joined by one bridge edge resolve into two
    communities; the result is deterministic and cadence-invariant."""
    from hds_functions_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    both = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(both, "src long, dst long")
    out = {r.node: r.community
           for r in label_propagation(df, n_iter=4).collect()}
    assert out[1] == out[2] == out[3]
    assert out[4] == out[5] == out[6]
    assert out[1] != out[4]
    out2 = {r.node: r.community
            for r in label_propagation(df, n_iter=4, checkpoint_every=2).collect()}
    assert out == out2


def test_label_propagation_python_replay(spark):
    """Engine rounds equal a pure-Python synchronous LPA on a random
    graph (most-frequent in-neighbour label, ties to smallest)."""
    import collections
    import random

    from hds_functions_spark.operators.graph import label_propagation

    rng = random.Random(13)
    edges = {(rng.randint(1, 30), rng.randint(1, 30)) for _ in range(60)}
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation(df, n_iter=3).collect()}

    nodes = {a for a, _ in edges} | {b for _, b in edges}
    labels = {n: n for n in nodes}
    for _ in range(3):
        votes: dict = collections.defaultdict(collections.Counter)
        for a, b in edges:
            votes[b][labels[a]] += 1
        new = {}
        for n in nodes:
            if votes[n]:
                best = min((-c, lab) for lab, c in votes[n].items())
                new[n] = best[1]
            else:
                new[n] = labels[n]
        labels = new
    assert got == labels


def test_label_propagation_isolated_and_validation(spark):
    from hds_functions_spark.operators.graph import label_propagation

    # node 9 only ever SENDS (no in-edges): keeps its own label
    df = spark.createDataFrame([(9, 1), (1, 2), (2, 1)], "src long, dst long")
    out = {r.node: r.community
           for r in label_propagation(df, n_iter=2).collect()}
    assert out[9] == 9
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_iter"):
        label_propagation(df, n_iter=-1)


def test_k_core_peels_tail_keeps_clique(spark):
    """A 4-clique with a pendant chain: the 2-core is exactly the
    clique plus any cycle — pendant nodes peel off, and the cascade
    matters (removing the leaf drops its neighbor below k)."""
    from hds_functions_spark.operators.graph import k_core

    # 4-clique 0-1-2-3, chain 3-4-5 (4 and 5 peel in cascade)
    und = [(a, b) for a in range(4) for b in range(4) if a != b]
    und += [(3, 4), (4, 3), (4, 5), (5, 4)]
    edges = spark.createDataFrame(und, "src long, dst long")
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(edges, k=2, n_iter=3).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # clique only, full degrees


def test_k_core_budget_and_validation(spark):
    from hds_functions_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    # k=1: every connected node survives with its degree
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(edges, k=1, n_iter=2).collect()
    }
    assert got == {0: 1, 1: 2, 2: 1}
    # n_iter=0: no peeling — degrees of the full graph
    got0 = {
        r["node"]: r["core_degree"]
        for r in k_core(edges, k=5, n_iter=0).collect()
    }
    assert got0 == {0: 1, 1: 2, 2: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        k_core(edges, k=0)
    with _pytest.raises(ValueError, match="n_iter"):
        k_core(edges, k=2, n_iter=-1)
