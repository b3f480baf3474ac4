"""IVF approximate-NN and embedding near-dup tests (against the exact
brute-force path as ground truth)."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.dedup import embedding_near_dup_pairs
from hds_functions_spark.operators.similarity import (
    cosine_similarity,
    cosine_topk,
    ivf_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_ivf_shape_and_validity(emb, queries):
    out = ivf_cosine_topk(emb, queries, k=5, n_centroids=8, n_probe=2).collect()
    n_queries = queries.count()
    assert len(out) == 5 * n_queries
    for r in out:
        assert 1 <= r["row_index"] <= 5
        assert r["query_id"] != r["vec_id"]
        assert -1.0 <= r["cosine_sim"] <= 1.0
    # per-query ranks are exactly 1..5 and similarity is non-increasing
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["row_index"])
        assert [r["row_index"] for r in rows] == [1, 2, 3, 4, 5]
        sims = [r["cosine_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_ivf_more_probes_improve_recall(emb, queries):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        approx = {
            (r["query_id"], r["vec_id"])
            for r in ivf_cosine_topk(
                emb, queries, k=5, n_centroids=8, n_probe=n_probe
            ).collect()
        }
        return len(approx & exact) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r8 == 1.0  # probing every list == exact
    assert r2 <= r8


def test_lsh_banded_shape_and_subset(emb, queries):
    from hds_functions_spark.operators.similarity import (
        lsh_banded_cosine_topk,
        lsh_cosine_topk,
    )

    out = lsh_banded_cosine_topk(
        emb, queries, k=5, bands=4, planes_per_band=3
    ).collect()
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {(r["query_id"], r["vec_id"]) for r in out}
    # every reported neighbour is a real corpus point with correct sim sign
    for r in out:
        assert r["query_id"] != r["vec_id"]
        assert 1 <= r["row_index"] <= 5
        assert -1.0 <= r["cosine_sim"] <= 1.0
    # OR-amplification: banded candidates are a superset of any single
    # band's — recall must be >= the single-bucket path with 12 planes
    single = {
        (r["query_id"], r["vec_id"])
        for r in lsh_cosine_topk(emb, queries, k=5, n_planes=12).collect()
    }
    assert len(got & exact) >= len(single & exact)


def test_near_dup_pairs_valid(emb):
    thresh = 0.3
    out = embedding_near_dup_pairs(emb, threshold=thresh).collect()
    # well-formed: ordered ids, no duplicates, all above threshold
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys))
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert r["cosine_sim"] >= thresh


def test_near_dup_subset_of_brute_force(spark, emb):
    thresh = 0.3
    lsh = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in embedding_near_dup_pairs(emb, threshold=thresh).collect()
    }
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    brute = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn(
                "cosine_sim",
                F.round(cosine_similarity(F.col("_va"), F.col("_vb")), 6),
            )
            .filter(F.col("cosine_sim") >= thresh)
            .select("id_a", "id_b", "cosine_sim")
        ).collect()
    }
    assert lsh <= brute
    assert len(brute) == 0 or len(lsh) / len(brute) > 0  # sanity: recall defined


def test_quantize_embeddings_properties(spark):
    from hds_functions_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [3.0, -1.5, 0.75]),
            (2, [0.0, 0.0, 0.0]),   # zero vector: scale 0, all-zero qvec
            (3, [-2.54, 1.27, 0.0]),
        ],
        "vec_id: long, embedding: array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["qvec"] == [127, -64, 32]  # round(±v/scale), half away from 0
    assert rows[1]["scale"] == pytest.approx(3.0 / 127)
    assert rows[2]["qvec"] == [0, 0, 0] and rows[2]["scale"] == 0.0
    # 1.27*127/2.54 = 63.4999... in binary double -> 63 (not a true .5 tie)
    assert rows[3]["qvec"] == [-127, 63, 0]
    # every component within int8 symmetric range
    for r in rows.values():
        assert all(-127 <= x <= 127 for x in r["qvec"])


def test_quantized_topk_matches_exact_on_separable_data(spark):
    from hds_functions_spark.operators.similarity import (
        cosine_topk,
        quantized_cosine_topk,
    )

    # two well-separated directions: quantization error (<1%) cannot
    # reorder neighbours across clusters
    base_a, base_b = [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]
    rows = []
    for i in range(10):
        v = list(base_a if i % 2 == 0 else base_b)
        v[1] += 0.01 * i
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    qs = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, qs, k=3).collect()
    }
    quant = {
        (r["query_id"], r["vec_id"])
        for r in quantized_cosine_topk(df, qs, k=3).collect()
    }
    assert quant == exact


def test_random_projection_deterministic_and_jl(spark):
    from hds_functions_spark.operators.similarity import (
        cosine_similarity,
        random_projection,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    p1 = random_projection(emb, out_dim=16)
    p2 = random_projection(emb, out_dim=16)
    assert [r["projected"] for r in p1.orderBy("vec_id").collect()] == [
        r["projected"] for r in p2.orderBy("vec_id").collect()
    ]  # matrix is code, not state
    row = p1.first()
    assert len(row["projected"]) == 16
    # JL property: projected cosine correlates with full-dim cosine
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    full = (
        a.join(b, F.col("ia") < F.col("ib"))
        .withColumn("cf", cosine_similarity(F.col("va"), F.col("vb")))
        .select("ia", "ib", "cf")
    )
    pa = p1.select(F.col("vec_id").alias("ia"), F.col("projected").alias("pa"))
    pb = p1.select(F.col("vec_id").alias("ib"), F.col("projected").alias("pb"))
    proj = (
        pa.join(pb, F.col("ia") < F.col("ib"))
        .withColumn("cp", cosine_similarity(F.col("pa"), F.col("pb")))
        .select("ia", "ib", "cp")
    )
    corr = full.join(proj, on=["ia", "ib"]).agg(F.corr("cf", "cp")).first()[0]
    # the testdata embeddings are near-uniform random — the JL worst case
    # (all true cosines cluster near 0, so distortion dominates); even
    # there the correlation must be clearly positive. Clustered data gives
    # far higher values (cf. BASELINE.md planted-cluster sweep).
    assert corr > 0.3

    with pytest.raises(ValueError, match="out_dim"):
        random_projection(emb, out_dim=0)


def test_pq_roundtrip_reduces_distance_error(spark):
    """PQ contracts: codes are valid indices; ADC distance approximates
    the true distance; reconstruction beats a random codebook."""
    import random

    from hds_functions_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    rng = random.Random(5)
    dim, m, k = 16, 4, 4
    # three planted clusters so codebooks have structure to learn
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(3)]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(emb, m=m, k=k, n_iter=2, dim=dim)
    assert len(books) == m and all(len(b) == k for b in books)
    codes = pq_encode(emb, books)
    pdf = codes.toPandas()
    assert set(pdf.columns) == {"vec_id", "code_0", "code_1", "code_2", "code_3"}
    for s in range(m):
        assert pdf[f"code_{s}"].between(0, k - 1).all()
    # ADC knn: same-cluster vectors must dominate each query's top-k
    queries = emb.filter("vec_id % 30 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    top = pq_adc_topk(codes, queries, books, k=5).collect()
    assert len(top) == 15  # 3 queries x 5
    hits = sum(1 for r in top if r.vec_id % 3 == r.query_id % 3)
    assert hits >= 12, f"ADC ranked cross-cluster vectors too high: {hits}/15"


def test_pq_validation(spark):
    from hds_functions_spark.operators.similarity import pq_adc_topk, pq_train

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divide"):
        pq_train(emb, m=2, dim=3)
    with pytest.raises(ValueError, match="k must be"):
        pq_adc_topk(emb, emb, [[[0.0]]], k=0)


def test_pca_power_recovers_planted_components(spark):
    """Matrix-free power iteration: recovers planted orthogonal
    directions on a low-rank-plus-noise dataset, components are
    near-orthonormal, and the fit is deterministic."""
    import random

    from hds_functions_spark.operators.similarity import (
        pca_power_components,
        pca_project,
    )

    rng = random.Random(3)
    d = 16
    u1 = [rng.gauss(0, 1) for _ in range(d)]
    n1 = sum(x * x for x in u1) ** 0.5
    u1 = [x / n1 for x in u1]
    u2 = [rng.gauss(0, 1) for _ in range(d)]
    dot = sum(a * b for a, b in zip(u1, u2))
    u2 = [b - dot * a for a, b in zip(u1, u2)]
    n2 = sum(x * x for x in u2) ** 0.5
    u2 = [x / n2 for x in u2]
    rows = []
    for i in range(300):
        a, b = rng.gauss(0, 5), rng.gauss(0, 2)
        vec = [3.0 + a * x + b * y + rng.gauss(0, 0.05)
               for x, y in zip(u1, u2)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mu, comps = pca_power_components(df, n_components=2, n_iter=5, dim=d)
    mu2, comps2 = pca_power_components(df, n_components=2, n_iter=5, dim=d)
    assert (mu, comps) == (mu2, comps2)  # deterministic
    v1, v2 = comps
    align1 = abs(sum(a * b for a, b in zip(v1, u1)))
    align2 = abs(sum(a * b for a, b in zip(v2, u2)))
    ortho = abs(sum(a * b for a, b in zip(v1, v2)))
    assert align1 > 0.99 and align2 > 0.99, (align1, align2)
    assert ortho < 0.01, ortho
    norm1 = sum(x * x for x in v1) ** 0.5
    assert abs(norm1 - 1.0) < 0.01
    # projections: pc_0 captures the larger variance
    pdf = pca_project(df, mu, comps).toPandas()
    assert pdf.pc_0.var() > pdf.pc_1.var() > 0
    with pytest.raises(ValueError, match="n_components"):
        pca_power_components(df, n_components=0)


def test_multiprobe_candidates_superset_of_plain(spark):
    """Multi-probe probes the exact bucket plus every Hamming-1 bucket,
    so its candidate set — and hence recall — contains plain LSH's."""
    import random

    from hds_functions_spark.operators.similarity import (
        lsh_cosine_topk,
        lsh_multiprobe_cosine_topk,
    )

    rng = random.Random(7)
    d = 16
    rows = [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(150)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter("vec_id % 30 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    plain = lsh_cosine_topk(emb, qs, k=150, n_planes=6, dim=d)
    multi = lsh_multiprobe_cosine_topk(emb, qs, k=150, n_planes=6, dim=d)
    p_pairs = {(r.query_id, r.vec_id) for r in plain.collect()}
    m_pairs = {(r.query_id, r.vec_id) for r in multi.collect()}
    assert p_pairs <= m_pairs          # superset (k large enough to keep all)
    assert len(m_pairs) > len(p_pairs)  # the probes actually add candidates
    # no duplicate (query, candidate) pairs from the probe fan-out
    rows_m = multi.collect()
    assert len(rows_m) == len({(r.query_id, r.vec_id) for r in rows_m})


def test_truncated_topk_equals_full_when_dims_cover(spark):
    """Truncating to the full dimensionality is the identity."""
    from hds_functions_spark.operators.similarity import (
        cosine_topk,
        truncated_cosine_topk,
    )

    rows = [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(6)])
            for i in range(20)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.selectExpr("vec_id as query_id", "embedding").limit(5)
    full = sorted(
        (r["query_id"], r["vec_id"], r["row_index"])
        for r in cosine_topk(emb, q, k=3).collect()
    )
    trunc = sorted(
        (r["query_id"], r["vec_id"], r["row_index"])
        for r in truncated_cosine_topk(emb, q, dims=6, k=3).collect()
    )
    assert trunc == full


def test_truncated_topk_uses_prefix_only(spark):
    """Vectors identical in the prefix but different in the tail are
    indistinguishable under truncation."""
    from hds_functions_spark.operators.similarity import (
        truncated_cosine_topk,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 9.0]),
            (2, [1.0, 0.0, -9.0]),   # same 2-dim prefix as 1
            (3, [0.0, 1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    q = spark.createDataFrame([(10, [1.0, 0.0, 0.0])],
                              ["query_id", "embedding"])
    out = truncated_cosine_topk(emb, q, dims=2, k=2).collect()
    got = [(r["vec_id"], r["cosine_sim"]) for r in out]
    # both prefix-identical vectors score cosine 1.0; tie-break by id
    assert got == [(1, 1.0), (2, 1.0)]


def test_truncated_dims_validation(spark):
    from hds_functions_spark.operators.similarity import (
        truncated_cosine_topk,
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        truncated_cosine_topk(None, None, dims=0)
