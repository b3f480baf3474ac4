"""Deterministic sampling/splitting and profiling operator tests."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.operators.profiling import (
    profile_columns,
    tf_idf_top_terms,
)
from hds_functions_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    stratified_sample,
)


@pytest.fixture()
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(1000)], "id: long")


def test_hash_split_partitions_exhaustively(ids):
    out = hash_split(ids, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000  # every row exactly one split
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]  # roughly weighted
    # deterministic: second call identical
    out2 = hash_split(ids, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.subtract(out2).count() == 0


def test_hash_split_salt_changes_assignment(ids):
    a = hash_split(ids, "id", {"x": 0.5, "y": 0.5})
    b = hash_split(ids, "id", {"x": 0.5, "y": 0.5}, salt="v2")
    differing = a.withColumnRenamed("split", "s1").join(
        b.withColumnRenamed("split", "s2"), on="id"
    ).filter(F.col("s1") != F.col("s2")).count()
    assert differing > 0


def test_hash_split_errors(ids):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ids, "id", {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(ids, "id", {})
    with pytest.raises(ValueError, match="already exists"):
        hash_split(ids.withColumn("split", F.lit("x")), "id", {"a": 1.0})


def test_deterministic_sample_nests(ids):
    small = {r["id"] for r in deterministic_sample(ids, "id", 0.01).collect()}
    big = {r["id"] for r in deterministic_sample(ids, "id", 0.10).collect()}
    assert small <= big  # 1% sample nested inside 10% sample
    assert len(big) == pytest.approx(100, abs=40)
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(ids, "id", 1.5)


def test_stratified_sample_bounds(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(400)],
        "id: long, stratum: string",
    )
    out = stratified_sample(
        df, "id", "stratum", {"keep": 1.0}, default_fraction=0.0
    )
    got = out.groupBy("stratum").count().collect()
    assert {r["stratum"]: r["count"] for r in got} == {"keep": 200}


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")], "k: long, s: string"
    )
    rows = {r["column_name"]: r for r in profile_columns(df).collect()}
    assert rows["k"]["n_rows"] == 3
    assert rows["k"]["n_nulls"] == 0
    assert rows["k"]["n_distinct"] == 2
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["min_value"] == "a" and rows["s"]["max_value"] == "c"
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_columns(df, ["nope"])


def test_tf_idf_top_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "durian durian durian"),
        ],
        "doc_id: long, text: string",
    )
    out = tf_idf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'apple' (tf=2, rare) beats 'banana' (shared); doc 3's only term wins
    assert top == {1: "apple", 2: "cherry", 3: "durian"}
    scores = {r["doc_id"]: r["score"] for r in out}
    assert scores[3] > scores[1] > 0


def test_group_quantiles(spark):
    from hds_functions_spark.operators.profiling import group_quantiles

    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 5]] + [("b", 10)],
        "g: string, v: long",
    )
    rows = {r["g"]: r for r in
            group_quantiles(df, ["g"], "v", quantiles=[0.5]).collect()}
    assert rows["a"]["p50"] == 3.0 and rows["a"]["n_rows"] == 5
    assert rows["b"]["p50"] == 10.0
    # type-7 interpolation: median of [1,2,3,4] -> 2.5
    df2 = spark.createDataFrame([("a", v) for v in [1, 2, 3, 4]], "g: string, v: long")
    assert group_quantiles(df2, ["g"], "v", quantiles=[0.5]).collect()[0]["p50"] == 2.5


def test_embedding_centroids(spark):
    from hds_functions_spark.operators.similarity import embedding_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (1, [3.0, 2.0]), (2, [5.0, 5.0])],
        "label: long, embedding: array<double>",
    )
    rows = {r["label"]: r for r in
            embedding_centroids(df, ["label"], dim=2).collect()}
    assert rows[1]["centroid"] == [2.0, 1.0] and rows[1]["n_vectors"] == 2
    assert rows[2]["centroid"] == [5.0, 5.0] and rows[2]["n_vectors"] == 1


def test_split_invariant_to_partitioning(spark):
    """The property RNG-based df.sample lacks: assignment is identical
    under any physical layout."""
    df = spark.createDataFrame([(i,) for i in range(500)], "id: long")
    base = hash_split(df, "id", {"a": 0.5, "b": 0.5})
    shuffled = hash_split(df.repartition(13), "id", {"a": 0.5, "b": 0.5})
    assert base.subtract(shuffled).count() == 0
    assert shuffled.subtract(base).count() == 0


def test_mixture_sample_ratios(spark):
    from hds_functions_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i < 4000 else ("b" if i < 5000 else "c"))
            for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id: long, src: string")
    out = mixture_sample(df, "doc_id", "src", {"a": 0.5, "b": 0.5})
    got = {r["src"]: r["cnt"] for r in
           out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    # b (1000 rows) binds at share 0.5 -> kept ~100%; a downsampled to ~1000
    assert "c" not in got          # unweighted source dropped
    assert got["b"] > 950          # binding source kept (bucket noise only)
    assert abs(got["a"] - got["b"]) < 150   # 1:1 mixture achieved

def test_mixture_sample_deterministic_and_errors(spark):
    from hds_functions_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)],
        "doc_id: long, src: string",
    )
    a = mixture_sample(df, "doc_id", "src", {"a": 0.75, "b": 0.25}, salt="s")
    b = mixture_sample(
        df.repartition(7), "doc_id", "src", {"a": 0.75, "b": 0.25}, salt="s"
    )
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())
    with pytest.raises(ValueError, match="non-empty"):
        mixture_sample(df, "doc_id", "src", {})
    with pytest.raises(ValueError, match="positive"):
        mixture_sample(df, "doc_id", "src", {"a": 0.0})
    # no weighted source present -> empty result
    assert mixture_sample(df, "doc_id", "src", {"zz": 1.0}).count() == 0


def test_cap_per_group(spark):
    from hds_functions_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)],
        "doc_id: long, src: string",
    )
    out5 = cap_per_group(df, "doc_id", "src", 5)
    counts = {r["src"]: r["n"] for r in
              out5.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 5}
    # nested: the 5-cap is a strict subset of the 10-cap
    ids5 = {r["doc_id"] for r in out5.collect()}
    ids10 = {r["doc_id"] for r in cap_per_group(df, "doc_id", "src", 10).collect()}
    assert ids5 < ids10
    # deterministic under repartitioning
    ids5b = {r["doc_id"] for r in
             cap_per_group(df.repartition(7), "doc_id", "src", 5).collect()}
    assert ids5 == ids5b
    with pytest.raises(ValueError, match="positive"):
        cap_per_group(df, "doc_id", "src", 0)


def test_weighted_sample(spark):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i in range(2000)
         for w in ([0.0] if i % 4 == 0 else [1.0] if i % 4 == 1 else [0.5, ][0:1])],
        "id: long, w: double",
    )
    kept = weighted_sample(df, "id", "w")
    rows = kept.collect()
    ids = {r["id"] for r in rows}
    # weight 0 -> never kept; weight 1 -> always kept
    assert all(r["w"] > 0 for r in rows)
    assert all(i in ids for i in range(2000) if i % 4 == 1)
    # weight 0.5 keeps roughly half
    half = sum(1 for r in rows if r["w"] == 0.5)
    n_half = df.filter("w = 0.5").count()
    assert 0.4 * n_half < half < 0.6 * n_half
    # determinism + monotone nesting in scale
    again = {r["id"] for r in weighted_sample(df, "id", "w").collect()}
    assert again == ids
    grown = {r["id"] for r in weighted_sample(df, "id", "w", scale=1.5).collect()}
    assert ids <= grown

    import pytest

    with pytest.raises(ValueError, match="scale"):
        weighted_sample(df, "id", "w", scale=0)


class TestLeakageSafeSplit:
    def test_families_stay_together(self, spark):
        from hds_functions_spark.operators.sampling import leakage_safe_split

        docs = spark.range(100).select(F.col("id").alias("doc_id"))
        # 10 clusters of 10 docs each: component = floor(id/10)*10
        clusters = docs.select(
            "doc_id",
            (F.floor(F.col("doc_id") / 10) * 10).alias("component"),
        )
        out = leakage_safe_split(
            docs, clusters, "doc_id", {"train": 0.5, "test": 0.5}
        )
        per_group = (
            out.groupBy("_split_group")
            .agg(F.countDistinct("split").alias("ns"))
            .collect()
        )
        assert all(r["ns"] == 1 for r in per_group)  # no straddling family
        assert out.count() == 100

    def test_unmapped_rows_are_singletons(self, spark):
        from hds_functions_spark.operators.sampling import leakage_safe_split

        docs = spark.range(20).select(F.col("id").alias("doc_id"))
        clusters = spark.createDataFrame(
            [(0, 0), (1, 0)], "doc_id long, component long"
        )
        out = leakage_safe_split(
            docs, clusters, "doc_id", {"a": 0.5, "b": 0.5}
        ).collect()
        groups = {r["doc_id"]: r["_split_group"] for r in out}
        assert groups[0] == 0 and groups[1] == 0  # mapped pair shares a group
        assert all(groups[i] == i for i in range(2, 20))  # rest: singletons

    def test_split_matches_row_level_hash_on_group_key(self, spark):
        from hds_functions_spark.operators.sampling import (
            hash_split, leakage_safe_split,
        )

        docs = spark.range(50).select(F.col("id").alias("doc_id"))
        clusters = docs.select("doc_id", F.col("doc_id").alias("component"))
        a = {r["doc_id"]: r["split"] for r in leakage_safe_split(
            docs, clusters, "doc_id", {"x": 0.3, "y": 0.7}).collect()}
        b = {r["doc_id"]: r["split"] for r in hash_split(
            docs, "doc_id", {"x": 0.3, "y": 0.7}).collect()}
        assert a == b  # all-singleton clustering degenerates to row split

    def test_validates_columns(self, spark):
        import pytest

        from hds_functions_spark.operators.sampling import leakage_safe_split

        docs = spark.range(5).select(F.col("id").alias("doc_id"))
        clusters = docs.select("doc_id", F.col("doc_id").alias("component"))
        with pytest.raises(ValueError, match="id_col"):
            leakage_safe_split(docs, clusters, "nope", {"a": 1.0})
        with pytest.raises(ValueError, match="cluster_col"):
            leakage_safe_split(
                docs, clusters, "doc_id", {"a": 1.0}, cluster_col="nope"
            )
