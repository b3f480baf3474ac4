"""KMV distinct sketch: exactness below k, estimator accuracy above k,
hash determinism, null handling, plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.functions.sketches import kmv_distinct, kmv_hash


def test_hash_matches_md5_arithmetic(spark):
    df = spark.createDataFrame([(1,), (42,), (999,)], "v long")
    got = {
        r["v"]: r["u"]
        for r in df.select("v", kmv_hash("v").alias("u")).collect()
    }
    for v in (1, 42, 999):
        expect = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / (
            1 << 60
        )
        assert got[v] == expect


def test_exact_below_k(spark):
    # 10 distinct values, k=64 -> sketch holds everything, estimate exact
    df = spark.range(100).select((F.col("id") % 10).alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["estimate"] == 10.0


def test_estimator_within_bound_above_k(spark):
    # 5000 distinct, k=256 -> relative error well inside 5/sqrt(k-2)
    df = spark.range(5000).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["n_kept"] == 256
    assert abs(row["estimate"] - 5000) / 5000 < 5 / (254 ** 0.5)


def test_grouped_estimates(spark):
    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("v"),  # 1000 distinct per group
    )
    rows = {r["g"]: r for r in kmv_distinct(df, "v", ["g"], k=128).collect()}
    assert set(rows) == {0, 1, 2}
    for r in rows.values():
        assert abs(r["estimate"] - 1000) / 1000 < 5 / (126 ** 0.5)


def test_nulls_never_enter_sketch(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)], "v: long"
    )
    row = kmv_distinct(df, "v", k=8).collect()[0]
    assert row["n_kept"] == 2 and row["estimate"] == 2.0


def test_duplicates_do_not_inflate(spark):
    once = spark.range(500).select(F.col("id").alias("v"))
    tenfold = once.crossJoin(spark.range(10)).select("v")
    a = kmv_distinct(once, "v", k=64).collect()[0]
    b = kmv_distinct(tenfold, "v", k=64).collect()[0]
    assert a["estimate"] == b["estimate"]  # sketch sees distinct values only


def test_validates_k(spark):
    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "v", k=2)


def test_global_sketch_avoids_single_partition_window(spark):
    df = spark.range(1000).select(F.col("id").alias("v"))
    plan = (
        kmv_distinct(df, "v", k=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ungrouped path must be the distributed TakeOrdered top-k, not a
    # row_number window over one partition
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


class TestHll:
    def test_matches_python_reference(self, spark):
        import math

        from hds_functions_spark.functions.sketches import hll_distinct

        def ref(values, m=256, t=52):
            regs = {}
            for v in values:
                h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                b, tail = h >> t, h & ((1 << t) - 1)
                rho = t + 1 if tail == 0 else t + 1 - tail.bit_length()
                regs[b] = max(regs.get(b, 0), rho)
            alpha = 0.7213 / (1 + 1.079 / m)
            s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
            e = alpha * m * m / s
            zeros = m - len(regs)
            if e <= 2.5 * m and zeros > 0:
                e = m * math.log(m / zeros)
            return round(e, 4)

        for n in (50, 1000):
            df = spark.range(n).select(F.col("id").alias("v"))
            row = hll_distinct(df, "v").collect()[0]
            assert row["estimate"] == ref(range(n))

    def test_accuracy_within_bound(self, spark):
        from hds_functions_spark.functions.sketches import hll_distinct

        df = spark.range(10000).select(F.col("id").alias("v"))
        row = hll_distinct(df, "v").collect()[0]
        # 3 sigma of the 1.04/sqrt(256) standard error
        assert abs(row["estimate"] - 10000) / 10000 < 3 * 1.04 / 16

    def test_duplicates_and_nulls_ignored(self, spark):
        from hds_functions_spark.functions.sketches import hll_distinct

        once = spark.range(300).select(F.col("id").alias("v"))
        dup = once.crossJoin(spark.range(5)).select("v").unionByName(
            spark.createDataFrame([(None,)], "v: long")
        )
        a = hll_distinct(once, "v").collect()[0]["estimate"]
        b = hll_distinct(dup, "v").collect()[0]["estimate"]
        assert a == b

    def test_grouped_no_window_in_plan(self, spark):
        from hds_functions_spark.functions.sketches import hll_distinct

        df = spark.range(1000).select(
            (F.col("id") % 4).alias("g"), F.col("id").alias("v")
        )
        plan = (
            hll_distinct(df, "v", ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan  # two combinable aggregates only
        rows = {r["g"]: r["estimate"] for r in
                hll_distinct(df, "v", ["g"]).collect()}
        for est in rows.values():
            assert abs(est - 250) / 250 < 3 * 1.04 / 16


class TestCountMin:
    def test_never_underestimates_and_exact_when_sparse(self, spark):
        from hds_functions_spark.functions.sketches import (
            count_min_lookup, count_min_table,
        )

        # 5 distinct values, width 256 -> collisions vanishingly unlikely
        rows = [(v,) for v in ["a"] * 50 + ["b"] * 30 + ["c"] * 10 + ["d", "e"]]
        df = spark.createDataFrame(rows, "v: string")
        sketch = count_min_table(df, "v")
        items = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",), ("e",), ("missing",)],
            "v: string",
        )
        est = {r["v"]: r["estimate"] for r in
               count_min_lookup(sketch, items, "v").collect()}
        assert est["a"] == 50 and est["b"] == 30 and est["c"] == 10
        assert est["d"] == 1 and est["e"] == 1
        assert est["missing"] >= 0  # absent items: only collision mass

    def test_overestimate_property_under_heavy_collisions(self, spark):
        import hashlib

        from hds_functions_spark.functions.sketches import (
            count_min_lookup, count_min_table,
        )

        # 2000 distinct values into width 16: collisions guaranteed
        df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
        sketch = count_min_table(df, "v", width=16)
        items = df.limit(40)
        out = count_min_lookup(sketch, items, "v", width=16).collect()
        assert all(r["estimate"] >= 1 for r in out)  # true count is 1

        # cross-check one estimate against a python reference
        def col(v, j, w=16):
            return int(hashlib.md5(f"{v}#{j}".encode()).hexdigest()[:15], 16) % w

        counters = {}
        for i in range(2000):
            for j in range(3):
                key = (j, col(str(i), j))
                counters[key] = counters.get(key, 0) + 1
        probe = out[0]["v"]
        expect = min(counters.get((j, col(probe, j)), 0) for j in range(3))
        assert next(r["estimate"] for r in out if r["v"] == probe) == expect

    def test_sketch_size_bounded_and_mergeable(self, spark):
        from hds_functions_spark.functions.sketches import count_min_table

        df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
        sketch = count_min_table(df, "v", depth=3, width=64)
        assert sketch.count() <= 3 * 64
        # merging two halves' sketches == sketch of the union
        a = count_min_table(df.filter(F.col("v").cast("long") < 2500),
                            "v", depth=3, width=64)
        b = count_min_table(df.filter(F.col("v").cast("long") >= 2500),
                            "v", depth=3, width=64)
        merged = (a.unionByName(b).groupBy("cm_row", "cm_col")
                  .agg(F.sum("cm_count").alias("cm_count")))
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, sketch.collect()))

    def test_validates_geometry(self, spark):
        import pytest

        from hds_functions_spark.functions.sketches import count_min_table

        df = spark.range(5).select(F.col("id").cast("string").alias("v"))
        with pytest.raises(ValueError, match="depth"):
            count_min_table(df, "v", depth=0)


# --- KMV pairwise set algebra (theta-sketch construction) ----------------

def _sets_df(spark, mapping):
    rows = [(s, v) for s, vs in mapping.items() for v in vs]
    return spark.createDataFrame(rows, "s: string, v: long")


def _ops(spark, mapping, k=256):
    from hds_functions_spark.functions.sketches import kmv_pairwise_ops

    df = _sets_df(spark, mapping)
    return {
        (r["set_a"], r["set_b"]): r
        for r in kmv_pairwise_ops(df, "v", "s", k=k).collect()
    }


def test_pairwise_exact_when_sketches_not_full(spark):
    out = _ops(spark, {
        "a": range(0, 100),
        "b": range(50, 150),
        "c": range(200, 210),
    })
    ab = out[("a", "b")]
    assert ab["theta"] == 1.0
    assert ab["union_n"] == 150 and ab["intersect_n"] == 50
    assert ab["union_est"] == 150.0 and ab["intersect_est"] == 50.0
    assert ab["jaccard_est"] == round(50 / 150, 4)
    ac = out[("a", "c")]
    assert ac["intersect_n"] == 0 and ac["union_n"] == 110
    assert ac["jaccard_est"] == 0.0


def test_pairwise_duplicates_collapse(spark):
    out = _ops(spark, {"a": [1, 1, 2, 2], "b": [2, 2, 3]})
    ab = out[("a", "b")]
    assert ab["union_n"] == 3 and ab["intersect_n"] == 1


def test_pairwise_estimates_within_bound_full_sketches(spark):
    # two 5000-element sets overlapping by 2500; k=256 full sketches
    out = _ops(spark, {
        "a": range(0, 5000),
        "b": range(2500, 7500),
    }, k=256)
    ab = out[("a", "b")]
    assert ab["theta"] < 1.0  # both sketches full
    # ~3 standard errors of 1/sqrt(k-2) ~ 19%
    assert abs(ab["union_est"] - 7500) / 7500 < 0.2
    assert abs(ab["intersect_est"] - 2500) / 2500 < 0.35
    j = ab["jaccard_est"]
    assert abs(j - 2500 / 7500) < 0.12


def test_pairwise_consistent_with_single_sketch_estimates(spark):
    # restricting either side's samples to theta keeps the single-set
    # estimator recoverable: union >= max single estimate
    from hds_functions_spark.functions.sketches import kmv_distinct

    mapping = {"a": range(0, 4000), "b": range(1000, 6000)}
    df = _sets_df(spark, mapping)
    singles = {
        r["s"]: r["estimate"]
        for r in kmv_distinct(df, "v", ["s"], k=256).collect()
    }
    out = _ops(spark, mapping, k=256)[("a", "b")]
    assert out["union_est"] >= max(singles.values()) * 0.85


def test_pairwise_validates_k(spark):
    import pytest
    from hds_functions_spark.functions.sketches import kmv_pairwise_ops

    with pytest.raises(ValueError, match="k must be"):
        kmv_pairwise_ops(_sets_df(spark, {"a": [1]}), "v", "s", k=2)


# --- mergeable histogram quantiles ---------------------------------------

def _hq(spark, rows, probs, **kw):
    from hds_functions_spark.functions.sketches import histogram_quantiles

    df = spark.createDataFrame([(float(x),) for x in rows], "x: double")
    return {
        r["prob"]: r["estimate"]
        for r in histogram_quantiles(df, "x", probs, **kw).collect()
    }


def test_histogram_quantiles_uniform_within_bin_width(spark):
    rows = range(1000)  # 0..999, range 999, 128 bins -> width ~7.8
    out = _hq(spark, rows, [0.25, 0.5, 0.9])
    for p, est in out.items():
        assert abs(est - p * 999) <= 999 / 128 + 1e-6, (p, est)


def test_histogram_quantiles_exact_with_one_value_per_bin(spark):
    # 4 values, 4 bins: each bin holds one value; p=1.0 hits the max
    out = _hq(spark, [0.0, 1.0, 2.0, 3.0], [1.0], n_bins=4)
    assert out[1.0] == 3.0


def test_histogram_quantiles_constant_column(spark):
    out = _hq(spark, [5.0] * 50, [0.5, 1.0], n_bins=16)
    assert out == {0.5: 5.0, 1.0: 5.0}


def test_histogram_quantiles_grouped(spark):
    from hds_functions_spark.functions.sketches import histogram_quantiles

    rows = [("a", float(i)) for i in range(100)] + [
        ("b", float(1000 + i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g: string, x: double")
    out = {
        (r["g"], r["prob"]): r["estimate"]
        for r in histogram_quantiles(df, "x", [0.5], ["g"]).collect()
    }
    # shared global range [0, 1099]: each group occupies ~12 of 128 bins,
    # so the median lands within one bin width of the true group median
    w = 1099 / 128
    assert abs(out[("a", 0.5)] - 49.5) <= w + 1e-6
    assert abs(out[("b", 0.5)] - 1049.5) <= w + 1e-6


def test_histogram_quantiles_merge_equals_one_pass(spark):
    """The histogram state is mergeable: binning two disjoint halves
    with the same global range and summing counts gives the identical
    estimate — verified end-to-end by splitting the input rows."""
    from hds_functions_spark.functions.sketches import histogram_quantiles

    rows = [(float((i * 7919) % 500),) for i in range(500)]
    df = spark.createDataFrame(rows, "x: double")
    full = {
        r["prob"]: r["estimate"]
        for r in histogram_quantiles(df, "x", [0.5, 0.9]).collect()
    }
    # union of arbitrary halves is the same multiset -> same histogram
    halves = df.filter("x % 2 = 0").unionAll(df.filter("x % 2 = 1"))
    again = {
        r["prob"]: r["estimate"]
        for r in histogram_quantiles(halves, "x", [0.5, 0.9]).collect()
    }
    assert full == again


def test_histogram_quantiles_validation(spark):
    import pytest
    from hds_functions_spark.functions.sketches import histogram_quantiles

    df = spark.createDataFrame([(1.0,)], "x: double")
    with pytest.raises(ValueError, match="n_bins"):
        histogram_quantiles(df, "x", [0.5], n_bins=0)
    with pytest.raises(ValueError, match="probs must be non-empty"):
        histogram_quantiles(df, "x", [])
    with pytest.raises(ValueError, match="probs must be in"):
        histogram_quantiles(df, "x", [0.0])


# --- count-min inner product (join-size estimation) ----------------------

def _cm_pair(spark, va, vb, depth=4, width=64):
    from hds_functions_spark.functions.sketches import (
        cm_inner_product,
        count_min_table,
    )

    da = spark.createDataFrame([(v,) for v in va], "k: long")
    db = spark.createDataFrame([(v,) for v in vb], "k: long")
    sa = count_min_table(da, "k", depth=depth, width=width)
    sb = count_min_table(db, "k", depth=depth, width=width)
    return cm_inner_product(sa, sb, depth=depth).collect()[0]["join_size_est"]


def test_cm_inner_product_never_underestimates(spark):
    import collections
    import random

    rng = random.Random(5)
    va = [rng.randrange(200) for _ in range(500)]
    vb = [rng.randrange(200) for _ in range(300)]
    fa, fb = collections.Counter(va), collections.Counter(vb)
    true = sum(fa[k] * fb[k] for k in fa)
    est = _cm_pair(spark, va, vb)
    assert est >= true
    # CM error bound: excess <= ||fa||_1 ||fb||_1 / width whp per row;
    # with depth 4 the min is comfortably inside 3x that
    assert est - true <= 3 * len(va) * len(vb) / 64


def test_cm_inner_product_exact_when_no_collisions(spark):
    # few distinct keys, wide sketch -> no collisions -> exact
    est = _cm_pair(spark, [1, 1, 2, 3], [1, 2, 2, 9], width=1024)
    # true join size: key1 2*1 + key2 1*2 = 4 (key 3,9 unmatched)
    assert est == 4


def test_cm_inner_product_disjoint_keys(spark):
    est = _cm_pair(spark, [1, 2, 3], [100001, 100002], width=4096)
    assert est == 0


def test_cm_inner_product_rejects_malformed_sketches(spark):
    from hds_functions_spark.functions.sketches import (
        cm_inner_product,
        count_min_table,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1, "k")], "g: int, v: string")
    ok = count_min_table(df, "v", depth=2, width=8)
    grouped = count_min_table(df, "v", group_cols=["g"], depth=2, width=8)
    with _pytest.raises(ValueError, match="GROUPED"):
        cm_inner_product(ok, grouped)
    with _pytest.raises(ValueError, match="missing"):
        cm_inner_product(ok.drop("cm_count"), ok)
    # the grouped sketch is usable once filtered + stripped
    one = grouped.filter("g = 1").select("cm_row", "cm_col", "cm_count")
    assert cm_inner_product(ok, one, depth=2).collect()[0].join_size_est == 1


def test_hll_register_factoring_matches_hll_distinct(spark):
    """hll_register_rows + hll_estimate_from_registers must equal the
    one-shot hll_distinct (the streaming path reuses the factored pair,
    so this equality is what makes batch and streaming undriftable)."""
    from hds_functions_spark.functions.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_register_rows,
    )

    df = spark.range(0, 5000).selectExpr(
        "id % 7 AS g", "CAST(id * 37 % 1900 AS STRING) AS v"
    )
    direct = {
        (r["g"],): (r["n_registers"], r["estimate"])
        for r in hll_distinct(df, "v", ["g"]).collect()
    }
    composed = {
        (r["g"],): (r["n_registers"], r["estimate"])
        for r in hll_estimate_from_registers(
            hll_register_rows(df, "v", ["g"]), ["g"]
        ).collect()
    }
    assert composed == direct
