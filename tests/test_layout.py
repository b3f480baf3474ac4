"""Z-order layout tests: bit-exact Morton codes and the locality property
that makes z-sorted files prunable for 2-D predicates."""

import pytest
from pyspark.sql import functions as F

from hds_functions_spark.functions.layout import (
    morton_code,
    quantize_to_bins,
    zorder_column,
)


def test_morton_code_bit_exact(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "a: long, b: long"
    )
    rows = df.select(morton_code(F.col("a"), F.col("b"), 8).alias("z")).collect()

    def py_morton(a, b, bits=8):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert [r["z"] for r in rows] == [
        py_morton(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)]
    ]
    # canonical small cases: (1,0)->1, (0,1)->2, (1,1)->3
    assert py_morton(1, 0) == 1 and py_morton(0, 1) == 2


def test_quantize_bins_clamp_and_null(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (-5.0,), (200.0,), (None,)], "v: double"
    )
    out = [r["q"] for r in df.select(
        quantize_to_bins("v", 0.0, 100.0, 4).alias("q")).collect()]
    assert out[0] == 0 and out[2] == 15       # edges map to first/last bin
    assert out[3] == 0 and out[4] == 15       # out-of-range clamps
    assert out[5] is None                     # null passes through
    assert 6 <= out[1] <= 8                   # midpoint lands mid-bin

    with pytest.raises(ValueError, match="lo < hi"):
        quantize_to_bins("v", 5.0, 5.0)
    with pytest.raises(ValueError, match="bits"):
        morton_code(F.col("v"), F.col("v"), 0)


def test_zorder_locality_beats_single_column_sort(spark):
    """Rows adjacent in z-order are close in BOTH dimensions: the mean
    2-D neighbour distance under z-sort must clearly beat a sort on one
    column alone (which leaves the other dimension random)."""
    import random

    rng = random.Random(3)
    rows = [(i, rng.uniform(0, 1000), rng.uniform(0, 1000)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id: long, x: double, y: double")
    z = df.select(
        "x", "y",
        zorder_column("x", "y", 0.0, 1000.0, 0.0, 1000.0, bits=8).alias("z"),
    )

    def mean_neighbour_dist(ordered):
        pts = [(r["x"], r["y"]) for r in ordered]
        d = [abs(a[0] - b[0]) + abs(a[1] - b[1]) for a, b in zip(pts, pts[1:])]
        return sum(d) / len(d)

    d_z = mean_neighbour_dist(z.orderBy("z").collect())
    d_x = mean_neighbour_dist(z.orderBy("x").collect())
    assert d_z < 0.5 * d_x  # z-sort halves (at least) the 2-D spread


def test_bucket_by_quantiles_balanced(spark):
    from hds_functions_spark.functions.layout import bucket_by_quantiles

    df = spark.range(0, 1000).withColumnRenamed("id", "v")
    out = bucket_by_quantiles(df, "v", 4)
    sizes = {r["bucket"]: r["count"] for r in out.groupBy("bucket").count().collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert all(200 <= n <= 300 for n in sizes.values())  # ~equal frequency
    # monotone: every value in bucket i is <= every value in bucket i+1
    maxes = {r["bucket"]: r["m"] for r in
             out.groupBy("bucket").agg(F.max("v").alias("m")).collect()}
    mins = {r["bucket"]: r["m"] for r in
            out.groupBy("bucket").agg(F.min("v").alias("m")).collect()}
    for i in range(3):
        assert maxes[i] <= mins[i + 1]


def test_bucket_by_quantiles_null_gets_null_bucket(spark):
    from hds_functions_spark.functions.layout import bucket_by_quantiles

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0), (4, None)],
        "id long, v double",
    )
    out = {r["id"]: r["bucket"] for r in bucket_by_quantiles(df, "v", 2).collect()}
    assert out[4] is None  # NULL input must not land in bucket 0
    assert out[0] == 0 and out[3] == 1


def test_bucket_by_quantiles_validates(spark):
    import pytest
    from hds_functions_spark.functions.layout import bucket_by_quantiles

    with pytest.raises(ValueError, match="n_buckets"):
        bucket_by_quantiles(spark.range(5), "id", 1)


def test_bucket_by_quantiles_no_global_sort(spark):
    from hds_functions_spark.functions.layout import bucket_by_quantiles

    plan = bucket_by_quantiles(
        spark.range(0, 100).withColumnRenamed("id", "v"), "v", 8
    )._jdf.queryExecution().executedPlan().toString()
    # the docstring claims: no global sort, no one-partition window
    assert "rangepartitioning" not in plan.lower()
    assert "Window" not in plan


def test_pruning_simulation_sorted_layout_prunes(spark):
    from hds_functions_spark.functions.layout import pruning_simulation

    # 1024 rows where bin_a == sort key bucket: sorting by 'good' makes
    # files pure in bin_a; 'bad' (a shuffled arrival key) does not
    df = (
        spark.range(0, 1024)
        .select(
            F.col("id").alias("good"),
            ((F.col("id") * 7919) % 1024).alias("bad"),
            (F.col("id") / 64).cast("long").alias("bin_a"),
            F.lit(0).cast("long").alias("bin_b"),
        )
    )
    out = {
        r["layout"]: r
        for r in pruning_simulation(
            df, "bad", "good", "bin_a", "bin_b",
            n_files=16, box=(2, 3, 0, 0), exact=True,
        ).collect()
    }
    assert out["zorder"]["n_scanned"] == 2   # bins 2,3 -> 2 of 16 files
    assert out["arrival"]["n_scanned"] == 16  # shuffled: every file overlaps
    assert out["zorder"]["scan_frac"] == 0.125

    # the default (exact=False, approx sketch cuts — the production
    # setting) must still show the layout effect: the sorted layout
    # prunes nearly everything, arrival order prunes nothing
    approx = {
        r["layout"]: r
        for r in pruning_simulation(
            df, "bad", "good", "bin_a", "bin_b",
            n_files=16, box=(2, 3, 0, 0),
        ).collect()
    }
    assert approx["arrival"]["n_scanned"] == 16
    assert approx["zorder"]["n_scanned"] <= 3  # cuts off by <= sketch err


def test_join_key_audit(spark):
    from hds_functions_spark.operators.quality import join_key_audit

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,)], "k long"
    )
    right = spark.createDataFrame([(1,), (2,), (2,), (4,)], "rk long")
    row = join_key_audit(left, right, "k", "rk").first()
    assert row["n_left_keys"] == 3 and row["n_right_keys"] == 3
    assert row["n_both"] == 2
    assert row["n_left_only"] == 1 and row["n_right_only"] == 1
    assert row["max_left_mult"] == 3 and row["max_right_mult"] == 2
    # exact inner-join cardinality: key 1 -> 3*1, key 2 -> 1*2
    assert row["n_join_rows"] == 5


class TestPlanCompaction:
    def _manifest(self, spark, sizes, part=None):
        rows = [
            ((part or "p"), i, s) for i, s in enumerate(sizes)
        ]
        return spark.createDataFrame(
            rows, "part string, file_id long, size_bytes long"
        )

    def test_sequential_fill_bins(self, spark):
        from hds_functions_spark.functions.layout import plan_compaction

        # sizes sorted desc: 90, 80, 40, 30, 10; target 100
        # cumulative-before: 0, 90, 170, 210, 240 -> bins 0,0,1,2,2
        m = self._manifest(spark, [40, 90, 10, 80, 30])
        out = {
            r["file_id"]: (r["bin"], r["bin_bytes"], r["bin_files"])
            for r in plan_compaction(
                m, target_bytes=100, partition_cols=["part"]
            ).collect()
        }
        assert out[1] == (0, 170, 2)   # 90 opens bin 0
        assert out[3] == (0, 170, 2)   # 80 still fits the window
        assert out[0] == (1, 40, 1)    # 40 crosses the target boundary
        assert out[4] == (2, 40, 2)
        assert out[2] == (2, 40, 2)

    def test_oversize_file_gets_own_bin(self, spark):
        from hds_functions_spark.functions.layout import plan_compaction

        m = self._manifest(spark, [500, 50, 40])
        out = {
            r["file_id"]: r["bin"]
            for r in plan_compaction(
                m, target_bytes=100, partition_cols=["part"]
            ).collect()
        }
        assert out[0] == 0
        assert out[1] == 5  # cumulative 500 before it
        assert out[2] == 5

    def test_partitions_independent(self, spark):
        from hds_functions_spark.functions.layout import plan_compaction

        # cumulative-before fill: 0, 60, 120 -> bins 0, 0, 1 per partition
        # (the second 60 overshoots the target by one file, by design)
        a = self._manifest(spark, [60, 60, 60], part="a")
        b = self._manifest(spark, [60, 60, 60], part="b")
        out = plan_compaction(
            a.unionByName(b), target_bytes=100, partition_cols=["part"]
        ).collect()
        by_part = {}
        for r in out:
            by_part.setdefault(r["part"], set()).add(r["bin"])
        assert by_part == {"a": {0, 1}, "b": {0, 1}}

    def test_validates_target(self, spark):
        import pytest

        from hds_functions_spark.functions.layout import plan_compaction

        m = self._manifest(spark, [10])
        with pytest.raises(ValueError, match="target_bytes"):
            plan_compaction(m, target_bytes=0)


class TestBucketByQuantilesDesc:
    """bucket_by_quantiles_desc: the ntile-replacement (r14) — 1-based
    DESCENDING buckets from percentile cuts, per group or global."""

    def _df(self, spark, vals, grp=None):
        if grp is None:
            return spark.createDataFrame(
                [(i, float(v)) for i, v in enumerate(vals)], "id int, x double"
            )
        return spark.createDataFrame(
            [(i, g, float(v)) for i, (g, v) in enumerate(zip(grp, vals))],
            "id int, g string, x double",
        )

    def test_global_descending_terciles(self, spark):
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        # 9 distinct values: cuts at p(1/3)=3.667, p(2/3)=6.333
        df = self._df(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9])
        out = {
            r["id"]: r["bucket"]
            for r in bucket_by_quantiles_desc(df, "x", 3).collect()
        }
        # bucket 1 = head (highest), 3 = tail (lowest)
        assert out == {0: 3, 1: 3, 2: 3, 3: 2, 4: 2, 5: 2, 6: 1, 7: 1, 8: 1}

    def test_boundary_tie_goes_to_better_bucket(self, spark):
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        # heavy tie mass ON the cut: with values [1,1,1,2,2,2] and 2
        # buckets, the median cut is 1.5; every 2 >= no cut... cut list
        # [1.5]: x=2 counts it (2 >= 1.5) -> bucket 1; x=1 -> bucket 2.
        df = self._df(spark, [1, 1, 1, 2, 2, 2])
        out = {
            r["x"]: r["bucket"]
            for r in bucket_by_quantiles_desc(df, "x", 2).collect()
        }
        assert out == {1.0: 2, 2.0: 1}
        # ALL-tied column: the single cut equals the value, ties go to
        # the better bucket -> everything lands in bucket 1, never split
        # (ntile would have split 3/3 by the tiebreak column)
        df2 = self._df(spark, [5, 5, 5, 5])
        got = {
            r["bucket"]
            for r in bucket_by_quantiles_desc(df2, "x", 2).collect()
        }
        assert got == {1}

    def test_grouped_cuts_are_per_group(self, spark):
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        # group a: 1..4 (median 2.5), group b: 100..400 (median 250) —
        # a global cut would put ALL of a in the tail; per-group cuts
        # split each group 2/2
        df = self._df(
            spark,
            [1, 2, 3, 4, 100, 200, 300, 400],
            grp=["a", "a", "a", "a", "b", "b", "b", "b"],
        )
        out = bucket_by_quantiles_desc(
            df, "x", 2, group_cols=["g"]
        ).collect()
        by_grp = {}
        for r in out:
            by_grp.setdefault(r["g"], []).append((r["x"], r["bucket"]))
        for g, pairs in by_grp.items():
            got = dict(pairs)
            lo, hi = min(got), max(got)
            assert got[lo] == 2 and got[hi] == 1, (g, got)

    def test_null_scores_get_null_bucket(self, spark):
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        df = spark.createDataFrame(
            [(0, 1.0), (1, 2.0), (2, None), (3, 4.0)], "id int, x double"
        )
        out = {
            r["id"]: r["bucket"]
            for r in bucket_by_quantiles_desc(df, "x", 2).collect()
        }
        assert out[2] is None
        assert out[0] == 2 and out[3] == 1

    def test_null_group_key_is_a_real_group(self, spark):
        """Rows with a NULL group key must be bucketed among themselves
        (the ntile PARTITION BY semantics this function re-spells), not
        silently dropped by the cut-attach join (r15, advice)."""
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        df = spark.createDataFrame(
            [
                (0, "a", 1.0), (1, "a", 2.0), (2, "a", 3.0), (3, "a", 4.0),
                (4, None, 10.0), (5, None, 20.0), (6, None, 30.0),
                (7, None, 40.0),
            ],
            "id int, g string, x double",
        )
        out = bucket_by_quantiles_desc(df, "x", 2, group_cols=["g"]).collect()
        assert len(out) == 8  # nothing dropped
        null_grp = {r["x"]: r["bucket"] for r in out if r["g"] is None}
        # per-group cuts: the NULL group's own median splits it 2/2
        assert null_grp == {10.0: 2, 20.0: 2, 30.0: 1, 40.0: 1}
        a_grp = {r["x"]: r["bucket"] for r in out if r["g"] == "a"}
        assert a_grp == {1.0: 2, 2.0: 2, 3.0: 1, 4.0: 1}

    def test_small_group_lands_in_head(self, spark):
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        # a 1-row group: every cut equals the value -> bucket 1
        df = self._df(spark, [7], grp=["solo"])
        [row] = bucket_by_quantiles_desc(
            df, "x", 3, group_cols=["g"]
        ).collect()
        assert row["bucket"] == 1

    def test_validates_n_buckets(self, spark):
        import pytest

        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        with pytest.raises(ValueError, match="n_buckets"):
            bucket_by_quantiles_desc(self._df(spark, [1.0]), "x", 1)

    def test_no_window_no_sort_in_plan(self, spark):
        from hds_functions_spark.functions.layout import (
            bucket_by_quantiles_desc,
        )

        df = self._df(spark, list(range(100)), grp=["g%d" % (i % 3) for i in range(100)])
        plan = (
            bucket_by_quantiles_desc(df, "x", 4, group_cols=["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "Sort " not in plan
        assert "BroadcastHashJoin" in plan
