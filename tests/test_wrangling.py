"""Wrangling operator tests: name cleaning + value mapping golden cases."""

import pytest

import hds_functions_spark.operators.wrangling as wrangling
from hds_functions_spark import clean_column_names, map_column_values


def test_clean_column_names_golden(spark):
    df = spark.createDataFrame([(1, 2)], ["Col@Name!", "0@ther#Name"])
    assert clean_column_names(df).columns == ["col_name_", "_0_ther_name"]


def test_clean_column_names_duplicates(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["A", "A", "A"])
    assert clean_column_names(df).columns == ["a", "a_2", "a_3"]


def test_clean_column_names_preserves_values(spark):
    df = spark.createDataFrame([("x", 1)], ["Name Col", "Age"])
    cleaned = clean_column_names(df)
    assert cleaned.columns == ["name_col", "age"]
    row = cleaned.collect()[0]
    assert row["name_col"] == "x" and row["age"] == 1


def test_map_column_values_new_column(spark):
    df = spark.createDataFrame([("A",), ("B",), ("C",), ("D",)], ["label"])
    mapped = map_column_values(
        df, {"A": "Apple", "B": "Banana", "C": "Cherry"}, "label", "mapped"
    )
    got = {r["label"]: r["mapped"] for r in mapped.collect()}
    assert got == {"A": "Apple", "B": "Banana", "C": "Cherry", "D": None}


def test_map_column_values_overwrite(spark):
    df = spark.createDataFrame([("A",), ("Z",)], ["label"])
    mapped = map_column_values(df, {"A": "Apple"}, "label")
    assert mapped.columns == ["label"]
    got = sorted((r["label"] or "") for r in mapped.collect())
    assert got == ["", "Apple"]


def test_map_column_values_errors(spark):
    df = spark.createDataFrame([("A", 1)], ["label", "mapped"])
    with pytest.raises(ValueError, match="does not exist"):
        map_column_values(df, {"A": "x"}, "missing")
    with pytest.raises(ValueError, match="Empty mapping"):
        map_column_values(df, {}, "label")
    with pytest.raises(ValueError, match="already exists"):
        map_column_values(df, {"A": "x"}, "label", "mapped")


def test_map_column_values_broadcast_join_path(spark, monkeypatch):
    # Force the large-dict broadcast-join strategy; semantics must match the
    # literal-map path exactly, including null for unmapped keys.
    monkeypatch.setattr(wrangling, "_MAP_LITERAL_MAX_ENTRIES", 1)
    df = spark.createDataFrame([("A",), ("B",), (None,)], "label: string")
    mapped = map_column_values(df, {"A": "Apple", "X": "Xray"}, "label", "mapped")
    got = {r["label"]: r["mapped"] for r in mapped.collect()}
    assert got == {"A": "Apple", "B": None, None: None}


def test_align_to_schema(spark):
    from hds_functions_spark.operators.wrangling import align_to_schema

    target = spark.createDataFrame(
        [], "a: long, b: string, c: double"
    )
    df = spark.createDataFrame(
        [(1.0, "x", "drop-me")], "a: double, b: string, z: string"
    )
    out = align_to_schema(df, target)
    assert out.columns == ["a", "b", "c"]
    row = out.collect()[0]
    assert row["a"] == 1 and isinstance(row["a"], int)  # cast double -> long
    assert row["c"] is None                              # missing -> typed null
    assert out.schema["c"].dataType.simpleString() == "double"
    with pytest.raises(ValueError, match="missing=\\['c'\\] extra=\\['z'\\]"):
        align_to_schema(df, target, strict=True)


def test_winsorize_global_and_grouped(spark):
    from hds_functions_spark.operators.wrangling import winsorize_columns
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(g, float(v)) for g in ("a", "b") for v in range(1, 101)]
        + [("a", 1e6), ("a", None)],
        "g: string, v: double",
    )
    # global: the 1e6 outlier is clipped to the 95th percentile
    out = winsorize_columns(df, ["v"], 0.05, 0.95)
    mx = out.agg(F.max("v")).first()[0]
    assert mx < 1000
    # nulls pass through
    assert out.filter(F.col("v").isNull()).count() == 1
    # grouped: group b is untouched by a's outlier
    grouped = winsorize_columns(df, ["v"], 0.05, 0.95, group_by=["g"])
    b_max = grouped.filter(F.col("g") == "b").agg(F.max("v")).first()[0]
    assert 95.0 <= b_max <= 96.0
    # schema/row preservation
    assert grouped.columns == df.columns
    assert grouped.count() == df.count()
    # unclipped values pass through bit-exact (no blanket rounding)
    mid = grouped.filter((F.col("g") == "b") & (F.col("v") == 50.0)).count()
    assert mid == 1
    # rows with a null group key match no bounds row and pass unclipped
    nullg = spark.createDataFrame(
        [(None, 1e6)], "g: string, v: double"
    ).union(df)
    ng = winsorize_columns(nullg, ["v"], 0.05, 0.95, group_by=["g"])
    passed = ng.filter(F.col("g").isNull()).first()["v"]
    assert passed == 1e6


def test_winsorize_errors(spark):
    import pytest
    from hds_functions_spark.operators.wrangling import winsorize_columns

    df = spark.createDataFrame([(1.0,)], "v: double")
    with pytest.raises(ValueError, match="at least one"):
        winsorize_columns(df, [])
    with pytest.raises(ValueError, match="not in DataFrame"):
        winsorize_columns(df, ["nope"])
    with pytest.raises(ValueError, match="lower < upper"):
        winsorize_columns(df, ["v"], 0.9, 0.1)
    with pytest.raises(ValueError, match="exact"):
        winsorize_columns(df, ["v"], method="median-ish")


def test_winsorize_approx_method(spark):
    from pyspark.sql import functions as F

    from hds_functions_spark.operators.wrangling import winsorize_columns

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 1001)] + [(1e9,)], "v: double"
    )
    out = winsorize_columns(df, ["v"], 0.05, 0.95, method="approx")
    mx, mn = out.agg(F.max("v"), F.min("v")).first()
    # outlier clipped to ~p95, low tail to ~p5 (sketch error is tiny here)
    assert 900 <= mx <= 1000 and 40 <= mn <= 60
    assert out.count() == df.count()


def test_mad_outlier_flags(spark):
    from hds_functions_spark.operators.wrangling import mad_outlier_flags

    # group g (7 values incl. outlier): median 5, MAD 2 -> z(100) ~ 32
    data = [("g", float(v)) for v in (2, 3, 4, 5, 6, 7)] + [("g", 100.0)]
    # group h: all-identical values -> MAD 0 -> null z, false flag
    data += [("h", 2.0)] * 4
    df = spark.createDataFrame(data, "grp: string, v: double")
    out = mad_outlier_flags(df, "v", group_by=["grp"])
    rows = out.collect()
    assert out.count() == len(data)  # row-preserving
    g = {r["v"]: r for r in rows if r["grp"] == "g"}
    assert g[100.0]["v_is_outlier"] is True
    assert g[5.0]["v_robust_z"] == 0.0 and g[5.0]["v_is_outlier"] is False
    assert g[3.0]["v_is_outlier"] is False
    h = [r for r in rows if r["grp"] == "h"]
    assert all(r["v_robust_z"] is None and r["v_is_outlier"] is False for r in h)

    import pytest

    with pytest.raises(ValueError, match="not in DataFrame"):
        mad_outlier_flags(df, "nope")
    with pytest.raises(ValueError, match="positive"):
        mad_outlier_flags(df, "v", threshold=0)
