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
