"""Config I/O tests: CSV/JSON helpers with guards and error paths."""

import json

import pytest

from hds_functions_spark import (
    create_dict_from_csv,
    read_csv_file,
    read_json_file,
    write_csv_file,
    write_json_file,
)


def test_read_csv_keeps_empty_strings(spark, tmp_path):
    p = tmp_path / "codes.csv"
    p.write_text("Name,Age,Gender\nAlice,30,\nBob,25,M\n")
    df = read_csv_file(str(p))
    rows = {r["Name"]: r for r in df.collect()}
    assert rows["Alice"]["Gender"] == ""  # keep_default_na=False


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = tmp_path / "out.csv"
    write_csv_file(df, str(out))
    df2 = read_csv_file(str(out))
    assert df2.count() == 2


def test_write_csv_guards(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(20)], ["v"])
    with pytest.raises(ValueError, match="exceeding"):
        write_csv_file(df, str(tmp_path / "big.csv"), max_rows_threshold=10)
    empty = df.filter("v < 0")
    with pytest.raises(ValueError, match="empty"):
        write_csv_file(empty, str(tmp_path / "empty.csv"))
    with pytest.raises(ValueError, match="Directory does not exist"):
        write_csv_file(df.limit(1), str(tmp_path / "missing_dir" / "x.csv"))


def test_create_dict_from_csv_single_value(tmp_path):
    p = tmp_path / "map.csv"
    p.write_text("Name,Age,Gender\nAlice,30,F\nBob,25,M\n")
    d = create_dict_from_csv(str(p), "Name", "Age")
    assert d == {"Alice": 30, "Bob": 25}


def test_create_dict_from_csv_multi_value(tmp_path):
    p = tmp_path / "map.csv"
    p.write_text("Name,Age,Gender\nAlice,30,F\n")
    d = create_dict_from_csv(str(p), "Name", ["Age", "Gender"])
    assert d == {"Alice": [30, "F"]}
    d2 = create_dict_from_csv(
        str(p), "Name", ["Age", "Gender"], retain_column_names=True
    )
    assert d2 == {"Alice": {"Age": 30, "Gender": "F"}}


def test_create_dict_duplicate_keys(tmp_path):
    p = tmp_path / "dup.csv"
    p.write_text("Name,Age\nAlice,30\nAlice,31\n")
    with pytest.raises(ValueError, match="Duplicate keys"):
        create_dict_from_csv(str(p), "Name", "Age")


def test_read_json_rejects_duplicate_keys(tmp_path):
    p = tmp_path / "dup.json"
    p.write_text('{"a": 1, "a": 2}')
    with pytest.raises(ValueError, match="Duplicate key"):
        read_json_file(str(p))


def test_json_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    data = {"t": {"database": "db", "table_name": "tbl"}}
    write_json_file(data, str(p))
    assert read_json_file(str(p)) == data
    assert json.loads(p.read_text()) == data


def test_write_json_missing_dir(tmp_path):
    with pytest.raises(ValueError, match="Directory does not exist"):
        write_json_file({}, str(tmp_path / "nope" / "x.json"))


def test_read_jsonl_corpus_permissive(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from hds_functions_spark.sources.config_io import read_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "this line is not json at all\n"
        '{"doc_id": "not a long", "text": 3}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = read_jsonl_corpus(str(p), spark, schema=schema)
    assert "_corrupt_record" in df.columns
    clean = df.filter(F.col("_corrupt_record").isNull())
    corrupt = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    # both the non-JSON line and the type-mismatched record are quarantined
    # with their original text preserved (a data column must be selected
    # alongside — Spark rejects corrupt-column-only queries on raw JSON)
    bad = [r["_corrupt_record"] for r in corrupt.select("doc_id", "_corrupt_record").collect()]
    assert len(bad) == 2 and all(b for b in bad)
    # custom corrupt-column name, schema passed as a DataFrame to copy
    df2 = read_jsonl_corpus(
        str(p), spark, schema=clean.select("doc_id", "text"),
        corrupt_column="_bad",
    )
    assert "_bad" in df2.columns
    bad2 = df2.filter(F.col("_bad").isNotNull()).select("doc_id", "_bad").collect()
    assert len(bad2) == 2
