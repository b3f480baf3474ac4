"""Driver-side config I/O: small CSV codelists and JSON config files.

Parity target: ``/root/reference`` ``csv_utils.py:18-177`` +
``json_utils.py:10-99``. These are deliberately driver-side (pandas/json)
paths for SMALL config artifacts — codelists, table directories, value maps —
guarded by row-count thresholds. Large-data CSV belongs to
``spark.read.csv`` (see :func:`read_csv_distributed`).
"""

from __future__ import annotations

import json
import os
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .environment import get_spark_session, resolve_path

__all__ = [
    "read_csv_file",
    "write_csv_file",
    "create_dict_from_csv",
    "read_json_file",
    "write_json_file",
    "read_csv_distributed",
    "read_jsonl_corpus",
]


def read_csv_file(
    path: str,
    repo: str | None = None,
    keep_default_na: bool = False,
    **kwargs: Any,
) -> DataFrame:
    """Small-CSV reader: pandas on the driver -> ``createDataFrame``.

    ``keep_default_na=False`` keeps empty strings as ``""`` rather than NaN
    (codelist semantics). Parity: reference ``csv_utils.py:18-48``.
    """
    resolved = resolve_path(path, repo)
    pdf = pd.read_csv(resolved, keep_default_na=keep_default_na, **kwargs)
    spark = get_spark_session()
    return spark.createDataFrame(pdf)


def write_csv_file(
    df: DataFrame,
    path: str,
    repo: str | None = None,
    index: bool = False,
    max_rows_threshold: int = 1000,
    **kwargs: Any,
) -> None:
    """Small-CSV writer with an eager row-count guard.

    ValueError if the DataFrame exceeds ``max_rows_threshold`` rows (two
    actions by design: count + collect) or is empty; IOError wraps write
    failures. Parity: reference ``csv_utils.py:51-105``.
    """
    resolved = resolve_path(path, repo)
    n_rows = df.count()
    if n_rows > max_rows_threshold:
        raise ValueError(
            f"DataFrame has {n_rows} rows, exceeding the maximum of "
            f"{max_rows_threshold} for a driver-side CSV write."
        )
    if n_rows == 0:
        raise ValueError("Cannot write an empty DataFrame to CSV.")
    directory = os.path.dirname(resolved)
    if directory and not os.path.isdir(directory):
        raise ValueError(f"Directory does not exist: {directory}")
    try:
        df.toPandas().to_csv(resolved, index=index, **kwargs)
    except OSError as exc:  # pragma: no cover
        raise IOError(f"Failed to write CSV to {resolved}: {exc}") from exc


def create_dict_from_csv(
    path: str,
    key_column: str,
    value_columns,
    retain_column_names: bool = False,
    cast_key_as_string: bool = True,
    repo: str | None = None,
) -> dict:
    """Build a lookup dict from a small CSV (driver-side, pandas only).

    Single value column -> scalar values; multiple -> list per key, or
    ``{colname: value}`` dicts when ``retain_column_names``. Duplicate keys
    raise ValueError. Parity: reference ``csv_utils.py:108-177``.
    """
    resolved = resolve_path(path, repo)
    pdf = pd.read_csv(resolved, keep_default_na=False)
    if isinstance(value_columns, str):
        value_columns = [value_columns]
    for col in [key_column, *value_columns]:
        if col not in pdf.columns:
            raise ValueError(f"Column '{col}' not found in CSV {resolved}.")
    if pdf[key_column].duplicated().any():
        dupes = pdf[key_column][pdf[key_column].duplicated()].tolist()
        raise ValueError(f"Duplicate keys in column '{key_column}': {dupes}")

    keys = pdf[key_column].astype(str) if cast_key_as_string else pdf[key_column]
    if len(value_columns) == 1 and not retain_column_names:
        return dict(zip(keys, pdf[value_columns[0]]))
    if retain_column_names:
        return {
            k: row._asdict() if hasattr(row, "_asdict") else dict(row)
            for k, row in zip(keys, pdf[value_columns].to_dict("records"))
        }
    return {k: list(vals) for k, vals in zip(keys, pdf[value_columns].itertuples(index=False))}


def read_json_file(path: str, repo: str | None = None) -> dict:
    """JSON config loader that REJECTS duplicate keys (ValueError).

    Parity: reference ``json_utils.py:10-63`` (``object_pairs_hook``
    duplicate detector).
    """
    resolved = resolve_path(path, repo)

    def _reject_duplicates(pairs):
        seen: dict = {}
        for key, value in pairs:
            if key in seen:
                raise ValueError(f"Duplicate key in JSON file: '{key}'")
            seen[key] = value
        return seen

    with open(resolved) as fh:
        return json.load(fh, object_pairs_hook=_reject_duplicates)


def write_json_file(
    data, path: str, repo: str | None = None, indent: int = 4
) -> None:
    """JSON config writer; ValueError if the target directory is missing.

    Parity: reference ``json_utils.py:66-99``.
    """
    resolved = resolve_path(path, repo)
    directory = os.path.dirname(resolved)
    if directory and not os.path.isdir(directory):
        raise ValueError(f"Directory does not exist: {directory}")
    with open(resolved, "w") as fh:
        json.dump(data, fh, indent=indent)


def read_csv_distributed(path: str, spark: SparkSession | None = None, **options) -> DataFrame:
    """Scale path the reference lacks: executor-side CSV scan.

    ``spark.read.csv`` with header+schema-inference defaults — for data-sized
    CSVs where the driver-side pandas path (1000-row guard) is wrong.
    """
    spark = spark or get_spark_session()
    opts = {"header": "true", "inferSchema": "true", **options}
    return spark.read.options(**opts).csv(path)


def read_jsonl_corpus(
    path: str,
    spark: SparkSession | None = None,
    schema=None,
    corrupt_column: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """Distributed JSON-Lines corpus reader — the interchange format
    training-data pipelines actually exchange (one JSON document per
    line, millions of lines per file).

    With an explicit ``schema`` the scan skips Spark's inference pass
    (one full extra read of the data at corpus scale) and runs PERMISSIVE:
    malformed lines land in ``corrupt_column`` instead of failing the job
    — corrupt records are a fact of crawled corpora, and a reader that
    dies on line 3 billion is not a reader. Without a schema, inference
    applies (fine for exploration, wrong for production — pass the schema).

    Returns the DataFrame as read; filter ``corrupt_column IS NULL`` for
    the clean subset, or select the corrupt lines for quarantine. Spark
    caveat: a query whose referenced columns are ONLY the corrupt column
    is rejected on raw JSON scans (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN) — select at least one data column alongside
    (quarantine writes naturally do), or cache the parsed frame first.
    """
    spark = spark or get_spark_session()
    reader = spark.read.options(
        **{"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_column,
           **options}
    )
    if schema is not None:
        from pyspark.sql.types import StringType, StructField, StructType

        target: StructType = (
            schema.schema if hasattr(schema, "schema") else schema
        )
        if corrupt_column not in [f.name for f in target.fields]:
            target = StructType(
                list(target.fields) + [StructField(corrupt_column, StringType())]
            )
        reader = reader.schema(target)
    return reader.json(path)
