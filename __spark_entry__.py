"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship cohort-attrition query at sf0.001;
``queries()`` exposes every implemented operator as (spark, sf_dir) ->
DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL per query.
Implementations live in ``hds_functions_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hds_functions_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    flagship,
    ordered_query_names,
)
import hds_functions_spark.registry_ext  # noqa: E402,F401  (registers extension queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries without a prior driver-green CORRECTNESS row come
    first (the driver's gate verifies the first 50 entries)."""
    return {name: QUERIES[name] for name in ordered_query_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same aliases)."""
    return {
        name: ORACLES[name] for name in ordered_query_names() if name in ORACLES
    }
