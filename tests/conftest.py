"""Shared session-scoped local SparkSession for the test suite."""

import pytest

from hds_functions_spark.plans import build_session


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="hds_functions_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield session
