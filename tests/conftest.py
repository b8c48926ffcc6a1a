"""Shared fixtures: one SparkSession per test run, one DuckDB connection.

SPARK_GRAFT_TEST_SF selects the scale dir for parity tests
(default sf0.001 for speed; CI/driver verifies at sf0.01).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from mric_bak_etl_spark.session import get_spark
from mric_bak_etl_spark.tables import TABLE_NAMES

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mric-bak-etl-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup (raw parquet, no casts)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    yield con
    con.close()
