from __future__ import annotations

import os

import pytest

from potoos_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_session("potoos_spark_tests")
    yield s


@pytest.fixture()
def series4(spark):
    """Canonical reference fixture: ts=[1000,2000,3000,4000] ms,
    values=[10,20,30,40] (tests/test_client.py:80,219)."""
    rows = [("k", 1000, 10.0, 1), ("k", 2000, 20.0, 2), ("k", 3000, 30.0, 3), ("k", 4000, 40.0, 4)]
    return spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double, seq bigint")


@pytest.fixture()
def spike4(spark):
    """Spike variant (40 -> 100), tests/test_client.py:146-151."""
    rows = [("k", 1000, 10.0), ("k", 2000, 20.0), ("k", 3000, 30.0), ("k", 4000, 100.0)]
    return spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double")
