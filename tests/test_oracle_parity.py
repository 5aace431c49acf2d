"""t2-style correctness: every catalog query vs its DuckDB oracle.

Runs at sf0.01 (the driver's correctness scale) by default; set
SPARK_GRAFT_ORACLE_SF_DIR to change. Exact float comparison — the
catalog is engineered for bit-exact cross-engine results.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_ORACLE_DIR
from tests.oracle_harness import compare, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE_DIR)
    yield c
    c.close()


def test_every_query_has_callable_and_oracle_alignment():
    assert QUERIES, "queries() is empty"
    unknown = set(ORACLES) - set(QUERIES)
    assert not unknown, f"oracle_sql has keys missing from queries(): {unknown}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    df = QUERIES[name](spark, SF_ORACLE_DIR)
    diff = compare(df, ORACLES[name], con)
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns
