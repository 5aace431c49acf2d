"""Sketch tier: no SQL oracle (approximate by design) — instead pin
the HLL error envelope against exact distinct counts, and pin
mergeability (union of fine sketches ≈ coarse exact)."""

from __future__ import annotations

import duckdb
import pytest

from potoos_spark.operators.sketch import (
    approx_distinct,
    hll_distinct,
    hll_union_distinct,
)
from potoos_spark.catalog.common import table
from tests.conftest import SF_ORACLE_DIR

# lgConfigK=12 → ~1.6% RSE; 3σ ≈ 5%. approx_count_distinct rsd=0.05.
REL_TOL = 0.05


def _exact(by: str) -> dict:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT {by}, COUNT(DISTINCT l_partkey) FROM "
        f"'{SF_ORACLE_DIR}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    con.close()
    return {r[0]: r[1] for r in rows}


@pytest.fixture(scope="module")
def exact_by_flag():
    return _exact("l_returnflag")


def _assert_close(approx: dict, exact: dict):
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= REL_TOL * e, (k, approx[k], e)


def test_hll_distinct_within_error(spark, exact_by_flag):
    li = table(spark, SF_ORACLE_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in hll_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    _assert_close(got, exact_by_flag)


def test_hll_union_matches_direct_sketch(spark, exact_by_flag):
    """Union of per-(flag,status) sketches ≈ the coarse exact count —
    the mergeability contract that makes sketches a rollup."""
    li = table(spark, SF_ORACLE_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in hll_union_distinct(
            li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_partkey"
        ).collect()
    }
    _assert_close(got, exact_by_flag)


def test_approx_count_distinct_within_rsd(spark, exact_by_flag):
    li = table(spark, SF_ORACLE_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in approx_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    _assert_close(got, exact_by_flag)
