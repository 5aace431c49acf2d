"""gap_fill semantics on a hand-built series with known holes."""

from __future__ import annotations

import pytest

from potoos_spark.operators.gapfill import gap_fill

B = 10


@pytest.fixture()
def holey(spark):
    # grid 0..50 step 10; buckets 10, 30, 40 missing
    rows = [("k", 0, 1.0), ("k", 20, 5.0), ("k", 50, 11.0)]
    return spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double")


def _by_ts(df):
    return {r["ts_ms"]: (r["value"], r["is_filled"]) for r in df.collect()}


def test_null_fill_densifies(spark, holey):
    out = _by_ts(gap_fill(holey, B, fill="null"))
    assert set(out) == {0, 10, 20, 30, 40, 50}
    assert out[10] == (None, True)
    assert out[20] == (5.0, False)


def test_locf_carries_forward(spark, holey):
    out = _by_ts(gap_fill(holey, B, fill="locf"))
    assert out[10] == (1.0, True)
    assert out[30] == (5.0, True)
    assert out[40] == (5.0, True)
    assert out[50] == (11.0, False)


def test_linear_interpolates(spark, holey):
    out = _by_ts(gap_fill(holey, B, fill="linear"))
    assert out[10] == (pytest.approx(3.0), True)  # between 1.0@0 and 5.0@20
    assert out[30] == (pytest.approx(7.0), True)  # between 5.0@20 and 11.0@50
    assert out[40] == (pytest.approx(9.0), True)
    assert out[0] == (1.0, False)


def test_bad_fill_rejected(holey):
    with pytest.raises(ValueError):
        gap_fill(holey, B, fill="spline")
