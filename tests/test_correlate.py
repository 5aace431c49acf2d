"""Correlator semantics: a series correlated against its own lagged
copy must peak exactly at that lag."""

from __future__ import annotations

import pytest

from potoos_spark.operators.correlate import best_shift, cross_correlate

LAG = 5_000


@pytest.fixture()
def lagged_pair(spark):
    vals = [(i % 7) * 1.0 + (3.0 if i % 11 == 0 else 0.0) for i in range(200)]
    rows = [("a", 1_000_000 + i * 1_000, v) for i, v in enumerate(vals)]
    rows += [("b", 1_000_000 + i * 1_000 + LAG, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double")


def test_best_shift_recovers_lag(spark, lagged_pair):
    shifts = [s * 1_000 for s in range(-8, 9)]
    row = best_shift(lagged_pair, "a", "b", shifts).first()
    assert row["shift_ms"] == LAG
    assert row["r"] == pytest.approx(1.0)


def test_exact_and_streaming_corr_agree(spark, lagged_pair):
    from pyspark.sql import functions as F

    df = lagged_pair.withColumn("value", F.col("value") * 100)
    a = {
        r["shift_ms"]: r["r"]
        for r in cross_correlate(df, "a", "b", [0, LAG], exact=True).collect()
    }
    b = {
        r["shift_ms"]: r["r"]
        for r in cross_correlate(df, "a", "b", [0, LAG], exact=False).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9)
