"""Theil–Sen bucketed trend estimator: known-slope and outlier cases."""

from __future__ import annotations


def _run(spark, tmp_path, rows):
    """Write a minimal events table and run the catalog entry on it."""
    from potoos_spark.catalog.timeseries import QUERIES

    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    ).write.parquet(f"{sf}/events.parquet")
    return QUERIES["ts_theil_sen"].fn(spark, sf).collect()


def test_linear_series_recovers_slope(spark, tmp_path):
    """value = t/1000 on a dense grid: every pairwise bucket slope is
    identical, so the median equals it and slope_per_ms ≈ 1/1000."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(milliseconds=i * 1000), 1, "k", float(i))
        for i in range(128)
    ]
    out = _run(spark, tmp_path, rows)
    assert len(out) == 1
    r = out[0]
    assert r.n_buckets == 64
    # one point per ms-step: bucket means step by 2 per bucket
    assert abs(r.slope_per_bucket - 2.0) < 1e-9
    # span = 127000 - 0 + 1 ms
    assert abs(r.slope_per_ms - 2.0 / (127_001 / 64)) < 1e-12


def test_outlier_resistance(spark, tmp_path):
    """A single wild spike barely moves the median slope (unlike OLS)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(milliseconds=i * 1000), 1, "k", float(i))
        for i in range(128)
    ]
    rows[64] = (64, base + dt.timedelta(milliseconds=64_000), 1, "k", 1e6)
    out = _run(spark, tmp_path, rows)
    r = out[0]
    # spike inflates one bucket; the median over 2016 pair slopes stays
    # within a few × the clean slope (OLS would be thrown by ~1e4)
    assert abs(r.slope_per_bucket) < 10.0
