"""Spark-native mirror of the reference retrieval tests (SURVEY.md §5)
plus per-operator checks for A1-A16 / F1-F4 / S2."""

from __future__ import annotations

import math

import pytest

from potoos_spark.config import TimeSeriesConfig
from potoos_spark.operators import retrieval as R


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_config_validation():
    with pytest.raises(ValueError):
        TimeSeriesConfig(aggregation_type="avg")  # bucket required
    with pytest.raises(ValueError):
        TimeSeriesConfig(aggregation_type="median", bucket_size_msec=10)
    TimeSeriesConfig(aggregation_type="avg", bucket_size_msec=10)


def test_time_and_value_filters(series4):
    cfg = TimeSeriesConfig(from_time=2000, to_time=3000)
    assert rows(R.read_series(series4.drop("seq"), cfg)) == [
        ("k", 2000, 20.0),
        ("k", 3000, 30.0),
    ]
    cfg = TimeSeriesConfig(filter_by_ts=[1000, 4000])
    assert [r[1] for r in rows(R.read_series(series4.drop("seq"), cfg))] == [1000, 4000]
    cfg = TimeSeriesConfig(filter_by_min_value=15.0, filter_by_max_value=35.0)
    assert [r[2] for r in rows(R.read_series(series4.drop("seq"), cfg))] == [20.0, 30.0]


def test_unbounded_sentinels(series4):
    cfg = TimeSeriesConfig(from_time="-", to_time="+")
    assert len(rows(R.read_series(series4.drop("seq"), cfg))) == 4


def test_reversed_order(series4):
    cfg = TimeSeriesConfig(reversed=True)
    assert [r[1] for r in rows(R.read_series(series4.drop("seq"), cfg))] == [
        4000,
        3000,
        2000,
        1000,
    ]


def test_count_limit_per_series(spark):
    rows_in = [("a", t, float(t)) for t in (1000, 2000, 3000)] + [
        ("b", t, float(t)) for t in (1000, 2000, 3000)
    ]
    df = spark.createDataFrame(rows_in, "series_key string, ts_ms bigint, value double")
    got = rows(R.read_series(df, TimeSeriesConfig(count=2)))
    assert got == [("a", 1000, 1000.0), ("a", 2000, 2000.0), ("b", 1000, 1000.0), ("b", 2000, 2000.0)]
    got = rows(R.read_series(df, TimeSeriesConfig(count=2, reversed=True)))
    assert got == [("a", 3000, 3000.0), ("a", 2000, 2000.0), ("b", 3000, 3000.0), ("b", 2000, 2000.0)]


# buckets of 2000ms, epoch-aligned: 0:[ts=1000], 2000:[2000,3000], 4000:[4000]
@pytest.mark.parametrize(
    "agg,expected",
    [
        ("avg", {0: 10.0, 2000: 25.0, 4000: 40.0}),
        ("sum", {0: 10.0, 2000: 50.0, 4000: 40.0}),
        ("min", {0: 10.0, 2000: 20.0, 4000: 40.0}),
        ("max", {0: 10.0, 2000: 30.0, 4000: 40.0}),
        ("range", {0: 0.0, 2000: 10.0, 4000: 0.0}),
        ("count", {0: 1.0, 2000: 2.0, 4000: 1.0}),
        ("first", {0: 10.0, 2000: 20.0, 4000: 40.0}),
        ("last", {0: 10.0, 2000: 30.0, 4000: 40.0}),
        ("std.p", {0: 0.0, 2000: 5.0, 4000: 0.0}),
        ("std.s", {0: None, 2000: math.sqrt(50.0), 4000: None}),
        ("var.p", {0: 0.0, 2000: 25.0, 4000: 0.0}),
        ("var.s", {0: None, 2000: 50.0, 4000: None}),
    ],
)
def test_all_twelve_aggregators(series4, agg, expected):
    cfg = TimeSeriesConfig(aggregation_type=agg, bucket_size_msec=2000)
    got = {r[1]: r[2] for r in rows(R.read_series(series4, cfg))}
    assert got == pytest.approx(expected)


def test_align_shifts_buckets(series4):
    # align to 500 → bucket boundaries ..., 500, 2500, 4500
    cfg = TimeSeriesConfig(aggregation_type="sum", bucket_size_msec=2000, align=500)
    got = {r[1]: r[2] for r in rows(R.read_series(series4, cfg))}
    assert got == {500: 30.0, 2500: 70.0}
    # align='start' anchors to from_time → boundaries 1000, 3000
    cfg = TimeSeriesConfig(
        from_time=1000, aggregation_type="sum", bucket_size_msec=2000, align="start"
    )
    got = {r[1]: r[2] for r in rows(R.read_series(series4, cfg))}
    assert got == {1000: 30.0, 3000: 70.0}


def test_bucket_timestamp_labels(series4):
    for bt, keys in [
        ("-", {0, 2000, 4000}),
        ("~", {1000, 3000, 5000}),
        ("+", {2000, 4000, 6000}),
    ]:
        cfg = TimeSeriesConfig(
            aggregation_type="avg", bucket_size_msec=2000, bucket_timestamp=bt
        )
        got = {r[1] for r in rows(R.read_series(series4, cfg))}
        assert got == keys, bt


def test_latest_dedup(spark):
    rows_in = [("k", 1000, 1.0, 1), ("k", 1000, 9.0, 2), ("k", 2000, 2.0, 3)]
    df = spark.createDataFrame(rows_in, "series_key string, ts_ms bigint, value double, seq bigint")
    got = rows(R.read_series(df, TimeSeriesConfig(latest=True)))
    assert got == [("k", 1000, 9.0), ("k", 2000, 2.0)]


def test_min_points_guard(spark):
    rows_in = [("short", t, 1.0) for t in (1, 2, 3)] + [
        ("long", t, 1.0) for t in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows_in, "series_key string, ts_ms bigint, value double")
    kept = {r[0] for r in R.min_points_guard(df).select("series_key").distinct().collect()}
    assert kept == {"long"}


def test_empty_series_yields_empty(spark):
    df = spark.createDataFrame([], "series_key string, ts_ms bigint, value double")
    assert R.read_series(df, TimeSeriesConfig()).count() == 0


def test_metadata_arithmetic(series4):
    # pinned by reference tests/test_client.py:175-177
    meta = R.series_metadata(series4.drop("seq")).collect()[0]
    assert meta.start_ts_ms == 1000
    assert meta.end_ts_ms == 4000
    assert meta.duration_ms == 3000
    assert meta.data_points_analyzed == 4


def test_series_frame_from_events(spark):
    df = R.events_series(spark, "/root/testdata/sf0.001")
    # __raw_ts: the storage-unit twin column that keeps time filters
    # pushdown-eligible (dropped by read_series output projection)
    assert df.columns == ["series_key", "ts_ms", "value", "seq", "__raw_ts"]
    assert df.count() > 0
