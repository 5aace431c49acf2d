"""Sharded trailing-range windows (operators/rolling.py) must be
BIT-IDENTICAL to the one-partition-per-series window — the sharding is
a physical-parallelism rewrite, not an approximation (VERDICT r7
item 5: "bit-identical output (oracle unchanged)")."""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W, functions as F

from potoos_spark.operators import rolling

HOUR = 3_600_000


def _global_bollinger(ev):
    """The pre-r8 unsharded form, kept here as the reference."""
    w = W.partitionBy("series_key").orderBy("ts_ms").rangeBetween(-HOUR, 0)
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    n = F.count("*").over(w)
    a = F.sum(v100).over(w)
    b = F.sum(v100 * v100).over(w)
    mean = a.cast("double") / (n * 100).cast("double")
    var4 = (n * b - a * a).cast("double") / (n * n * 10_000).cast("double")
    return ev.select(
        "series_key",
        "ts_ms",
        "seq",
        n.alias("n_in_hour"),
        mean.alias("mean"),
        F.sqrt(var4).alias("std"),
    )


def _sharded_bollinger(ev, chunk_ms=None):
    aug, w = rolling.sharded_trailing_window(ev, HOUR, chunk_ms=chunk_ms)
    v100 = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    n = F.count("*").over(w)
    a = F.sum(v100).over(w)
    b = F.sum(v100 * v100).over(w)
    mean = a.cast("double") / (n * 100).cast("double")
    var4 = (n * b - a * a).cast("double") / (n * n * 10_000).cast("double")
    return rolling.emit_owned(
        aug.select(
            "series_key",
            "ts_ms",
            "seq",
            n.alias("n_in_hour"),
            mean.alias("mean"),
            F.sqrt(var4).alias("std"),
            rolling.OWNED,
            rolling.CHUNK,
        )
    )


def _key(rows):
    return sorted(tuple(r) for r in rows)


def test_sharded_equals_global_on_real_events(spark):
    """Full-column equality (including the float mean/std bits) on the
    sf0.001 events table, at the default chunk and at a pathological
    chunk exactly equal to the window (maximum carry-in)."""
    from potoos_spark.catalog.common import events_frame
    from tests.conftest import SF_DIR

    ev = events_frame(spark, SF_DIR)
    want = _key(_global_bollinger(ev).collect())
    assert want
    got_default = _key(_sharded_bollinger(ev).collect())
    assert got_default == want
    got_tight = _key(_sharded_bollinger(ev, chunk_ms=HOUR).collect())
    assert got_tight == want


def test_carry_in_crosses_chunk_boundary():
    """Hand-built rows around a chunk boundary: the first row of a new
    chunk must still see predecessors within the window (carried in),
    and rows older than the window must NOT leak back in."""
    from potoos_spark.session import get_session

    spark = get_session("rolling_boundary")
    chunk = 10_000
    win = 1_000
    rows = [
        # (series, ts): 9.4k and 9.8k sit in chunk 0's carry band;
        # 8.5k is inside chunk 0 but outside the window of 10.2k
        ("s", 8_500, 1.0),
        ("s", 9_400, 2.0),
        ("s", 9_800, 3.0),
        ("s", 10_200, 4.0),  # window = {9.4k, 9.8k, 10.2k} -> n=3
        ("s", 11_500, 5.0),  # window = {11.5k} only (10.2k is 1.3k back)
    ]
    ev = spark.createDataFrame(rows, "series_key string, ts_ms long, value double")
    aug, w = rolling.sharded_trailing_window(
        ev, win, keys=("series_key",), chunk_ms=chunk
    )
    out = rolling.emit_owned(
        aug.select(
            "ts_ms",
            F.count("*").over(w).alias("n"),
            rolling.OWNED,
            rolling.CHUNK,
        )
    )
    got = {r["ts_ms"]: r["n"] for r in out.collect()}
    assert got == {8_500: 1, 9_400: 2, 9_800: 2, 10_200: 3, 11_500: 1}


def test_owned_row_count_is_preserved():
    """Replicas must never leak: output cardinality == input."""
    from potoos_spark.session import get_session

    spark = get_session("rolling_cardinality")
    ev = spark.range(0, 5_000).select(
        (F.col("id") % 3).cast("string").alias("series_key"),
        (F.col("id") * 137).alias("ts_ms"),
        F.col("id").cast("double").alias("value"),
    )
    aug, w = rolling.sharded_trailing_window(ev, 1_000, chunk_ms=5_000)
    out = rolling.emit_owned(
        aug.select(
            "series_key", "ts_ms", F.count("*").over(w).alias("n"),
            rolling.OWNED, rolling.CHUNK,
        )
    )
    assert out.count() == 5_000


def test_chunk_smaller_than_window_rejected():
    from potoos_spark.session import get_session

    spark = get_session("rolling_reject")
    ev = spark.range(1).select(
        F.lit("s").alias("series_key"),
        F.col("id").alias("ts_ms"),
        F.lit(0.0).alias("value"),
    )
    with pytest.raises(ValueError):
        rolling.sharded_trailing_window(ev, 1_000, chunk_ms=999)


def test_sharded_plan_partitions_by_chunk(spark):
    """The window exchange must hash on (series_key, chunk), not on the
    bare series key — that IS the parallelism claim."""
    from potoos_spark.catalog.common import events_frame
    from tests.conftest import SF_DIR

    ev = events_frame(spark, SF_DIR)
    plan = (
        _sharded_bollinger(ev)._jdf.queryExecution().executedPlan().toString()
    )
    assert rolling.CHUNK in plan, plan
