"""Continuous rollup maintenance: a stream replayed in micro-batches
must produce a partials log whose served aggregates equal the direct
batch aggregation over all the data — before AND after compaction."""

from __future__ import annotations

import time

import pytest

from potoos_spark.config import TimeSeriesConfig
from potoos_spark.operators.retrieval import apply_aggregation
from potoos_spark.streaming.rollup_sink import (
    compact_rollup_log,
    read_rollup_log,
    rollup_log_sink,
)

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
MIN_10 = 600_000
HOUR = 3_600_000


def _rows():
    out = []
    for s in ("a", "b"):
        for i in range(400):
            out.append((s, 1_700_000_000_000 + i * 60_000, float((i % 23) + (i % 5)), i))
    return out


@pytest.fixture(scope="module")
def maintained(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("rollup_log")
    src = tmp / "src"
    rows = sorted(_rows(), key=lambda r: r[1])
    third = len(rows) // 3
    for c in range(3):  # 3 time-ordered files → 3 micro-batches
        chunk = rows[c * third : (c + 1) * third] if c < 2 else rows[2 * third :]
        spark.createDataFrame(chunk, SCHEMA).repartition(1).write.mode("append").parquet(
            str(src)
        )
        time.sleep(1.1)
    sdf = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(str(src))
    q = rollup_log_sink(
        sdf,
        str(tmp / "log"),
        {"10m": MIN_10},
        checkpoint_dir=str(tmp / "ckpt"),
        availableNow=True,
    )
    q.awaitTermination(timeout=180)
    batch_df = spark.createDataFrame(rows, SCHEMA)
    return str(tmp / "log"), batch_df


def _direct(spark, batch_df, agg, bucket):
    cfg = TimeSeriesConfig(aggregation_type=agg, bucket_size_msec=bucket)
    return {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in apply_aggregation(batch_df, cfg).collect()
    }


@pytest.mark.parametrize("agg", ["min", "max", "count", "first", "last", "avg"])
def test_log_serves_hourly_from_streamed_partials(spark, maintained, agg):
    log, batch_df = maintained
    got = {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in read_rollup_log(spark, log, "10m", HOUR, agg).collect()
    }
    want = _direct(spark, batch_df, agg, HOUR)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9), k


def test_compaction_preserves_results_and_shrinks_log(spark, maintained):
    log, batch_df = maintained
    before_rows = spark.read.parquet(f"{log}/10m").count()
    before = {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in read_rollup_log(spark, log, "10m", HOUR, "count").collect()
    }
    compact_rollup_log(spark, log, "10m", MIN_10)
    after_rows = spark.read.parquet(f"{log}/10m").count()
    after = {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in read_rollup_log(spark, log, "10m", HOUR, "count").collect()
    }
    assert after == before
    assert after_rows <= before_rows
    assert after == _direct(spark, batch_df, "count", HOUR)
