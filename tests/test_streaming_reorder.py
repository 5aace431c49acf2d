"""Out-of-order streaming: with ordered=False, the stateful scorer must
buffer late-but-within-watermark rows and score everything in event-time
order — producing exactly the scores an ordered replay would, for every
row the watermark has passed."""

from __future__ import annotations

import time

import pytest

from potoos_spark.streaming import streaming_scores
from tests.test_streaming import _prefix_reference

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000
STEP = 1_000


def _row(i):
    return ("a", BASE + i * STEP, float((i % 13) + (i % 7)), i)


def test_reorder_buffer_scores_late_rows_in_order(spark, tmp_path):
    src = tmp_path / "src"
    # file 1: rows 0-99 with 40-49 missing; file 2: the late 40-49;
    # file 3: rows 100-199 (advances the watermark past file 2's rows)
    chunks = [
        [_row(i) for i in range(100) if not 40 <= i < 50],
        [_row(i) for i in range(40, 50)],
        [_row(i) for i in range(100, 200)],
    ]
    for chunk in chunks:
        spark.createDataFrame(chunk, SCHEMA).repartition(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(1.1)

    sdf = streaming_scores(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        "exp_avg_detector",
        ordered=False,
        watermark="30 seconds",
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("reorder_scores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = sorted(
        (r["series_key"], r["ts_ms"], r["value"], r["score"])
        for r in spark.table("reorder_scores").collect()
    )

    # the watermark (lagging one batch) finalizes rows 0..69: max event
    # time after batch 1 is t99, minus 30s -> t69
    assert got, "nothing emitted"
    emitted_ts = [g[1] for g in got]
    assert emitted_ts == sorted(emitted_ts)
    n = len(got)
    want = _prefix_reference([_row(i) for i in range(200)], "exp_avg_detector")[:n]
    # the emitted prefix must include the late rows 40-49, in order
    assert {g[1] for g in got} >= {BASE + i * STEP for i in range(40, 50)}
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], abs=1e-12)


def test_too_late_rows_are_dropped(spark, tmp_path):
    src = tmp_path / "src2"
    # file 1: rows 0-199; file 2: one row far in the past (beyond any
    # watermark once rows 200-299 arrive); file 3: rows 200-299
    chunks = [
        [_row(i) for i in range(200)],
        [_row(5)],  # duplicate deep in scored history
        [_row(i) for i in range(200, 300)],
    ]
    for chunk in chunks:
        spark.createDataFrame(chunk, SCHEMA).repartition(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(1.1)

    sdf = streaming_scores(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        "exp_avg_detector",
        ordered=False,
        watermark="10 seconds",
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("reorder_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    rows = spark.table("reorder_late").collect()
    # row 5 was already scored in an earlier flush; its late duplicate
    # must not be emitted twice
    assert sum(1 for r in rows if r["ts_ms"] == BASE + 5 * STEP) == 1


def test_reorder_gap_detect_backfill_splits_gap(spark, tmp_path):
    """Out-of-order gap detection: points every 1s except 50-59 missing
    from file 1; t55 arrives LATE in file 2 (within watermark). The
    buffered variant must report the two true gaps around the backfill
    (49->55, 55->60), never the naive 49->60 a no-buffer pass would
    emit; rows the watermark passed match an ordered full replay."""
    from potoos_spark.streaming.stateful import streaming_gap_detect

    src = tmp_path / "src_gap"
    chunks = [
        [_row(i) for i in range(100) if not 50 <= i < 60],
        [_row(55)],
        [_row(i) for i in range(100, 200)],
    ]
    for chunk in chunks:
        spark.createDataFrame(chunk, SCHEMA).repartition(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(1.1)

    sdf = streaming_gap_detect(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src)),
        threshold_ms=3 * STEP,
        ordered=False,
        watermark="30 seconds",
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("reorder_gaps")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = sorted(
        (r["gap_start_ms"], r["gap_end_ms"], r["gap_ms"])
        for r in spark.table("reorder_gaps").collect()
    )
    t = lambda i: BASE + i * STEP
    assert (t(49), t(55), 6 * STEP) in got
    assert (t(55), t(60), 5 * STEP) in got
    assert (t(49), t(60), 11 * STEP) not in got
    # no other gaps exist in the flushed range
    assert len(got) == 2
