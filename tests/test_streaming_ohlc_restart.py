"""Fault tolerance for the streaming OHLC candle aggregation: a candle
whose bucket straddles a query restart must come out identical to the
uninterrupted run — open/close partials (min_by/max_by over (ts, seq))
live in the checkpointed window state, not in memory."""

from __future__ import annotations

import time

from potoos_spark.streaming.aggregate import stream_ohlc

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000
BUCKET = 60_000


def _rows(lo, hi):
    # 10s cadence, values chosen so open/high/low/close are all distinct
    # and the restart at i=45 falls INSIDE bucket 7 (i=42..47): the
    # candle must merge pre- and post-restart partials from state.
    return [
        ("a", BASE + i * 10_000, float((i * 37) % 101), i)
        for i in range(lo, hi)
    ]


def _reference(rows):
    candles = {}
    for k, t, v, s in rows:
        b = t - t % BUCKET
        c = candles.setdefault((k, b), [])
        c.append((t, s, v))
    out = set()
    for (k, b), pts in candles.items():
        pts.sort()
        vals = [v for _, _, v in pts]
        out.add((k, b, pts[0][2], max(vals), min(vals), pts[-1][2]))
    return out


def test_ohlc_candles_resume_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_available():
        sdf = stream_ohlc(
            spark.readStream.schema(SCHEMA).parquet(str(src)),
            bucket_msec=BUCKET,
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)

    # phase 1 ends mid-bucket (i=45 is inside the 42..47 bucket)
    spark.createDataFrame(_rows(0, 45), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    time.sleep(1.1)
    # phase 2: rest of that bucket + enough tail for the watermark to
    # close every bucket (default watermark comes from stream_ohlc)
    spark.createDataFrame(_rows(45, 200), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()

    got = {
        (r["series_key"], r["ts_ms"], r["open"], r["high"], r["low"],
         r["close"])
        for r in spark.read.parquet(out).collect()
    }
    ref = _reference(_rows(0, 200))
    # append mode withholds buckets the watermark has not passed; every
    # emitted candle must be exact, and the straddled bucket must be
    # present and correct.
    assert got <= ref
    straddle_bucket = BASE + 42 * 10_000 - (BASE + 42 * 10_000) % BUCKET
    assert any(b == straddle_bucket for _, b, *_ in got)
    # append mode finalizes exactly the buckets whose END the 10-minute
    # default watermark has passed (watermark = max event time - delay);
    # everything older must have been emitted, nothing newer may be.
    max_ts = BASE + 199 * 10_000
    cutoff = max_ts - 600_000  # DEFAULT_WATERMARK = 10 minutes
    emitted = {b for _, b, *_ in got}
    expected = {b for _, b, *_ in ref}
    finalized = {b for b in expected if b + BUCKET <= cutoff}
    assert finalized <= emitted
    assert emitted <= {b for b in expected if b + BUCKET <= max_ts}
