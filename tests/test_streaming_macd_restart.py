"""Fault tolerance for streaming MACD: the (ef, es, sig) EMA triple
lives in the checkpointed state store, so a restarted replay continues
the recurrences exactly — the full output equals the batch kernel run
over all rows."""

from __future__ import annotations

import time

from potoos_spark.streaming.stateful import streaming_macd

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000


def _rows(lo, hi):
    return [
        ("a", BASE + i * 10_000, 10.0 + (i % 9) + (i * 0.3 if i >= 120 else 0.0), i)
        for i in range(lo, hi)
    ]


def test_macd_state_resumes_from_checkpoint(spark, tmp_path):
    from potoos_spark.detectors.sequential import macd_frame

    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    all_rows = _rows(0, 200)

    def run_available():
        sdf = streaming_macd(spark.readStream.schema(SCHEMA).parquet(str(src)))
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)

    spark.createDataFrame(all_rows[:100], SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    time.sleep(1.1)
    spark.createDataFrame(all_rows[100:], SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()

    got = {
        r["ts_ms"]: (r["macd"], r["signal"], r["histogram"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["ts_ms"]: (r["macd"], r["signal"], r["histogram"])
        for r in macd_frame(
            spark.createDataFrame(all_rows, SCHEMA)
        ).collect()
    }
    assert got == batch  # bit-exact across the checkpoint boundary
    # the post-restart ramp pushes macd positive only if EMA state survived
    assert got[BASE + 150 * 10_000][0] > 0
