"""Fault tolerance for the streaming CUSUM monitor: the (s+, s−)
accumulator pair lives in the checkpointed state store, so a restarted
replay must continue the cumulative-sum trajectory exactly where it
left off — and the full replay must equal a pure-python reference of
the recurrence with the same calibrated (mu, k, range)."""

from __future__ import annotations

import time

from potoos_spark.streaming.stateful import cusum_profile, streaming_cusum

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000


def _rows(lo, hi):
    # a level shift at i=120 (post-restart) so the accumulator must
    # carry non-zero state across the checkpoint boundary to score it
    out = []
    for i in range(lo, hi):
        v = 10.0 + (i % 7) + (50.0 if i >= 120 else 0.0)
        out.append(("a", BASE + i * 10_000, v, i))
    return out


def _reference(rows):
    vals = sorted(v for _, _, v, _ in rows)
    n = len(vals)
    mu = vals[(n + 1) // 2 - 1]
    rng = max(vals) - min(vals)
    k = 0.05 * rng
    sp = sn = 0.0
    out = {}
    for _, t, v, _ in rows:
        sp = max(sp + ((v - mu) - k), 0.0)
        sn = max(sn + ((mu - v) - k), 0.0)
        out[t] = max(sp, sn) / rng if rng > 0 else 0.0
    return out


def test_cusum_state_resumes_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    all_rows = _rows(0, 200)
    # calibration profile over the FULL history (the deployment shape:
    # profile from batch history, stream scored against it)
    profile = cusum_profile(spark.createDataFrame(all_rows, SCHEMA))

    def run_available():
        sdf = streaming_cusum(
            spark.readStream.schema(SCHEMA).parquet(str(src)), profile
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

    spark.createDataFrame(all_rows[:100], SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    time.sleep(1.1)
    spark.createDataFrame(all_rows[100:], SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()

    got = {r["ts_ms"]: r["score"] for r in spark.read.parquet(out).collect()}
    ref = _reference(all_rows)
    assert got == ref  # bit-exact, including rows scored after restart
    # the level shift is only detectable if state crossed the boundary
    assert got[BASE + 150 * 10_000] > 1.0
