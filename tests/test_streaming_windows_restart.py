"""Fault tolerance for the chained stateful plan (bucket agg →
threshold → session islands): a restarted replay must emit exactly the
windows one uninterrupted run (and a python islands reference) gives."""

from __future__ import annotations

import time

from potoos_spark.config import TimeSeriesConfig
from potoos_spark.streaming import stream_anomaly_windows

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000
BUCKET = 60_000
ANOM = set(range(100, 121)) | set(range(200, 206))


def _rows(lo, hi):
    # 10s cadence; two anomalous stretches (value 300 > upper 250),
    # long quiet tail so the watermark passes every session end
    return [
        ("a", BASE + i * 10_000, 300.0 if i in ANOM else 50.0, i)
        for i in range(lo, hi)
    ]


def _reference(rows):
    buckets = {}
    for _, t, v, _s in rows:
        b = t - t % BUCKET
        buckets[b] = max(buckets.get(b, float("-inf")), v)
    anom = sorted(b for b, v in buckets.items() if v > 250.0 and v - 250.0 >= 2.0)
    islands, cur = [], None
    for b in anom:
        if cur and b - cur[-1] <= BUCKET:
            cur.append(b)
        else:
            cur = [b]
            islands.append(cur)
    out = set()
    for isl in islands:
        score = max(buckets[b] - 250.0 for b in isl)
        exact = min(b for b in isl if buckets[b] - 250.0 == score)
        out.add(("a", isl[0], isl[-1], exact, score))
    return out


def test_window_extraction_resumes_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    cfg = TimeSeriesConfig(aggregation_type="max", bucket_size_msec=BUCKET)

    def run_available():
        sdf = stream_anomaly_windows(
            spark.readStream.schema(SCHEMA).parquet(str(src)),
            cfg, upper=250.0, lower=5.0, score_threshold=2.0,
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

    spark.createDataFrame(_rows(0, 150), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    time.sleep(1.1)
    spark.createDataFrame(_rows(150, 400), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()

    got = {
        (r["series_key"], r["start_ts_ms"], r["end_ts_ms"], r["exact_ts_ms"],
         r["anomaly_score"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == _reference(_rows(0, 400))
