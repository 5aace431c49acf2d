"""True-streaming latency measurement for the stateful twins
(VERDICT r6 item 5): every streaming entry is correctness-validated
via availableNow replay, which says nothing about per-batch cost under
a LIVE source. This harness drives a rate-limited source into a
stateful operator with a real micro-batch trigger and records the
batch-duration distribution from the query's progress events — the
evidence that O(1)-state claims translate to FLAT per-batch cost as
rows/sec rises (state size is bounded by key count, not stream
length, so batch time should scale with rows-per-batch only).

Keys: 1000 distinct keys, so per-key state stays tiny while every
batch exercises the full groupBy-state shuffle path.

Usage: python scripts/streaming_latency.py [seconds_per_run]
Prints a markdown table (rows/sec vs p50/p95 batch seconds per op);
writes nothing outside /tmp.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from potoos_spark.session import get_session

RUN_SECS = int(sys.argv[1]) if len(sys.argv) > 1 else 25
N_KEYS = 1000
RATES = [1_000, 10_000, 100_000, 1_000_000]


def _scd2_stream(spark, rate):
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            (F.col("value") % N_KEYS).cast("bigint").alias("user_id"),
            F.concat(
                F.lit("st"), ((F.col("value") / N_KEYS) % 3).cast("bigint")
            ).alias("state"),
            F.col("value").cast("bigint").alias("ts_ms"),
            F.col("value").cast("bigint").alias("seq"),
        )
    )
    from potoos_spark.streaming.stateful import streaming_scd2

    return streaming_scd2(src)


def _heartbeat_stream(spark, rate):
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            F.concat(F.lit("s"), (F.col("value") % N_KEYS)).alias("series_key"),
            F.col("value").cast("bigint").alias("ts_ms"),
            F.col("value").cast("bigint").alias("seq"),
        )
    )
    from potoos_spark.streaming.stateful import streaming_heartbeat_sla

    return streaming_heartbeat_sla(src, heartbeat_ms=5 * N_KEYS)


def _cusum_stream(spark, rate):
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .load()
        .select(
            F.concat(F.lit("s"), (F.col("value") % N_KEYS)).alias("series_key"),
            F.col("value").cast("bigint").alias("ts_ms"),
            (F.col("value") % 17).cast("double").alias("value"),
            F.col("value").cast("bigint").alias("seq"),
        )
    )
    from potoos_spark.streaming.stateful import streaming_cusum

    # static calibration profile for the N_KEYS series (the deployment
    # shape: broadcast-joined, O(1) (s+, s-) state per series)
    profile = spark.range(N_KEYS).select(
        F.concat(F.lit("s"), F.col("id")).alias("series_key"),
        F.lit(8.0).alias("mu"),
        F.lit(16.0).alias("rng"),
        F.lit(0.8).alias("k"),
    )
    return streaming_cusum(src, profile)


OPS = {
    "streaming_scd2": _scd2_stream,
    "streaming_heartbeat_sla": _heartbeat_stream,
    "streaming_cusum": _cusum_stream,
}


def measure(spark, name, mk, rate):
    ckpt = tempfile.mkdtemp(prefix=f"lat_{name}_{rate}_")
    q = (
        mk(spark, rate)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    time.sleep(RUN_SECS)
    prog = [p for p in q.recentProgress if p is not None]
    q.stop()
    # drop the first 3 batches (stream warmup: state store load, codegen)
    durs = [
        p["durationMs"]["triggerExecution"] / 1000.0
        for p in prog
        if p.get("numInputRows", 0) > 0
    ][3:]
    rows = [p["numInputRows"] for p in prog if p.get("numInputRows", 0) > 0][3:]
    if not durs:
        return None
    return {
        "p50": statistics.median(durs),
        "p95": sorted(durs)[max(0, int(len(durs) * 0.95) - 1)],
        "batches": len(durs),
        "rows_per_batch": statistics.median(rows),
    }


def main():
    spark = get_session("streaming_latency")
    print("| op | rows/sec | rows/batch (p50) | batch p50 s | batch p95 s | batches |")
    print("|---|---|---|---|---|---|")
    for name, mk in OPS.items():
        for rate in RATES:
            m = measure(spark, name, mk, rate)
            if m is None:
                print(f"| {name} | {rate} | — | — | — | 0 |")
                continue
            print(
                f"| {name} | {rate} | {int(m['rows_per_batch'])} "
                f"| {m['p50']:.2f} | {m['p95']:.2f} | {m['batches']} |"
            )


if __name__ == "__main__":
    main()
