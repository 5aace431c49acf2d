"""Fault tolerance for the r7 streaming Bollinger kernel: the trailing-
hour (ts, v100) arrays must survive a query restart via the checkpoint —
a resumed run over split input emits the identical band rows as one
uninterrupted run, INCLUDING points whose trailing window spans the
restart boundary."""

from __future__ import annotations

import time

from potoos_spark.streaming.stateful import streaming_bollinger

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"


def _rows(lo, hi):
    out = []
    for i in range(lo, hi):
        for s in ("a", "b"):
            # 5-minute spacing -> ~12 points per trailing hour; a value
            # spike every 17th point exercises the breakout flag
            v = 100.0 + (i % 7) + (50.0 if i % 17 == 0 else 0.0)
            out.append((s, 1_700_000_000_000 + i * 300_000, v, i))
    return out


def _run_available(mk_sdf, src, ckpt, out):
    q = (
        mk_sdf(src)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)


def test_streaming_bollinger_resumes_from_checkpoint(spark, tmp_path):
    mk_sdf = lambda src: streaming_bollinger(
        spark.readStream.schema(SCHEMA).parquet(str(src))
    )
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.createDataFrame(_rows(0, 30), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_available(mk_sdf, src, ckpt, out)
    time.sleep(1.1)
    spark.createDataFrame(_rows(30, 60), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_available(mk_sdf, src, ckpt, out)
    resumed = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    whole_src = tmp_path / "whole"
    spark.createDataFrame(_rows(0, 60), SCHEMA).repartition(1).write.parquet(
        str(whole_src)
    )
    q = (
        streaming_bollinger(spark.readStream.schema(SCHEMA).parquet(str(whole_src)))
        .writeStream.format("memory")
        .queryName("boll_whole")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    whole = sorted(tuple(r) for r in spark.table("boll_whole").collect())
    assert resumed == whole and resumed
    # spikes actually break out; steady points don't
    spikes = [r for r in whole if r[3] >= 150.0]
    assert spikes and all(r[-1] == 1 for r in spikes if r[4] > 3)
