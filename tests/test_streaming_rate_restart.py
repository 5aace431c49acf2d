"""Fault tolerance for the round-3 stateful ops: streaming counter rate
and streaming debounce must survive a query restart — state (open
bucket accumulator / last-kept timestamp) resumes from the checkpoint
and the resumed run equals an uninterrupted run over the full input."""

from __future__ import annotations

import time

import pytest

from potoos_spark.streaming import (
    streaming_counter_rate,
    streaming_debounce,
    streaming_page_hinkley,
)

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BUCKET = 60_000


def _rows(lo, hi):
    # a counter-ish ramp with periodic resets
    return [
        ("a", 1_700_000_000_000 + i * 5_000, float((i * 3) % 97), i)
        for i in range(lo, hi)
    ]


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


def _whole_run(spark, mk_sdf, whole_src, name):
    q = (
        mk_sdf(whole_src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    return spark.table(name)


@pytest.mark.parametrize(
    "name,mk",
    [
        (
            "cr",
            lambda spark: lambda src: streaming_counter_rate(
                spark.readStream.schema(SCHEMA).parquet(str(src)), BUCKET
            ),
        ),
        (
            "db",
            lambda spark: lambda src: streaming_debounce(
                spark.readStream.schema(SCHEMA).parquet(str(src)), 25_000
            ),
        ),
        (
            "ph",
            lambda spark: lambda src: streaming_page_hinkley(
                spark.readStream.schema(SCHEMA).parquet(str(src))
            ),
        ),
    ],
)
def test_stateful_rate_ops_resume_from_checkpoint(spark, tmp_path, name, mk):
    mk_sdf = mk(spark)
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.createDataFrame(_rows(0, 80), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_available(mk_sdf, src, ckpt, out)

    time.sleep(1.1)
    spark.createDataFrame(_rows(80, 160), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_available(mk_sdf, src, ckpt, out)

    resumed = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    whole_src = tmp_path / "whole"
    spark.createDataFrame(_rows(0, 160), SCHEMA).repartition(1).write.parquet(
        str(whole_src)
    )
    whole = sorted(
        tuple(r)
        for r in _whole_run(spark, mk_sdf, whole_src, f"rate_whole_{name}").collect()
    )
    assert resumed == whole and resumed
