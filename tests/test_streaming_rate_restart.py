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
from potoos_spark.streaming.stateful import streaming_gap_detect

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
        (
            # fixture spacing is exactly 5s, so a 4s threshold alerts on
            # every step — including the one spanning the restart point,
            # which is exactly the last-ts state the checkpoint must carry
            "gap",
            lambda spark: lambda src: streaming_gap_detect(
                spark.readStream.schema(SCHEMA).parquet(str(src)), 4_000
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


def test_stateful_scorer_correct_when_group_spans_arrow_chunks(spark, tmp_path):
    """A group larger than one Arrow batch arrives as MULTIPLE pandas
    chunks in shuffle-concat order; the scorer must gather and sort the
    whole group before running the recurrence (per-chunk sorting
    checkpoints out-of-order state)."""
    from potoos_spark.streaming import streaming_page_hinkley

    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, None)
    spark.conf.set(conf, "37")  # force many chunks for one series
    try:
        rows = [("a", 1_700_000_000_000 + i * 1000, float((i * 7) % 23), i)
                for i in range(400)]
        src = tmp_path / "src_chunks"
        # two unsorted halves so shuffle-concat order is not time order
        import random

        rnd = random.Random(7)
        shuffled = rows[:]
        rnd.shuffle(shuffled)
        spark.createDataFrame(shuffled, SCHEMA).repartition(4).write.parquet(
            str(src)
        )
        name = "ph_chunked"
        q = (
            streaming_page_hinkley(
                spark.readStream.schema(SCHEMA).parquet(str(src))
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        got = {r["ts_ms"]: r["score"] for r in spark.table(name).collect()}
        # reference recurrence over the fully time-sorted series
        vals = [v for _, _, v, _ in rows]
        rng = max(vals) - min(vals)
        delta = 0.02 * rng
        s = up = dn = 0.0
        mn = mx = 0.0
        for i, (_, t, v, _) in enumerate(rows):
            cnt = i + 1
            s += v
            mean = s / cnt
            mn = v if cnt == 1 else min(mn, v)
            mx = v if cnt == 1 else max(mx, v)
            r = mx - mn
            d = 0.02 * r
            up = max(up + ((v - mean) - d), 0.0)
            dn = max(dn + ((mean - v) - d), 0.0)
            want = max(up, dn) / r if r > 0 else 0.0
            assert got[t] == want, (t, got[t], want)
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
