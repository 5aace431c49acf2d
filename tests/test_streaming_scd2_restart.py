"""Fault tolerance for the r6 streaming SCD2: the open version's
(state, valid_from, version) must survive a query restart via the
checkpoint — a resumed run over split input emits the identical
closed-version set as one uninterrupted run, INCLUDING the version
whose state change spans the restart point."""

from __future__ import annotations

import time

from potoos_spark.streaming.stateful import streaming_scd2

SCHEMA = "user_id bigint, state string, ts_ms bigint, seq bigint"


def _rows(lo, hi):
    # two users cycling through states slowly enough that runs collapse
    states = ["A", "A", "B", "B", "B", "C"]
    out = []
    for i in range(lo, hi):
        for u in (1, 2):
            out.append((u, states[(i + u) % len(states)], 1_700_000_000_000 + i * 5_000, i))
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


def test_streaming_scd2_resumes_from_checkpoint(spark, tmp_path):
    mk_sdf = lambda src: streaming_scd2(
        spark.readStream.schema(SCHEMA).parquet(str(src))
    )
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.createDataFrame(_rows(0, 40), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_available(mk_sdf, src, ckpt, out)

    time.sleep(1.1)
    spark.createDataFrame(_rows(40, 80), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_available(mk_sdf, src, ckpt, out)

    resumed = sorted(tuple(r) for r in spark.read.parquet(out).collect())

    whole_src = tmp_path / "whole"
    spark.createDataFrame(_rows(0, 80), SCHEMA).repartition(1).write.parquet(
        str(whole_src)
    )
    q = (
        streaming_scd2(spark.readStream.schema(SCHEMA).parquet(str(whole_src)))
        .writeStream.format("memory")
        .queryName("scd2_whole")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    whole = sorted(tuple(r) for r in spark.table("scd2_whole").collect())
    assert resumed == whole and resumed
    # versions are consecutive per user and intervals don't overlap
    per = {}
    for u, s, v, f, t in whole:
        per.setdefault(u, []).append((v, f, t))
    for u, rows in per.items():
        rows.sort()
        assert [v for v, _, _ in rows] == list(range(1, len(rows) + 1))
        assert all(a[2] < b[1] for a, b in zip(rows, rows[1:]))
