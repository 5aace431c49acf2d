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


def test_streaming_scd2_null_states_match_batch_lag_semantics(spark, tmp_path):
    """NULL event states must follow the batch twin's three-valued lag
    rule (``prev IS NULL OR state <> prev``): a null row after A is
    absorbed into A's version, but the row AFTER the null always opens
    a new version (its lag is NULL) — A, NULL, A yields versions
    (A, 1), (A, 2), not an intermediate 'None' version."""
    rows = [
        # user 1: A, NULL(absorbed), A(new version), B
        (1, "A", 1_000, 0),
        (1, None, 2_000, 1),
        (1, "A", 3_000, 2),
        (1, "B", 4_000, 3),
        # user 2: NULL first row opens a NULL version; B closes it
        (2, None, 1_000, 0),
        (2, "B", 2_000, 1),
        (2, "B", 3_000, 2),
    ]
    src = tmp_path / "null_src"
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.parquet(str(src))
    q = (
        streaming_scd2(spark.readStream.schema(SCHEMA).parquet(str(src)))
        .writeStream.format("memory")
        .queryName("scd2_nulls")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    got = sorted(
        tuple(r) for r in spark.table("scd2_nulls").collect()
    )
    # batch twin (lag rule), closed versions only
    spark.createDataFrame(rows, SCHEMA).createOrReplaceTempView("scd2_null_ev")
    want = sorted(
        tuple(r)
        for r in spark.sql(
            "WITH d AS (SELECT *, lag(state) OVER w AS prev FROM scd2_null_ev "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, seq)), "
            "chg AS (SELECT user_id, state, ts_ms, seq FROM d "
            "WHERE prev IS NULL OR state <> prev) "
            "SELECT * FROM (SELECT user_id, state, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS version, "
            "ts_ms AS valid_from_ms, lead(ts_ms) OVER w - 1 AS valid_to_ms "
            "FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, seq)) "
            "WHERE valid_to_ms IS NOT NULL"
        ).collect()
    )
    assert got == want and got
    # the absorbed-null shape explicitly: user 1 has versions A, A, B
    u1 = [(s, v) for (u, s, v, _, _) in got if u == 1]
    assert u1 == [("A", 1), ("A", 2)]  # B is the open version, not emitted
