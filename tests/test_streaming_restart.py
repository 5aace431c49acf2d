"""Fault tolerance: stateful streaming scores must survive a query
restart — the state store (EMA recurrence + Welford stats) resumes from
the checkpoint and the resumed run produces exactly the scores the
uninterrupted run would have."""

from __future__ import annotations

import time

import pytest

from potoos_spark.streaming import streaming_scores

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"


def _rows(lo, hi):
    return [
        ("a", 1_700_000_000_000 + i * 1_000, float((i % 13) + (i % 7)), i)
        for i in range(lo, hi)
    ]


def test_stateful_scores_resume_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")  # file sink: the fault-tolerant sink

    def run_available():
        sdf = streaming_scores(
            spark.readStream.schema(SCHEMA).parquet(str(src)), "exp_avg_detector"
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)

    # phase 1: first half, then the query STOPS (availableNow drains)
    spark.createDataFrame(_rows(0, 100), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    first = spark.read.parquet(out).collect()
    assert len(first) == 100

    # phase 2: more data arrives; a NEW query restarts from the checkpoint
    time.sleep(1.1)
    spark.createDataFrame(_rows(100, 200), SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    total = spark.read.parquet(out).collect()
    # only the new rows were appended (checkpoint skips processed files)
    assert len(total) == 200
    second = [r for r in total if r["ts_ms"] >= 1_700_000_000_000 + 100_000]
    assert {r["ts_ms"] for r in second} == {r[1] for r in _rows(100, 200)}

    # the resumed scores equal an uninterrupted single run over all rows
    whole_src = tmp_path / "whole"
    spark.createDataFrame(_rows(0, 200), SCHEMA).repartition(1).write.parquet(
        str(whole_src)
    )
    sdf = streaming_scores(
        spark.readStream.schema(SCHEMA).parquet(str(whole_src)), "exp_avg_detector"
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("restart_whole")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    whole = {
        (r["series_key"], r["ts_ms"]): r["score"]
        for r in spark.table("restart_whole").collect()
    }
    resumed = {(r["series_key"], r["ts_ms"]): r["score"] for r in total}
    assert set(resumed) == set(whole)
    for k in whole:
        assert resumed[k] == pytest.approx(whole[k], abs=1e-12), k


def test_chunk_dedup_dedups_across_restart(spark, tmp_path):
    """A passage seen before a restart must still be recognized as a
    duplicate after the restart — the dedup hash state lives in the
    checkpointed state store, not in memory."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.dedup import streaming_chunk_dedup

    schema = "doc_id bigint, text string, ingest_time timestamp"
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_available():
        sdf = streaming_chunk_dedup(
            spark.readStream.schema(schema).parquet(str(src)), chunk_words=3
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)

    import datetime

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def write(rows):
        spark.createDataFrame(
            [(i, txt, t0 + datetime.timedelta(seconds=i)) for i, txt in rows],
            schema,
        ).repartition(1).write.mode("append").parquet(str(src))

    write([(1, "a b c x y z")])          # passages: "a b c", "x y z"
    run_available()
    assert spark.read.parquet(out).count() == 2

    time.sleep(1.1)
    # post-restart: "a b c" is a dup from phase 1; "n e w" is fresh
    write([(2, "a b c n e w")])
    run_available()
    got = spark.read.parquet(out)
    assert got.count() == 3  # not 4: "a b c" deduped across the restart
    fresh = {r.chunk for r in got.filter("doc_id = 2").collect()}
    assert fresh == {"n e w"}


def test_simhash_dedup_dedups_across_restart(spark, tmp_path):
    """A fingerprint seen before a restart must still suppress a
    near-copy arriving after the restart — the dedup key state lives in
    the checkpointed state store, not in memory."""
    import datetime

    from potoos_spark.operators.dedup import streaming_simhash_dedup

    schema = "doc_id bigint, text string, ingest_time timestamp"
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_available():
        sdf = streaming_simhash_dedup(
            spark.readStream.schema(schema).parquet(str(src))
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def write(rows):
        spark.createDataFrame(
            [(i, txt, t0 + datetime.timedelta(seconds=i)) for i, txt in rows],
            schema,
        ).repartition(1).write.mode("append").parquet(str(src))

    write([(1, "the quick brown fox")])
    run_available()
    assert spark.read.parquet(out).count() == 1

    time.sleep(1.1)
    # post-restart: doc 2 is a shuffled near-copy of doc 1 (identical
    # fingerprint) and must be suppressed by restored state; doc 3 is new
    write([(2, "fox brown quick the"), (3, "completely new words here")])
    run_available()
    got = spark.read.parquet(out)
    assert got.count() == 2  # not 3: the near-copy deduped across restart
    assert {r["doc_id"] for r in got.collect()} == {1, 3}


def test_embedding_dedup_dedups_across_restart(spark, tmp_path):
    """A sign-fingerprint seen before a restart must still suppress a
    sign-identical vector arriving after the restart (r5 embedding
    sibling of the SimHash guard) — state lives in the checkpointed
    state store."""
    import datetime

    from potoos_spark.operators.similarity import streaming_embedding_dedup

    schema = "vec_id bigint, embedding array<float>, ingest_time timestamp"
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_available():
        sdf = streaming_embedding_dedup(
            spark.readStream.schema(schema).parquet(str(src)), n_bits=4
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def write(rows):
        spark.createDataFrame(
            [(i, vec, t0 + datetime.timedelta(seconds=i)) for i, vec in rows],
            schema,
        ).repartition(1).write.mode("append").parquet(str(src))

    write([(1, [1.0, 2.0, 3.0, 4.0])])
    run_available()
    assert spark.read.parquet(out).count() == 1

    time.sleep(1.1)
    # vec 2: scaled copy (identical sign pattern) -> suppressed by
    # restored state; vec 3: one sign flipped -> new bucket, passes
    write([(2, [0.5, 1.0, 1.5, 2.0]), (3, [-1.0, 2.0, 3.0, 4.0])])
    run_available()
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r["vec_id"] for r in got.collect()} == {1, 3}
