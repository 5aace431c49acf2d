"""Out-of-order arrival THROUGH a checkpoint restart (VERDICT r7
item 7): restarts and reorder were previously tested separately; these
tests replay shuffled/late data across a query restart for the
watermarked stateful twins. The contract: a late-but-within-watermark
row that arrives in a NEW query (resumed from the checkpoint) must
merge into the state the previous run checkpointed — window contents,
session extents, and chained window extraction all land exactly where
an ordered uninterrupted replay puts them.

The decisive geometries:
* bucket agg — a whole bucket's rows arrive only after the restart;
  that window must emit with the late rows' (distinctive) max;
* session agg — a late bridge row arrives after the restart and MERGES
  two sessions the first run had accumulated as separate state;
* anomaly windows — an anomalous stretch is withheld until after the
  restart, so the chained agg→threshold→islands plan must build the
  island from late data against restored state.
"""

from __future__ import annotations

import time

from potoos_spark.config import TimeSeriesConfig
from potoos_spark.streaming import (
    stream_anomaly_windows,
    stream_bucket_agg,
    stream_session_agg,
)

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000


def _write(spark, rows, src):
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    time.sleep(1.1)  # distinct file mtimes -> stable maxFilesPerTrigger order


def _run(spark, sdf_builder, src, ckpt, out):
    q = (
        sdf_builder(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        .writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)


def test_bucket_agg_late_bucket_through_restart(spark, tmp_path):
    BUCKET, STEP, DELAY = 60_000, 10_000, "240 seconds"
    LATE = set(range(13, 18))  # t130..170s: all of window [120s, 180s)

    def row(i):
        return ("a", BASE + i * STEP, 999.0 if i in LATE else 50.0 + i % 7, i)

    cfg = TimeSeriesConfig(aggregation_type="max", bucket_size_msec=BUCKET)
    builder = lambda s: stream_bucket_agg(s, cfg, watermark=DELAY)  # noqa: E731
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"

    # run 1: rows 0..29 WITHOUT the late bucket (max event t290 ->
    # checkpointed watermark 50s, so [120s,180s) is still open state)
    _write(spark, [row(i) for i in range(30) if i not in LATE], src)
    _run(spark, builder, src, ckpt, out)
    # run 2 (restarted query): the late bucket arrives, then a long
    # tail pushes the watermark past every window of interest
    _write(spark, [row(i) for i in sorted(LATE)], src)
    _write(spark, [row(i) for i in range(30, 121)], src)
    _run(spark, builder, src, ckpt, out)

    got = {
        (r["ts_ms"], r["value"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # batch reference over ALL rows, restricted to windows the final
    # watermark (t1200s - 240s = t960s) finalized
    buckets: dict[int, float] = {}
    for _, t, v, _s in map(row, range(121)):
        b = t - t % BUCKET
        buckets[b] = max(buckets.get(b, float("-inf")), v)
    horizon = BASE + 120 * STEP - 240_000
    want = {(b, v) for b, v in buckets.items() if b + BUCKET <= horizon}
    assert got == want
    # and the late-delivered rows' buckets emitted with their
    # distinctive max (BASE is not 60s-aligned, so derive the late
    # windows from the reference rather than hand-labeling them)
    late_want = {(b, v) for b, v in want if v == 999.0}
    assert late_want and late_want <= got


def test_session_agg_late_bridge_merges_sessions_through_restart(
    spark, tmp_path
):
    GAP, DELAY = "60 seconds", "240 seconds"

    def at(sec, val, seq):
        return ("a", BASE + sec * 1000, val, seq)

    builder = lambda s: stream_session_agg(  # noqa: E731
        s, gap=GAP, agg_type="min", watermark=DELAY
    )
    src, ckpt, out = tmp_path / "s2", tmp_path / "c2", tmp_path / "o2"

    # run 1: burst A (t0..10s) and burst B (t100..110s) — 90s apart,
    # SEPARATE sessions in checkpointed state (gap 60s)
    _write(
        spark,
        [at(s, 30.0 + s, s) for s in range(0, 11, 5)]
        + [at(s, 80.0 + s, s) for s in range(100, 111, 5)],
        src,
    )
    _run(spark, builder, src, ckpt, out)
    # run 2: the BRIDGE row t55 (within both 60s gaps -> the restored
    # sessions must MERGE), then a far tail to finalize everything
    _write(spark, [at(55, 7.0, 999)], src)
    _write(spark, [at(2000, 1.0, 1000)], src)
    _run(spark, builder, src, ckpt, out)

    got = {
        (r["session_start_ms"], r["session_end_ms"], r["n_points"], r["value"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # one 7-point session, min = the bridge row; session_window end =
    # last event + gap (t110s + 60s)
    merged = (BASE, BASE + 170_000, 7, 7.0)
    assert merged in got, got
    # no leftover un-merged A/B fragments
    assert not any(
        s == BASE and e != BASE + 170_000 for s, e, _n, _v in got
    ), got


def test_anomaly_windows_late_anomaly_through_restart(spark, tmp_path):
    """Chained agg → threshold → session-islands twin: the anomalous
    stretch (rows 100..120, value 300 > upper 250) is withheld until
    after the restart; the island must still come out exactly as the
    python reference over the full ordered series."""
    BUCKET = 60_000
    ANOM = set(range(100, 121))

    def row(i):
        return ("a", BASE + i * 10_000, 300.0 if i in ANOM else 50.0, i)

    cfg = TimeSeriesConfig(aggregation_type="max", bucket_size_msec=BUCKET)
    builder = lambda s: stream_anomaly_windows(  # noqa: E731
        s, cfg, upper=250.0, lower=5.0, score_threshold=2.0
    )
    src, ckpt, out = tmp_path / "s3", tmp_path / "c3", tmp_path / "o3"

    # run 1: rows 0..149 minus the anomaly (watermark 10 min default,
    # max event t1490s -> watermark t890s < t1000s: anomaly still open)
    _write(spark, [row(i) for i in range(150) if i not in ANOM], src)
    _run(spark, builder, src, ckpt, out)
    # run 2: the late anomalous stretch, then the quiet tail
    _write(spark, [row(i) for i in sorted(ANOM)], src)
    _write(spark, [row(i) for i in range(150, 400)], src)
    _run(spark, builder, src, ckpt, out)

    got = {
        (r["series_key"], r["start_ts_ms"], r["end_ts_ms"], r["exact_ts_ms"],
         r["anomaly_score"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # python reference over the full ordered series (same as
    # test_streaming_windows_restart)
    buckets: dict[int, float] = {}
    for _, t, v, _s in map(row, range(400)):
        b = t - t % BUCKET
        buckets[b] = max(buckets.get(b, float("-inf")), v)
    anom = sorted(b for b, v in buckets.items() if v > 250.0 and v - 250.0 >= 2.0)
    islands: list[list[int]] = []
    for b in anom:
        if islands and b - islands[-1][-1] <= BUCKET:
            islands[-1].append(b)
        else:
            islands.append([b])
    want = set()
    for isl in islands:
        score = max(buckets[b] - 250.0 for b in isl)
        exact = min(b for b in isl if buckets[b] - 250.0 == score)
        want.add(("a", isl[0], isl[-1], exact, score))
    assert got == want
