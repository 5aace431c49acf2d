"""Streaming tier tests (t4, SURVEY.md §5): batch/stream parity for the
windowed aggregations, micro-batch-boundary invariance for the stateful
scorer, and the foreachBatch monitor loop.

Pattern: deterministic series rows are written as N time-ordered parquet
files; a file-source stream with maxFilesPerTrigger=1 +
trigger(availableNow) replays them as N micro-batches into a memory
sink, and the result is compared against the batch operator on the same
rows (aggregations run in complete mode so no watermark-flush tail is
lost; the stateful scorer appends immediately so append mode is exact).
"""

from __future__ import annotations

import time

import pytest

from pyspark.sql import Window as W, functions as F

from potoos_spark.config import DetectorConfig, TimeSeriesConfig
from potoos_spark.operators.retrieval import apply_aggregation, apply_latest
from potoos_spark.streaming import (
    stream_bucket_agg,
    stream_latest_dedup,
    stream_session_agg,
    streaming_scores,
    with_event_time,
)

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BUCKET = 60_000


def _rows():
    rows = []
    seq = 0
    for s, base in (("a", 0.0), ("b", 100.0)):
        for i in range(300):
            v = base + (i % 17) * 1.5 + (25.0 if i in (120, 240) else 0.0)
            rows.append((s, 1_700_000_000_000 + i * 10_000, v, seq))
            seq += 1
    return rows


def _write_chunks(spark, tmpdir, n_chunks=3):
    rows = sorted(_rows(), key=lambda r: r[1])
    per = (len(rows) + n_chunks - 1) // n_chunks
    for c in range(n_chunks):
        chunk = rows[c * per : (c + 1) * per]
        df = spark.createDataFrame(chunk, SCHEMA)
        df.repartition(1).write.mode("append").parquet(str(tmpdir))
        time.sleep(1.1)  # distinct mtimes → deterministic file order
    return spark.createDataFrame(rows, SCHEMA)


def _read_stream(spark, tmpdir, one_file_per_batch=True):
    reader = spark.readStream.schema(SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    return reader.parquet(str(tmpdir))


def _run_to_memory(sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    return name


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def chunked(spark, tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("stream_src")
    batch_df = _write_chunks(spark, tmpdir)
    return tmpdir, batch_df


@pytest.mark.parametrize("agg", ["avg", "sum", "count", "first", "last", "range"])
def test_stream_bucket_agg_matches_batch(spark, chunked, agg):
    tmpdir, batch_df = chunked
    cfg = TimeSeriesConfig(aggregation_type=agg, bucket_size_msec=BUCKET)
    sdf = stream_bucket_agg(_read_stream(spark, tmpdir), cfg)
    name = _run_to_memory(sdf, f"m_agg_{agg.replace('.', '_')}", "complete")
    got = _collect_sorted(spark.table(name))
    want = _collect_sorted(apply_aggregation(batch_df, cfg))
    assert got == want


def test_stream_bucket_agg_align_and_label(spark, chunked):
    tmpdir, batch_df = chunked
    cfg = TimeSeriesConfig(
        aggregation_type="max",
        bucket_size_msec=BUCKET,
        align=1_700_000_007_000,
        bucket_timestamp="~",
    )
    sdf = stream_bucket_agg(_read_stream(spark, tmpdir), cfg)
    name = _run_to_memory(sdf, "m_agg_align", "complete")
    got = _collect_sorted(spark.table(name))
    want = _collect_sorted(apply_aggregation(batch_df, cfg))
    assert got == want


def test_stream_latest_dedup_matches_batch(spark, chunked, tmp_path):
    # duplicate timestamps with increasing seq: keep the later ingest
    rows = [("a", 1_700_000_000_000 + (i // 2) * 1000, float(i), i) for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    src = tmp_path / "dup_src"
    df.repartition(1).write.mode("append").parquet(str(src))
    sdf = stream_latest_dedup(_read_stream(spark, src, one_file_per_batch=False))
    name = _run_to_memory(sdf, "m_latest", "complete")
    got = _collect_sorted(spark.table(name))
    want = _collect_sorted(apply_latest(df, TimeSeriesConfig(latest=True)))
    assert got == want


def test_stream_session_agg_runs(spark, chunked):
    tmpdir, _ = chunked
    sdf = stream_session_agg(_read_stream(spark, tmpdir), gap="30 seconds")
    name = _run_to_memory(sdf, "m_session", "complete")
    out = spark.table(name)
    rows = out.collect()
    assert rows, "no session windows emitted"
    assert {r["series_key"] for r in rows} == {"a", "b"}
    for r in rows:
        assert r["session_end_ms"] > r["session_start_ms"]
        assert r["n_points"] >= 1


def _prefix_reference(rows, algorithm, alpha=0.2):
    """Pure-python prefix-causal scorer (the documented streaming
    semantics), independent of the Spark implementation."""
    out = {}
    series = {}
    for s, t, v, _ in sorted(rows, key=lambda r: (r[0], r[1])):
        series.setdefault(s, []).append((t, v))
    for s, pts in series.items():
        vals = []
        ema = 0.0
        stats = []  # values the normalizer runs over
        last = None
        for i, (t, v) in enumerate(pts):
            if algorithm == "exp_avg_detector":
                ema = v if i == 0 else alpha * v + (1 - alpha) * ema
                stats.append(v)
                std = _std(stats)
                score = abs(v - ema) / std if std > 0 else 0.0
            else:
                if i == 0:
                    score = 0.0
                else:
                    dt = (t - last[0]) / 1000.0 or 1.0
                    d = abs(v - last[1]) / dt
                    if i == 1:
                        ema = d
                        stats.extend([d, d])
                    else:
                        ema = alpha * d + (1 - alpha) * ema
                        stats.append(d)
                    std = _std(stats)
                    score = abs(d - ema) / std if std > 0 else 0.0
            last = (t, v)
            vals.append((s, t, v, score))
        out[s] = vals
    return sorted(v for vs in out.values() for v in vs)


def _std(xs):
    n = len(xs)
    if n < 2:
        return 0.0
    m = sum(xs) / n
    return (sum((x - m) ** 2 for x in xs) / (n - 1)) ** 0.5


@pytest.mark.parametrize("algorithm", ["exp_avg_detector", "derivative_detector"])
def test_streaming_scores_boundary_invariance(spark, chunked, algorithm):
    tmpdir, _ = chunked
    # replay as 3 micro-batches and as 1 — identical scores either way
    outs = []
    for split, tag in ((True, "split"), (False, "whole")):
        sdf = streaming_scores(
            _read_stream(spark, tmpdir, one_file_per_batch=split), algorithm
        )
        name = _run_to_memory(sdf, f"m_scores_{algorithm}_{tag}", "append")
        outs.append(_collect_sorted(spark.table(name)))
    assert outs[0] == outs[1]

    want = _prefix_reference(_rows(), algorithm)
    assert len(outs[0]) == len(want)
    for got, exp in zip(outs[0], want):
        assert got[:3] == exp[:3]
        assert got[3] == pytest.approx(exp[3], abs=1e-12)


def test_score_stream_end_to_end(spark, chunked):
    tmpdir, batch_df = chunked
    from potoos_spark.streaming import score_stream

    cfg = TimeSeriesConfig(aggregation_type="avg", bucket_size_msec=BUCKET)
    sdf = score_stream(_read_stream(spark, tmpdir), cfg, DetectorConfig(score_threshold=1.0))
    assert set(sdf.columns) == {"series_key", "ts_ms", "value", "score", "is_anomaly"}
    name = _run_to_memory(sdf, "m_e2e", "append")
    rows = spark.table(name).collect()
    assert rows, "no scored buckets emitted"
    for r in rows:
        assert r["is_anomaly"] == (r["score"] >= 1.0)

    # bucket VALUES must match the batch aggregation minus each series'
    # trailing (still-open) bucket; scores are prefix-causal over them
    got = sorted((r["series_key"], r["ts_ms"], r["value"]) for r in rows)
    batch = apply_aggregation(batch_df, cfg).collect()
    last = {}
    for r in batch:
        last[r["series_key"]] = max(last.get(r["series_key"], 0), r["ts_ms"])
    want = sorted(
        (r["series_key"], r["ts_ms"], r["value"])
        for r in batch
        if r["ts_ms"] != last[r["series_key"]]
    )
    assert got == want


@pytest.mark.parametrize("agg", ["avg", "sum", "min", "max", "range", "count",
                                 "first", "last", "std.p", "std.s", "var.p", "var.s"])
def test_streaming_bucket_scores_bucket_values_match_batch(spark, chunked, agg):
    tmpdir, batch_df = chunked
    from potoos_spark.streaming import streaming_bucket_scores

    cfg = TimeSeriesConfig(aggregation_type=agg, bucket_size_msec=BUCKET)
    sdf = streaming_bucket_scores(_read_stream(spark, tmpdir), cfg)
    name = _run_to_memory(sdf, f"m_bs_{agg.replace('.', '_')}", "append")
    got = sorted(
        (r["series_key"], r["ts_ms"], pytest.approx(r["value"], rel=1e-9, abs=1e-9))
        for r in spark.table(name).collect()
    )
    batch = apply_aggregation(batch_df, cfg).collect()
    last = {}
    for r in batch:
        last[r["series_key"]] = max(last.get(r["series_key"], 0), r["ts_ms"])
    want = sorted(
        (r["series_key"], r["ts_ms"], r["value"])
        for r in batch
        if r["ts_ms"] != last[r["series_key"]]
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        if w[2] is None:
            assert g[2].expected is None or g[2].expected == w[2]
        else:
            assert g[2] == w[2]


def test_monitor_stream_foreachbatch(spark, chunked):
    tmpdir, batch_df = chunked
    from potoos_spark.streaming import monitor_stream

    seen = {}

    def on_result(result, batch_id):
        seen[batch_id] = result.scores.count()

    q = monitor_stream(
        _read_stream(spark, tmpdir, one_file_per_batch=False),
        on_result,
        TimeSeriesConfig(aggregation_type="avg", bucket_size_msec=BUCKET),
        DetectorConfig(score_percent_threshold=0.9),
        availableNow=True,
    )
    q.awaitTermination(timeout=120)
    assert seen, "foreachBatch handler never ran"
    total = sum(seen.values())
    want = (
        apply_aggregation(
            batch_df, TimeSeriesConfig(aggregation_type="avg", bucket_size_msec=BUCKET)
        ).count()
    )
    assert total == want


def test_streaming_counter_rate_boundary_invariant_and_matches_batch(spark, chunked):
    """Multi-batch replay == single-batch replay == batch SQL semantics:
    per-bucket max deltas, final open bucket withheld, first finalized
    bucket seeds silently."""
    from pyspark.sql import Window as W

    from potoos_spark.streaming import streaming_counter_rate

    tmpdir, batch_df = chunked
    outs = []
    for chunked_read in (True, False):
        sdf = _read_stream(spark, tmpdir, one_file_per_batch=chunked_read)
        name = _run_to_memory(
            streaming_counter_rate(sdf, BUCKET),
            f"cr_{int(chunked_read)}",
            "append",
        )
        outs.append(_collect_sorted(spark.table(name)))
    assert outs[0] == outs[1] and outs[0]

    g = batch_df.groupBy(
        "series_key", (F.col("ts_ms") - F.col("ts_ms") % BUCKET).alias("ts_ms")
    ).agg(F.max("value").alias("value"))
    w = W.partitionBy("series_key").orderBy("ts_ms")
    gn = g.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(W.partitionBy("series_key"))
    )
    d = gn.filter(F.col("rn") < F.col("n")).withColumn(
        "pv", F.lag("value").over(w)
    )
    inc = F.when(F.col("value") >= F.col("pv"), F.col("value") - F.col("pv")).otherwise(
        F.col("value")
    )
    expected = _collect_sorted(
        d.filter(F.col("pv").isNotNull()).select(
            "series_key", "ts_ms", "value",
            inc.alias("increase"),
            (inc / (BUCKET / 1000.0)).alias("rate_per_sec"),
        )
    )
    assert outs[0] == expected


def test_streaming_gap_detect_boundary_invariant_and_matches_batch(spark, chunked):
    """Gap alerts must not depend on where micro-batch boundaries fall
    (a gap spanning two batches emits when its closing point arrives),
    and a full replay equals the batch lead-window watchdog."""
    from potoos_spark.streaming.stateful import streaming_gap_detect

    tmpdir, batch_df = chunked
    # fixture points are uniformly 10s apart: a 5s threshold flags every
    # step — including the steps that SPAN a micro-batch boundary, which
    # is exactly the state-carry case this test exists to pin
    th = 5_000
    outs = []
    for chunked_read in (True, False):
        sdf = _read_stream(spark, tmpdir, one_file_per_batch=chunked_read)
        name = _run_to_memory(
            streaming_gap_detect(sdf, th), f"gap_{int(chunked_read)}", "append"
        )
        outs.append(_collect_sorted(spark.table(name)))
    assert outs[0] == outs[1] and outs[0]

    w = W.partitionBy("series_key").orderBy("ts_ms", "seq")
    nxt = F.lead("ts_ms").over(w)
    expected = _collect_sorted(
        batch_df.select(
            "series_key",
            F.col("ts_ms").alias("gap_start_ms"),
            nxt.alias("gap_end_ms"),
            (nxt - F.col("ts_ms")).alias("gap_ms"),
        ).filter(F.col("gap_ms") > th)
    )
    assert outs[0] == expected


def test_streaming_debounce_boundary_invariant_and_matches_batch(spark, chunked):
    from potoos_spark.operators.downsample import debounce
    from potoos_spark.streaming import streaming_debounce

    tmpdir, batch_df = chunked
    outs = []
    for chunked_read in (True, False):
        sdf = _read_stream(spark, tmpdir, one_file_per_batch=chunked_read)
        name = _run_to_memory(
            streaming_debounce(sdf, 25_000), f"db_{int(chunked_read)}", "append"
        )
        outs.append(_collect_sorted(spark.table(name)))
    assert outs[0] == outs[1] and outs[0]
    expected = _collect_sorted(
        debounce(batch_df, 25_000).select("series_key", "ts_ms", "value")
    )
    assert outs[0] == expected


def test_stream_simhash_dedup_suppresses_shuffled_near_copy(spark, tmp_path):
    """The streaming near-dup guard catches what the exact guard cannot:
    a word-order-shuffled copy has a different content hash but an
    IDENTICAL SimHash fingerprint (the in-row fold is over the distinct
    token set), so exactly one of the pair survives. Distinct texts
    survive independently; punctuation-only docs are dropped."""
    import uuid

    from pyspark.sql import functions as F

    from potoos_spark.operators.dedup import (
        simhash,
        streaming_simhash_dedup,
    )

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "jumps fox brown quick the"),   # shuffled near-copy of 1
        (3, "an entirely different document"),
        (4, "?!...   "),                      # token-less: dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "ingest_time",
        F.timestamp_millis(F.lit(1_700_000_000_000) + F.col("doc_id")),
    )
    src = tmp_path / "near_src"
    df.repartition(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema("doc_id bigint, text string, ingest_time timestamp")
        .parquet(str(src))
    )
    out = streaming_simhash_dedup(sdf)
    name = f"m_simdedup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(name)
    assert got.count() == 2  # {1,2} collapse; 3 survives; 4 dropped
    want = {r["simhash"] for r in simhash(df).select("simhash").distinct().collect()}
    assert {r["simhash"] for r in got.collect()} == want
