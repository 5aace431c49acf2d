"""Structured-Streaming retrieval surface (SURVEY.md §7 Phase 3).

The batch retrieval operators (A1-A16) re-expressed over unbounded
streams: the same 12 aggregators run inside event-time ``window()``
groups with watermark-driven state eviction. Batch and streaming share
one aggregator table (``operators.retrieval._AGG_EXPRS``) so semantics
cannot drift between the two modes — Structured Streaming's unified
model is the whole point of the Spark-first rebuild (the reference's
closest analogue is a driver-side polling loop,
/root/reference/potoos/client.py:113-139).

Input contract: the canonical series frame ``(series_key, ts_ms, value
[, seq])`` as a *streaming* DataFrame. ``with_event_time`` derives the
TimestampType column watermarks require.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..config import TimeSeriesConfig
from ..operators.retrieval import _AGG_EXPRS

DEFAULT_WATERMARK = "10 minutes"


def with_event_time(sdf: DataFrame, watermark: str = DEFAULT_WATERMARK) -> DataFrame:
    """Attach ``event_time`` (TimestampType from ts_ms) + the watermark.

    The watermark bounds aggregation state: buckets older than
    max(event_time) - delay are finalized, emitted, and evicted — this is
    what makes A1-A16 runnable over an unbounded stream with bounded
    executor memory.
    """
    return sdf.withColumn("event_time", F.timestamp_millis(F.col("ts_ms"))).withWatermark(
        "event_time", watermark
    )


def _agg_value(agg_type: str) -> Column:
    """Aggregate expression for one A1-A12 aggregator. The first/last
    aggregators in _AGG_EXPRS read the caller-provided ``__tie`` column
    by name — every caller must attach it before aggregating."""
    expr = _AGG_EXPRS[agg_type]()
    if agg_type in ("std.s", "var.s"):
        expr = F.when(~F.isnan(expr), expr)
    return expr.cast("double").alias("value")


def _bucket_label(b: int, bucket_timestamp: Optional[str]) -> Column:
    start = F.unix_millis(F.col("window.start"))
    if bucket_timestamp == "~":
        return (start + F.lit(b // 2)).cast("bigint")
    if bucket_timestamp == "+":
        return F.unix_millis(F.col("window.end")).cast("bigint")
    return start.cast("bigint")


def stream_bucket_agg(
    sdf: DataFrame,
    cfg: Optional[TimeSeriesConfig] = None,
    watermark: str = DEFAULT_WATERMARK,
    slide_msec: Optional[int] = None,
) -> DataFrame:
    """A1-A14 over a stream: tumbling (or sliding, with ``slide_msec``)
    event-time windows per series. Align (A13) maps to the window
    ``startTime`` offset; bucket labeling (A14) reads window.start/end.

    Output: (series_key, ts_ms, value) — identical schema and bucket
    arithmetic as the batch ``apply_aggregation``, so a stream fed the
    same rows converges to the batch answer.
    """
    cfg = cfg or TimeSeriesConfig()
    if cfg.aggregation_type is None:
        raise ValueError("stream_bucket_agg requires cfg.aggregation_type")
    b = int(cfg.bucket_size_msec)
    dur = f"{b} milliseconds"
    slide = f"{int(slide_msec)} milliseconds" if slide_msec else dur
    offset = f"{cfg.align_offset_ms()} milliseconds"

    if "event_time" not in sdf.columns:
        sdf = with_event_time(sdf, watermark)
    tie = F.col("seq") if "seq" in sdf.columns else F.col("value")
    win = F.window(F.col("event_time"), dur, slide, offset)
    out = (
        sdf.withColumn("__tie", tie)
        .groupBy("series_key", win.alias("window"))
        .agg(_agg_value(cfg.aggregation_type))
    )
    return out.select(
        "series_key", _bucket_label(b, cfg.bucket_timestamp).alias("ts_ms"), "value"
    )


def stream_session_agg(
    sdf: DataFrame,
    gap: str,
    agg_type: str = "avg",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Session-window aggregation: activity bursts per series separated
    by ``gap`` of silence (extension — the reference has no session
    concept). Emits (series_key, session_start_ms, session_end_ms,
    n_points, value)."""
    if "event_time" not in sdf.columns:
        sdf = with_event_time(sdf, watermark)
    tie = F.col("seq") if "seq" in sdf.columns else F.col("value")
    out = (
        sdf.withColumn("__tie", tie)
        .groupBy("series_key", F.session_window(F.col("event_time"), gap).alias("w"))
        .agg(F.count("*").alias("n_points"), _agg_value(agg_type))
    )
    return out.select(
        "series_key",
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        F.unix_millis(F.col("w.end")).alias("session_end_ms"),
        "n_points",
        "value",
    )


def stream_anomaly_windows(
    sdf: DataFrame,
    cfg: TimeSeriesConfig,
    upper: float,
    lower: float,
    score_threshold: float,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming D10: incremental anomaly-*window* extraction, fully
    inside Structured Streaming — two chained stateful operators:

      bucket agg (event-time window) → absolute-threshold score →
      session_window islands (gap = bucket size)

    Consecutive anomalous buckets sit exactly one bucket apart and the
    session merge is inclusive at the gap, so the sessions are precisely
    the batch gaps-and-islands of ``extract_anomalies``. The chain needs
    ``window_time`` of the first agg's window column as the second
    operator's event time (Spark's chained-window contract); output is
    append-mode — a window emits once its session closes past the
    watermark, i.e. alerts fire incrementally with bounded state.

    Output: (series_key, start_ts_ms, end_ts_ms, exact_ts_ms,
    anomaly_score) — batch anomaly schema.
    """
    if cfg.aggregation_type is None:
        raise ValueError("stream_anomaly_windows requires cfg.aggregation_type")
    b = int(cfg.bucket_size_msec)
    dur = f"{b} milliseconds"
    if "event_time" not in sdf.columns:
        sdf = with_event_time(sdf, watermark)
    tie = F.col("seq") if "seq" in sdf.columns else F.col("value")
    agg = (
        sdf.withColumn("__tie", tie)
        .groupBy("series_key", F.window("event_time", dur).alias("window"))
        .agg(_agg_value(cfg.aggregation_type))
    )
    score = (
        F.when(F.col("value") > upper, F.col("value") - upper)
        .when(F.col("value") < lower, lower - F.col("value"))
        .otherwise(F.lit(0.0))
    )
    anom = (
        agg.withColumn("score", score)
        .filter(F.col("score") >= float(score_threshold))
        .withColumn("ts_ms", F.unix_millis(F.col("window.start")))
    )
    sess = anom.groupBy(
        "series_key", F.session_window(F.window_time("window"), dur).alias("__w")
    ).agg(
        F.min("ts_ms").alias("start_ts_ms"),
        F.max("ts_ms").alias("end_ts_ms"),
        F.max_by("ts_ms", F.struct(F.col("score"), -F.col("ts_ms"))).alias(
            "exact_ts_ms"
        ),
        F.max("score").alias("anomaly_score"),
    )
    return sess.select(
        "series_key", "start_ts_ms", "end_ts_ms", "exact_ts_ms", "anomaly_score"
    )


def stream_latest_dedup(
    sdf: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """A15 over a stream: latest ingested value per (series_key, ts_ms),
    ties broken by the ``seq`` ingestion sequence. Grouping on the
    event-time column itself lets the watermark evict per-timestamp
    state once no more duplicates can arrive.
    """
    if "event_time" not in sdf.columns:
        sdf = with_event_time(sdf, watermark)
    tie = F.col("seq") if "seq" in sdf.columns else F.col("value")
    return (
        sdf.withColumn("__tie", tie)
        .groupBy("series_key", "event_time")
        .agg(F.max_by("value", F.col("__tie")).alias("value"))
        .select(
            "series_key", F.unix_millis(F.col("event_time")).alias("ts_ms"), "value"
        )
    )


def stream_m4(
    sdf: DataFrame,
    bucket_msec: int,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming M4 downsampling: the batch ``m4_downsample`` argmin/
    argmax aggregation under an event-time tumbling window — same eight
    reductions, same (ts, seq) / (value, ts) tie-breaks, so the stream
    replay converges to the batch answer bit-for-bit. All eight
    aggregates combine map-side inside the streaming state store; state
    per (series, window) is one row.

    Output: identical schema to the batch op —
    (series_key, bucket_ms, ts_first, v_first, ts_last, v_last,
    ts_min, v_min, ts_max, v_max).
    """
    b = int(bucket_msec)
    if "event_time" not in sdf.columns:
        sdf = with_event_time(sdf, watermark)
    tie = F.col("seq") if "seq" in sdf.columns else F.col("value")
    ts, v = F.col("ts_ms"), F.col("value")
    out = (
        sdf.withColumn("__tie", tie)
        .groupBy(
            "series_key",
            F.window(F.col("event_time"), f"{b} milliseconds").alias("window"),
        )
        .agg(
            F.min(ts).alias("ts_first"),
            F.min_by(v, F.struct(ts, F.col("__tie"))).alias("v_first"),
            F.max(ts).alias("ts_last"),
            F.max_by(v, F.struct(ts, F.col("__tie"))).alias("v_last"),
            F.min_by(ts, F.struct(v, ts)).alias("ts_min"),
            F.min(v).alias("v_min"),
            F.min_by(ts, F.struct(-v, ts)).alias("ts_max"),
            F.max(v).alias("v_max"),
        )
    )
    return out.select(
        "series_key",
        F.unix_millis(F.col("window.start")).alias("bucket_ms"),
        "ts_first", "v_first", "ts_last", "v_last",
        "ts_min", "v_min", "ts_max", "v_max",
    )


def stream_ohlc(
    sdf: DataFrame,
    bucket_msec: int = 3_600_000,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """OHLC candles over a stream: one tumbling event-time window per
    (series, bucket) with open/close as seq-tiebroken ``min_by`` /
    ``max_by`` partials — the same single stateful aggregation as any
    windowed agg (state = one candle per open window, evicted at the
    watermark), converging to the batch ``ts_agg_ohlc`` answer on the
    same rows. No sort, no window function — min_by/max_by partials
    merge associatively, which is what makes the candle streamable."""
    if "event_time" not in sdf.columns:
        sdf = with_event_time(sdf, watermark)
    dur = f"{int(bucket_msec)} milliseconds"
    key = F.struct(F.col("ts_ms"), F.col("seq"))
    win = F.window(F.col("event_time"), dur)
    return (
        sdf.groupBy("series_key", win.alias("window"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
        )
        .select(
            "series_key",
            F.unix_millis(F.col("window.start")).alias("ts_ms"),
            "open",
            "high",
            "low",
            "close",
        )
    )
