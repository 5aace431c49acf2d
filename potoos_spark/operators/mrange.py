"""Cross-series aggregation — the ``TS.MRANGE``/``GROUPBY``/``REDUCE``
surface the reference never wrapped (SURVEY.md §2.6: only single-key
``range``/``revrange`` is exposed, /root/reference/potoos/client.py:56-59).

Semantics follow the published RedisTimeSeries command: select a set of
series by filter, bucket each in time, then REDUCE across series per
bucket (sum/min/max/avg/count/...). In the canonical many-series frame
this is one aggregation — ``groupBy(bucket [, group_label])`` — because
series already live side by side in the DataFrame; the per-series →
cross-series pipeline needs no second pass:

  per-bucket-per-series agg (map combine) → per-bucket reduce

collapses into a single ``groupBy`` when the reducer and the bucket
aggregator compose (sum∘sum, min∘min, ...); when they don't (e.g.
avg-of-per-series-avgs), we run the two-level form explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .retrieval import _AGG_EXPRS, bucket_start


def mrange_agg(
    df: DataFrame,
    bucket_ms: int,
    agg_type: str = "avg",
    reduce_type: Optional[str] = None,
    series_filter: Optional[Sequence[str]] = None,
    align_offset_ms: int = 0,
) -> DataFrame:
    """Aggregate ACROSS series per time bucket.

    * ``series_filter``: keep only these series_keys (RTS FILTER).
    * ``agg_type``: per-(series, bucket) aggregation (A1-A12).
    * ``reduce_type``: cross-series reducer per bucket; defaults to
      ``agg_type`` when composable. Output: (ts_ms, value, n_series).
    """
    _REDUCERS = ("sum", "min", "max", "avg", "count", "range")
    if reduce_type is None:
        if agg_type not in _REDUCERS:
            raise ValueError(
                f"agg_type {agg_type!r} has no composable cross-series "
                f"reducer; pass reduce_type explicitly (one of {_REDUCERS})"
            )
        reduce_type = agg_type
    elif reduce_type not in _REDUCERS:
        raise ValueError(
            f"reduce_type must be one of {_REDUCERS}, got {reduce_type!r}"
        )
    if series_filter is not None:
        df = df.filter(F.col("series_key").isin(list(series_filter)))
    bucket = bucket_start(F.col("ts_ms"), bucket_ms, align_offset_ms)

    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    per_series = (
        df.withColumn("__tie", tie)
        .groupBy("series_key", bucket.alias("bucket_ms"))
        .agg(_AGG_EXPRS[agg_type]().cast("double").alias("value"))
        .withColumnRenamed("bucket_ms", "ts_ms")
    )
    reducer: Column = {
        "sum": F.sum("value"),
        "min": F.min("value"),
        "max": F.max("value"),
        "avg": F.avg("value"),
        "count": F.count("value").cast("double"),
        "range": F.max("value") - F.min("value"),
    }[reduce_type]
    return (
        per_series.groupBy("ts_ms")
        .agg(
            reducer.cast("double").alias("value"),
            F.count_distinct("series_key").alias("n_series"),
        )
    )


def sliding_bucket_agg(
    df: DataFrame,
    bucket_ms: int,
    slide_ms: int,
    agg_type: str = "min",
) -> DataFrame:
    """Batch sliding-window aggregation: overlapping buckets of width
    ``bucket_ms`` every ``slide_ms`` (bucket_ms must be a multiple).
    Implemented by exploding each point into its bucket_ms/slide_ms
    covering windows then one hash aggregation — the explosion factor
    is the overlap count, and the aggregation still combines map-side.
    (Streaming equivalent: aggregate.stream_bucket_agg(slide_msec=...).)
    """
    if bucket_ms % slide_ms != 0:
        raise ValueError("bucket_ms must be a multiple of slide_ms")
    k = bucket_ms // slide_ms
    # windows starting at anchor - j*slide for j in 0..k-1 cover ts
    anchor = bucket_start(F.col("ts_ms"), slide_ms)
    starts = F.array(*[anchor - F.lit(j * slide_ms) for j in range(k)])
    exploded = df.select(
        "series_key",
        F.explode(starts).alias("win_start"),
        "ts_ms",
        "value",
        *(["seq"] if "seq" in df.columns else []),
    )
    tie = F.col("seq") if "seq" in exploded.columns else F.col("value")
    return (
        exploded.withColumn("__tie", tie)
        .groupBy("series_key", "win_start")
        .agg(_AGG_EXPRS[agg_type]().cast("double").alias("value"))
        .withColumnRenamed("win_start", "ts_ms")
    )


def series_ratio(
    df: DataFrame,
    numerator_key: str,
    denominator_key: str,
    bucket_ms: int,
    agg: str = "count",
) -> DataFrame:
    """Cross-series binary arithmetic (the PromQL ``a / b`` vector op):
    bucket-aggregate two series and emit their per-bucket ratio —
    error-rate (errors/clicks), cache hit ratio, etc. Buckets present
    in only one series are dropped (inner alignment, PromQL vector-
    matching semantics). ``agg`` ∈ {count, min, max} — the exact
    (accumulation-free) aggregators, so the single final division is
    the only float op.

    Output: (ts_ms, num_value, den_value, ratio).
    """

    exprs = {
        "count": lambda: F.count("value").cast("double"),
        "min": lambda: F.min("value"),
        "max": lambda: F.max("value"),
    }
    if agg not in exprs:
        raise ValueError(f"agg must be one of {sorted(exprs)}")
    b = bucket_start(F.col("ts_ms"), int(bucket_ms))
    g = (
        df.filter(F.col("series_key").isin([numerator_key, denominator_key]))
        .groupBy(F.col("series_key"), b.alias("ts_ms"))
        .agg(exprs[agg]().alias("v"))
    )
    num = g.filter(F.col("series_key") == numerator_key).select(
        "ts_ms", F.col("v").alias("num_value")
    )
    den = g.filter(F.col("series_key") == denominator_key).select(
        "ts_ms", F.col("v").alias("den_value")
    )
    j = num.join(den, "ts_ms")
    return j.select(
        "ts_ms",
        "num_value",
        "den_value",
        F.when(F.col("den_value") != 0, F.col("num_value") / F.col("den_value"))
        .alias("ratio"),
    )
