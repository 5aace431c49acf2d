"""Closed-form detectors: pure JVM column expressions, no Python in the
hot path (SURVEY.md §2.4 D5, D6, D7 — the algorithms whose published
semantics are expressible without sequential state).

Everything here stays inside whole-stage codegen; the only shuffles are
the per-series window sorts, which co-partition by series_key once and
are reused across the lag/rolling expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W

from .base import register_detector
from ..operators.asof import asof_join

def _series_w():
    return W.partitionBy("series_key").orderBy("ts_ms")


@register_detector("absolute_threshold")
def absolute_threshold(
    df: DataFrame,
    absolute_threshold_value_upper: float | None = None,
    absolute_threshold_value_lower: float | None = None,
) -> DataFrame:
    """D5: score = exceedance beyond fixed bounds (published Luminol
    AbsoluteThreshold semantics): value above upper scores value-upper,
    below lower scores lower-value, else 0."""
    upper = (
        F.lit(float(absolute_threshold_value_upper))
        if absolute_threshold_value_upper is not None
        else None
    )
    lower = (
        F.lit(float(absolute_threshold_value_lower))
        if absolute_threshold_value_lower is not None
        else None
    )
    score = F.lit(0.0)
    if upper is not None:
        score = F.when(F.col("value") > upper, F.col("value") - upper).otherwise(score)
    if lower is not None:
        score = F.when(F.col("value") < lower, lower - F.col("value")).otherwise(score)
    return df.select(
        "series_key", "ts_ms", "value", score.cast("double").alias("score")
    )


@register_detector("diff_percent_threshold")
def diff_percent_threshold(
    df: DataFrame,
    baseline: DataFrame,
    percent_threshold_upper: float | None = None,
    percent_threshold_lower: float | None = None,
) -> DataFrame:
    """D6: percent deviation vs a baseline series (reference requires
    ``baseline_time_series``, config.py:82). Baseline alignment is an
    **as-of join** (latest baseline point at-or-before each ts) — the
    reference/Luminol assume exactly-aligned timestamps; as-of is the
    defined superset semantics (SURVEY.md §7 hard-point 4). Score is the
    signed percent diff's exceedance over the thresholds; 0 inside the
    band, null-baseline rows score 0."""
    joined = asof_join(
        df,
        baseline.select("series_key", "ts_ms", F.col("value").alias("base_value")),
        on="series_key",
        left_ts="ts_ms",
        right_ts="ts_ms",
    )
    pct = F.when(
        F.col("base_value").isNotNull() & (F.col("base_value") != 0),
        (F.col("value") - F.col("base_value")) / F.abs(F.col("base_value")) * 100.0,
    )
    score = F.lit(0.0)
    if percent_threshold_upper is not None:
        up = F.lit(float(percent_threshold_upper))
        score = F.when(pct > up, pct - up).otherwise(score)
    if percent_threshold_lower is not None:
        lo = F.lit(-abs(float(percent_threshold_lower)))
        score = F.when(pct < lo, lo - pct).otherwise(score)
    return joined.select(
        "series_key", "ts_ms", "value", score.cast("double").alias("score")
    )


@register_detector("sign_test")
def sign_test(
    df: DataFrame,
    baseline: DataFrame,
    window_size: int = 10,
    offset: float = 0.0,
) -> DataFrame:
    """D7: rolling sign test vs baseline. Over the trailing
    ``window_size`` points, count how often value exceeds
    baseline*(1+offset); score = one-sided binomial z-statistic of that
    count (0 until a full window is seen). Rolling counts are a plain
    window frame — no sequential state, stays in codegen."""
    joined = asof_join(
        df,
        baseline.select("series_key", "ts_ms", F.col("value").alias("base_value")),
        on="series_key",
        left_ts="ts_ms",
        right_ts="ts_ms",
    )
    sign = F.when(
        F.col("base_value").isNotNull()
        & (F.col("value") > F.col("base_value") * (1.0 + float(offset))),
        1,
    ).otherwise(0)
    w = _series_w().rowsBetween(-(int(window_size) - 1), 0)
    s = F.sum(sign).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    z = (s - n / 2.0) / F.sqrt(n / 4.0)
    score = F.when(n >= float(window_size), F.greatest(z, F.lit(0.0))).otherwise(0.0)
    return joined.select(
        "series_key", "ts_ms", "value", score.cast("double").alias("score")
    )


@register_detector("mad")
def mad_detector(df: DataFrame, scale: float = 1.4826) -> DataFrame:
    """Robust per-series scoring via Median Absolute Deviation (extension
    tier — no reference file:line; standard robust alternative to the
    z-score detectors, immune to the outliers it is hunting).

    score = |value - median| / (scale * MAD), 0 when MAD == 0.

    Both medians are the LOW median (element at rank ceil(n/2), ordered
    with a deterministic (value, ts_ms) tie-break) — no interpolation,
    so the score is bit-exact across engines and cluster sizes. Two
    ranked windows + one thin broadcast-ready join per pass; everything
    stays in whole-stage codegen."""

    def _low_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        # rank ceil(n/2) == floor((n+1)/2); row_number is unique, so the
        # filter keeps exactly one row per series
        w = W.partitionBy("series_key").orderBy(col, "ts_ms")
        ranked = frame.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count("*").over(W.partitionBy("series_key"))
        )
        return (
            ranked.filter(F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
            .groupBy("series_key")
            .agg(F.min(col).alias(out))
        )

    med = _low_median(df, "value", "__med")
    dev = df.join(med, "series_key").withColumn(
        "__dev", F.abs(F.col("value") - F.col("__med"))
    )
    mad = _low_median(dev, "__dev", "__mad")
    scored = dev.join(mad, "series_key")
    denom = F.lit(float(scale)) * F.col("__mad")
    score = F.when(denom > 0, F.col("__dev") / denom).otherwise(F.lit(0.0))
    return scored.select(
        "series_key", "ts_ms", "value", score.cast("double").alias("score")
    )


@register_detector("seasonal_naive")
def seasonal_naive(
    df: DataFrame, period: int = 24, normalizer: str = "range"
) -> DataFrame:
    """Seasonal-naive scoring (extension tier — no reference file:line;
    the standard first-line seasonal baseline): the forecast for point i
    is the value one season earlier, score = |value - lag(value, period)|
    normalized by the per-series range. Rows with no seasonal reference
    (the first ``period`` rows of each series) score 0.

    ``period`` counts ROWS, not wall-clock — feed it regularly bucketed
    series (e.g. hourly averages with period=24 for daily seasonality).
    One window sort per series, everything in whole-stage codegen; the
    range normalizer is max-min (no accumulation), so scores are
    bit-exact across engines and partitionings."""
    if normalizer not in ("range", "std"):
        raise ValueError("normalizer must be 'range' or 'std'")
    w = _series_w()
    sw = W.partitionBy("series_key")
    base = F.lag("value", int(period)).over(w)
    denom = (
        F.max("value").over(sw) - F.min("value").over(sw)
        if normalizer == "range"
        else F.stddev_samp("value").over(sw)
    )
    dev = F.abs(F.col("value") - base)
    score = F.when(base.isNotNull() & (denom > 0), dev / denom).otherwise(
        F.lit(0.0)
    )
    return df.select(
        "series_key", "ts_ms", "value", score.cast("double").alias("score")
    )


@register_detector("hampel")
def hampel(
    df: DataFrame, half_window: int = 5, scale: float = 1.4826
) -> DataFrame:
    """Hampel filter scoring (extension tier — no reference file:line;
    the classic rolling robust outlier detector): over a centered
    rows-window of 2*half_window+1 points, score =
    |value - rolling_low_median| / (scale * rolling_low_MAD), 0 when the
    MAD is 0.

    Both medians are LOW medians (rank floor((n+1)/2) of the sorted
    window — no interpolation), computed IN-ROW from the window's
    collect_list via array HOFs: one window sort per series, no
    self-join, no second pass — at 100 TB the frame never leaves its
    series partition. Truncated edge windows use whatever the frame
    holds (standard Hampel edge behavior). Bit-exact across engines:
    sort + element_at + one float division, no accumulation."""
    w = _series_w().rowsBetween(-int(half_window), int(half_window))
    lst = F.array_sort(F.collect_list("value").over(w))
    mid = F.floor((F.size(lst) + 1) / 2).cast("int")
    staged = df.select(
        "series_key", "ts_ms", "value", F.element_at(lst, mid).alias("__med"),
        lst.alias("__lst"),
    )
    dev_lst = F.array_sort(
        F.transform("__lst", lambda x: F.abs(x - F.col("__med")))
    )
    mad = F.element_at(dev_lst, F.floor((F.size(dev_lst) + 1) / 2).cast("int"))
    denom = F.lit(float(scale)) * mad
    score = F.when(
        denom > 0, F.abs(F.col("value") - F.col("__med")) / denom
    ).otherwise(F.lit(0.0))
    return staged.select(
        "series_key", "ts_ms", "value", score.cast("double").alias("score")
    )
