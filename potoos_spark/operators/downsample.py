"""Visualization downsampling (extension tier — no reference file:line).

M4 (Jugel et al., "M4: A Visualization-Oriented Time Series Data
Aggregation", VLDB 2014 — public literature): per (series, pixel-column
bucket) keep the first, last, minimum and maximum points. Rendering
those ≤4 points per pixel column produces the pixel-identical line
chart of the raw data, so a 100 TB series downsamples to chart width ×
4 rows in ONE map-side-combined hash aggregation — no window sort, no
second pass. This is the canonical "render a huge series" operator the
reference's single-series driver loop could never reach.

Determinism: every argmin/argmax carries an explicit tie-break —
(ts, seq) for first/last (A15's latest-ingested convention), earliest
ts for value min/max — so results are identical across engines and
partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .retrieval import bucket_start


def m4_downsample(df: DataFrame, bucket_ms: int, offset_ms: int = 0) -> DataFrame:
    """(series_key, bucket_ms, ts_first, v_first, ts_last, v_last,
    ts_min, v_min, ts_max, v_max) per non-empty bucket.

    One ``groupBy(series_key, bucket)`` — all eight argmin/argmax
    reductions combine map-side, so the shuffle carries one row per
    (series, pixel column) regardless of raw density."""
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    ts, v = F.col("ts_ms"), F.col("value")
    return (
        df.withColumn("__tie", tie)
        .groupBy("series_key", b.alias("bucket_ms"))
        .agg(
            F.min(ts).alias("ts_first"),
            F.min_by(v, F.struct(ts, F.col("__tie"))).alias("v_first"),
            F.max(ts).alias("ts_last"),
            F.max_by(v, F.struct(ts, F.col("__tie"))).alias("v_last"),
            # earliest ts attaining the extreme value: lexicographic
            # (value, ts) for min, (-value, ts) for max
            F.min_by(ts, F.struct(v, ts)).alias("ts_min"),
            F.min(v).alias("v_min"),
            F.min_by(ts, F.struct(-v, ts)).alias("ts_max"),
            F.max(v).alias("v_max"),
        )
    )
