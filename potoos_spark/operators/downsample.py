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

from pyspark.sql import DataFrame, Window as W, functions as F

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


def lttb_fixed(df: DataFrame, bucket_ms: int, offset_ms: int = 0) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    public thesis), fixed-anchor variant: per (series, time bucket) keep
    the point with the largest triangle area against

        A = the LAST point of the previous bucket   (left anchor)
        C = the MEAN point of the next bucket       (right anchor)

    Classic LTTB anchors A at the previously *selected* point, which
    makes the pass inherently sequential per series; fixing A to the
    previous bucket's last point removes the dependency, so the whole
    operator is ONE window pass over (series, bucket) — at 100 TB every
    bucket ranks its own points in parallel, no serial chain. The first
    bucket keeps its earliest point and the last bucket its latest
    (classic LTTB's endpoint rule).

    Determinism: bucket means accumulate in DECIMAL (exact, order-free);
    the area comparison is per-point IEEE arithmetic with an earliest-ts
    tie-break — bit-identical across engines and partitionings.

    Output: (series_key, bucket_ms, ts_ms, value).
    """
    dec_v = F.col("value").cast("decimal(18,2)")
    dec_t = F.col("ts_ms").cast("decimal(38,0)")
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    staged = df.select(
        "series_key", "ts_ms", "value", tie.alias("__tie"), b.alias("__b")
    )
    per_bucket = staged.groupBy("series_key", "__b").agg(
        F.sum(dec_t).alias("ts_sum"),
        F.sum(dec_v).alias("v_sum"),
        F.count("*").alias("n"),
        F.max_by(
            F.struct(F.col("ts_ms").alias("t"), F.col("value").alias("v")),
            F.struct("ts_ms", "__tie"),
        ).alias("last_pt"),
    )
    wb = W.partitionBy("series_key").orderBy("__b")
    anchors = per_bucket.select(
        "series_key",
        "__b",
        F.lag("last_pt.t").over(wb).alias("ax"),
        F.lag("last_pt.v").over(wb).alias("ay"),
        (F.lead("ts_sum").over(wb).cast("double")
         / F.lead("n").over(wb).cast("double")).alias("cx"),
        (F.lead("v_sum").over(wb).cast("double")
         / F.lead("n").over(wb).cast("double")).alias("cy"),
    )
    j = staged.join(anchors, ["series_key", "__b"])
    bx = F.col("ts_ms").cast("double")
    by = F.col("value")
    ax = F.col("ax").cast("double")
    area2 = F.abs(
        (ax - F.col("cx")) * (by - F.col("ay"))
        - (ax - bx) * (F.col("cy") - F.col("ay"))
    )
    # first bucket (no A): earliest point; last bucket (no C): latest
    # point; otherwise max-area with earliest-ts tie-break
    rank_w = W.partitionBy("series_key", "__b").orderBy(
        F.when(F.col("ax").isNull(), F.col("ts_ms"))
        .when(F.col("cx").isNull(), -F.col("ts_ms"))
        .otherwise(-area2),
        "ts_ms",
        "__tie",
    )
    return (
        j.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .select(
            "series_key", F.col("__b").alias("bucket_ms"), "ts_ms", "value"
        )
    )


def debounce(df: DataFrame, cooldown_ms: int) -> DataFrame:
    """Cooldown debouncing (the alert-fatigue sampler): per series keep
    a point only if at least ``cooldown_ms`` has passed since the last
    KEPT point; the first point is always kept. Unlike bucket
    first-sampling, the cooldown window restarts at each kept point —
    the selection is a true sequential recurrence (state = last kept
    timestamp), so it runs per-series in ``applyInPandas`` (the same
    lane as the EMA detectors) and is pinned by a recursive-CTE oracle.
    Integer timestamp arithmetic only — exact on any engine.

    Output: the kept rows (series_key, ts_ms, value).
    """
    import numpy as np
    import pandas as pd

    cd = int(cooldown_ms)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_ms", "__tie"]).reset_index(drop=True)
        ts = pdf["ts_ms"].to_numpy(dtype=np.int64)
        keep = np.zeros(len(ts), dtype=bool)
        last = None
        for i, t in enumerate(ts):
            if last is None or t - last >= cd:
                keep[i] = True
                last = t
        return pdf.loc[keep, ["series_key", "ts_ms", "value"]]

    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    return (
        df.select("series_key", "ts_ms", "value", tie.alias("__tie"))
        .groupBy("series_key")
        .applyInPandas(kernel, schema="series_key string, ts_ms bigint, value double")
    )
