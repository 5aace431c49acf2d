"""D10: score series → anomaly windows (gaps-and-islands), plus D9 refine.

The reference delegates this to Luminol's threshold/window extraction
(scores above an absolute ``score_threshold`` or a
``score_percent_threshold`` fraction of the series max become contiguous
anomaly windows, each carrying its peak point). Spark-first: one ranked
window per series for the island ids, one hash aggregation for the
window rows — classic ``rn - rn_above`` segment keying, no Python.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F, Window as W

from .base import get_detector

ANOMALY_COLS = (
    "series_key",
    "start_ts_ms",
    "end_ts_ms",
    "exact_ts_ms",
    "anomaly_score",
)


def extract_anomalies(
    scores: DataFrame,
    score_threshold: Optional[float] = None,
    score_percent_threshold: Optional[float] = None,
) -> DataFrame:
    """Contiguous runs of above-threshold scores → one row per window:
    (series_key, start_ts_ms, end_ts_ms, exact_ts_ms, anomaly_score)
    where exact is the peak point (ties → earliest peak, deterministic).

    Absolute threshold wins when both are given (reference config.py:84-85);
    with neither, any strictly-positive score is anomalous.
    """
    w_series = W.partitionBy("series_key")
    # score as tiebreak: both row_number passes must rank duplicate
    # timestamps identically or one contiguous run can split/merge
    # nondeterministically (rows equal in (ts, score) are interchangeable)
    w_ordered = w_series.orderBy("ts_ms", "score")

    if score_threshold is not None:
        above = F.col("score") >= float(score_threshold)
    elif score_percent_threshold is not None:
        thr = F.max("score").over(w_series) * float(score_percent_threshold)
        above = (F.col("score") >= thr) & (F.col("score") > 0)
    else:
        above = F.col("score") > 0

    flagged = scores.withColumn("__above", above).withColumn(
        "__rn", F.row_number().over(w_ordered)
    )
    islands = flagged.filter(F.col("__above")).withColumn(
        "__island",
        F.col("__rn")
        - F.row_number().over(w_ordered),
    )
    return islands.groupBy("series_key", "__island").agg(
        F.min("ts_ms").alias("start_ts_ms"),
        F.max("ts_ms").alias("end_ts_ms"),
        F.max_by("ts_ms", F.struct(F.col("score"), -F.col("ts_ms"))).alias(
            "exact_ts_ms"
        ),
        F.max("score").alias("anomaly_score"),
    ).drop("__island")


def refine_anomalies(
    points: DataFrame,
    anomalies: DataFrame,
    refine_algorithm_name: str,
    refine_algorithm_params: Optional[dict] = None,
) -> DataFrame:
    """D9: re-score the points inside each anomaly window with a second
    algorithm; the window keeps its extent but its peak
    (exact_ts_ms/anomaly_score) is recomputed from the refined scores.

    The anomaly set is tiny relative to the points, so the window
    assignment is a broadcast range join — no extra shuffle of the
    points beyond the refine algorithm's own per-series pass.
    """
    refine = get_detector(refine_algorithm_name)
    win = anomalies.select(
        "series_key",
        F.col("start_ts_ms").alias("__w_start"),
        F.col("end_ts_ms").alias("__w_end"),
    )
    in_windows = points.join(F.broadcast(win), "series_key").filter(
        F.col("ts_ms").between(F.col("__w_start"), F.col("__w_end"))
    )
    # refine runs per (series, WINDOW), not per series: rolling/global-
    # stat refiners (hampel, mad, derivative) must never mix points from
    # separate anomaly windows or bridge the time gaps between them.
    # The window start is folded into the grouping key for the refine
    # pass and split back out afterwards (\x1f never occurs in keys).
    sep = "\x1f"
    tagged = in_windows.select(
        F.concat_ws(
            sep, F.col("series_key"), F.col("__w_start").cast("string")
        ).alias("series_key"),
        "ts_ms",
        "value",
    )
    rescored = refine(tagged, **(refine_algorithm_params or {}))
    split = rescored.select(
        F.substring_index("series_key", sep, 1).alias("series_key"),
        F.substring_index("series_key", sep, -1).cast("bigint").alias("__w_start"),
        "ts_ms",
        "score",
    )
    peaks = split.groupBy("series_key", "__w_start").agg(
        F.max_by("ts_ms", F.struct(F.col("score"), -F.col("ts_ms"))).alias(
            "exact_ts_ms"
        ),
        F.max("score").alias("anomaly_score"),
    )
    return peaks.join(F.broadcast(win), ["series_key", "__w_start"]).select(
        "series_key",
        F.col("__w_start").alias("start_ts_ms"),
        F.col("__w_end").alias("end_ts_ms"),
        "exact_ts_ms",
        "anomaly_score",
    )


def merge_incidents(windows: DataFrame, bridge_ms: int = 0) -> DataFrame:
    """Fold per-series anomaly windows into GLOBAL incidents: windows
    that overlap in time (or sit within ``bridge_ms`` of each other)
    merge into one incident regardless of series — the on-call view
    ("one outage hit 14 series for 20 minutes"), where per-series
    window extraction answers the per-metric question.

    Classic sweep as window functions: order all windows by start; a
    new incident begins exactly where a window's start exceeds the
    running maximum end (+ bridge) of everything before it; the
    incident id is the running count of such breaks. Deterministic
    total order via (start, end, series_key).

    Scale note: the sweep runs over ONE global sort — deliberately.
    The input is the ALERT stream (one row per extracted window, not
    per point), orders of magnitude smaller than the data; if alert
    volume ever challenges a single sort, the thresholds upstream are
    wrong long before the plan is. This is the same judgment as a
    TakeOrdered top-k: global, but over an intrinsically small relation.

    Output: (incident_start_ms, incident_end_ms, n_windows, n_series,
    peak_score).
    """
    w = W.orderBy("start_ts_ms", "end_ts_ms", "series_key")
    prev_max_end = F.max("end_ts_ms").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    is_break = F.when(
        prev_max_end.isNull()
        | (F.col("start_ts_ms") > prev_max_end + int(bridge_ms)),
        1,
    ).otherwise(0)
    staged = windows.withColumn("__brk", is_break).withColumn(
        "__incident", F.sum("__brk").over(w)
    )
    return (
        staged.groupBy("__incident")
        .agg(
            F.min("start_ts_ms").alias("incident_start_ms"),
            F.max("end_ts_ms").alias("incident_end_ms"),
            F.count("*").alias("n_windows"),
            F.countDistinct("series_key").alias("n_series"),
            F.max("anomaly_score").alias("peak_score"),
        )
        .drop("__incident")
    )
