"""Gap filling / resampling — the dense-grid operator every
time-series store grows (TimescaleDB ``time_bucket_gapfill`` +
``locf``/``interpolate``; absent from the reference, which returns
only buckets that exist). Given a bucketed series, emit one row per
bucket on the regular grid between each series' first and last bucket,
filling missing buckets by:

* ``locf`` — last observation carried forward (exact: copies values);
* ``linear`` — linear interpolation between the surrounding
  observations (same closed form both engines → cross-engine exact);
* ``null`` — leave the gap as NULL (just densify).

Plan shape: per-series grid generation is ``sequence()`` + ``explode``
(no driver loop, no cross join); the fill is two window passes over one
(series, ts) sort — Spark computes the sort/exchange once and reuses
it. At 100 TB the grid explosion is bounded by (range/bucket) per
series; fill cost is the same one shuffle any per-series window op pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def gap_fill(
    df: DataFrame,
    bucket_ms: int,
    fill: str = "locf",
) -> DataFrame:
    """Densify a bucketed series frame onto the regular ``bucket_ms``
    grid spanning [min(ts), max(ts)] per series. Output:
    (series_key, ts_ms, value, is_filled)."""
    if fill not in ("locf", "linear", "null"):
        raise ValueError("fill must be one of 'locf', 'linear', 'null'")
    b = int(bucket_ms)

    grid = (
        df.groupBy("series_key")
        .agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"))
        .select(
            "series_key",
            F.explode(F.sequence("lo", "hi", F.lit(b))).alias("ts_ms"),
        )
    )
    dense = grid.join(df.select("series_key", "ts_ms", "value"), ["series_key", "ts_ms"], "left")
    if fill == "null":
        return dense.select(
            "series_key", "ts_ms", "value", F.col("value").isNull().alias("is_filled")
        )

    w_prev = (
        W.partitionBy("series_key").orderBy("ts_ms").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("series_key").orderBy("ts_ms").rowsBetween(0, W.unboundedFollowing)
    )
    prev_v = F.last("value", ignorenulls=True).over(w_prev)
    if fill == "locf":
        return dense.select(
            "series_key",
            "ts_ms",
            prev_v.alias("value"),
            F.col("value").isNull().alias("is_filled"),
        )

    prev_t = F.last(
        F.when(F.col("value").isNotNull(), F.col("ts_ms")), ignorenulls=True
    ).over(w_prev)
    next_v = F.first("value", ignorenulls=True).over(w_next)
    next_t = F.first(
        F.when(F.col("value").isNotNull(), F.col("ts_ms")), ignorenulls=True
    ).over(w_next)
    frac = (F.col("ts_ms") - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        ).otherwise(F.coalesce(prev_v, next_v))
    )
    return dense.select(
        "series_key",
        "ts_ms",
        interp.alias("value"),
        F.col("value").isNull().alias("is_filled"),
    )
