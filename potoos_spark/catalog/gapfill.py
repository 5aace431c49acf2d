"""Oracle-checked catalog: gap filling / resampling + calendar buckets.

Input series = hourly MIN buckets of events filtered to value > 150 —
the filter punches real holes in the hourly grid so the fill paths are
exercised; MIN keeps every value exact (no accumulation). LOCF copies
values (exact); linear interpolation uses the identical closed form on
both engines over exact inputs → bit-exact doubles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.gapfill import gap_fill
from .common import EVENTS_SQL, QuerySpec, events_frame

HOUR = 3_600_000
_S = f"WITH series AS ({EVENTS_SQL})"

_PTS = (
    f"pts AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, MIN(value) AS value "
    f"FROM series WHERE value > 150 GROUP BY series_key, ts_ms - ts_ms % {HOUR})"
)
_GRID = (
    "rng AS (SELECT series_key, MIN(ts_ms) AS lo, MAX(ts_ms) AS hi FROM pts GROUP BY 1), "
    f"grid AS (SELECT series_key, unnest(generate_series(lo, hi, {HOUR})) AS ts_ms FROM rng), "
    "d AS (SELECT g.series_key, g.ts_ms, p.value FROM grid g "
    "LEFT JOIN pts p ON p.series_key = g.series_key AND p.ts_ms = g.ts_ms)"
)
_W_PREV = "(PARTITION BY series_key ORDER BY ts_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
_W_NEXT = "(PARTITION BY series_key ORDER BY ts_ms ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"


def _sparse_hourly(spark, sf_dir):
    df = events_frame(spark, sf_dir).filter(F.col("value") > 150)
    bucket = F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(HOUR))
    return (
        df.groupBy("series_key", bucket.alias("bucket_ms"))
        .agg(F.min("value").alias("value"))
        .withColumnRenamed("bucket_ms", "ts_ms")
    )


def _locf_fn(spark, sf_dir):
    return gap_fill(_sparse_hourly(spark, sf_dir), HOUR, fill="locf")


def _linear_fn(spark, sf_dir):
    return gap_fill(_sparse_hourly(spark, sf_dir), HOUR, fill="linear")


_LOCF_SQL = (
    f"{_S}, {_PTS}, {_GRID} "
    f"SELECT series_key, ts_ms, last_value(value IGNORE NULLS) OVER {_W_PREV} AS value, "
    "value IS NULL AS is_filled FROM d"
)

_LINEAR_SQL = (
    f"{_S}, {_PTS}, {_GRID}, "
    f"x AS (SELECT series_key, ts_ms, value, "
    f"last_value(value IGNORE NULLS) OVER {_W_PREV} AS pv, "
    f"last_value(CASE WHEN value IS NOT NULL THEN ts_ms END IGNORE NULLS) OVER {_W_PREV} AS pt, "
    f"first_value(value IGNORE NULLS) OVER {_W_NEXT} AS nv, "
    f"first_value(CASE WHEN value IS NOT NULL THEN ts_ms END IGNORE NULLS) OVER {_W_NEXT} AS nt "
    "FROM d) "
    "SELECT series_key, ts_ms, CASE WHEN value IS NOT NULL THEN value "
    "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN "
    "pv + (nv - pv) * (CAST(ts_ms - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) "
    "ELSE COALESCE(pv, nv) END AS value, value IS NULL AS is_filled FROM x"
)


def _month_fn(spark, sf_dir):
    df = events_frame(spark, sf_dir)
    month = F.date_format(F.timestamp_millis(F.col("ts_ms")), "yyyy-MM")
    return (
        df.groupBy("series_key", month.alias("month"))
        .agg(F.min("value").alias("value"), F.count("*").alias("n"))
    )


_MONTH_SQL = (
    f"{_S} SELECT series_key, strftime(epoch_ms(ts_ms), '%Y-%m') AS month, "
    "MIN(value) AS value, COUNT(*) AS n FROM series GROUP BY 1, 2"
)


QUERIES: dict[str, QuerySpec] = {
    "ts_gapfill_locf": QuerySpec(_locf_fn, _LOCF_SQL),
    "ts_gapfill_linear": QuerySpec(_linear_fn, _LINEAR_SQL),
    "ts_agg_month": QuerySpec(_month_fn, _MONTH_SQL),
}
