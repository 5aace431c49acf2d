"""Oracle-checked catalog: cross-series correlation (Luminol
Correlator surface). Exactness: series values are hourly SUMS of
integer-scaled (×100, floor+0.5) event values — bigint math end to
end; r derives from exact sums with the identical closed form on both
engines, so the doubles hash-match."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.correlate import cross_correlate
from .common import EVENTS_SQL, QuerySpec, events_frame

HOUR = 3_600_000
SHIFTS = [-2 * HOUR, -HOUR, 0, HOUR, 2 * HOUR]

_S = f"WITH series AS ({EVENTS_SQL})"


def _hourly_int_sums(spark, sf_dir):
    df = events_frame(spark, sf_dir)
    iv = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        df.select("series_key", "ts_ms", iv.alias("iv"))
        .groupBy(
            "series_key", (F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(HOUR))).alias("ts_ms")
        )
        .agg(F.sum("iv").alias("value"))
    )


def _correlate_fn(spark, sf_dir):
    return cross_correlate(
        _hourly_int_sums(spark, sf_dir), "click", "view", SHIFTS, exact=True
    )


_HOURLY = (
    "h AS (SELECT series_key, ts_ms - ts_ms % {hour} AS ts, "
    "SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v "
    "FROM series GROUP BY series_key, ts_ms - ts_ms % {hour})"
).format(hour=HOUR)

_CORRELATE_SQL = (
    f"{_S}, {_HOURLY}, "
    "a AS (SELECT ts, v AS va FROM h WHERE series_key = 'click'), "
    "b AS (SELECT ts, v AS vb FROM h WHERE series_key = 'view'), "
    "sh AS (SELECT s AS shift_ms, b.ts - s AS ts, vb FROM b, "
    f"unnest([{', '.join(str(s) for s in SHIFTS)}]) AS u(s)), "
    "j AS (SELECT shift_ms, va, vb FROM a JOIN sh ON a.ts = sh.ts), "
    "g AS (SELECT shift_ms, COUNT(*) AS n_overlap, SUM(va) AS sx, SUM(vb) AS sy, "
    "SUM(va*vb) AS sxy, SUM(va*va) AS sxx, SUM(vb*vb) AS syy FROM j GROUP BY shift_ms) "
    "SELECT shift_ms, n_overlap, "
    "CAST(n_overlap*sxy - sx*sy AS DOUBLE) / "
    "sqrt(CAST(n_overlap*sxx - sx*sx AS DOUBLE) * CAST(n_overlap*syy - sy*sy AS DOUBLE)) AS r "
    "FROM g WHERE n_overlap >= 2"
)


QUERIES: dict[str, QuerySpec] = {
    "ts_cross_correlate": QuerySpec(_correlate_fn, _CORRELATE_SQL),
}
