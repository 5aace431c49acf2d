"""Oracle-checked catalog: cross-series (MRANGE-style) and sliding
batch aggregation. Exact aggregators only (min/max/count) so
stream-of-doubles accumulation order can't perturb the hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import EVENTS_SQL, QuerySpec, events_frame
from ..operators.mrange import mrange_agg, sliding_bucket_agg

HOUR = 3_600_000
SLIDE = 1_800_000  # 30 min slide, 1h windows → overlap factor 2

_S = f"WITH series AS ({EVENTS_SQL})"


def _mrange_fn(spark, sf_dir):
    return mrange_agg(
        events_frame(spark, sf_dir),
        bucket_ms=HOUR,
        agg_type="max",
        reduce_type="min",
        series_filter=["click", "view", "error"],
    )


# per-(series, hour) max, then per-hour min across the three series
_MRANGE_SQL = (
    f"{_S}, ps AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    "MAX(value) AS value FROM series "
    "WHERE series_key IN ('click', 'view', 'error') "
    f"GROUP BY series_key, ts_ms - ts_ms % {HOUR}) "
    "SELECT ts_ms, MIN(value) AS value, COUNT(DISTINCT series_key) AS n_series "
    "FROM ps GROUP BY ts_ms"
)


def _sliding_fn(spark, sf_dir):
    return sliding_bucket_agg(
        events_frame(spark, sf_dir), bucket_ms=HOUR, slide_ms=SLIDE, agg_type="min"
    )


# each point lands in 2 overlapping windows: anchor and anchor - slide
_SLIDING_SQL = (
    f"{_S}, e AS (SELECT series_key, unnest(["
    f"ts_ms - ts_ms % {SLIDE}, ts_ms - ts_ms % {SLIDE} - {SLIDE}"
    "]) AS ts_ms, value FROM series) "
    "SELECT series_key, ts_ms, MIN(value) AS value FROM e GROUP BY series_key, ts_ms"
)


QUERIES: dict[str, QuerySpec] = {
    "ts_mrange_reduce": QuerySpec(_mrange_fn, _MRANGE_SQL),
    "ts_sliding_window": QuerySpec(_sliding_fn, _SLIDING_SQL),
}


TWO_HOURS = 7_200_000


def _rollup_route_fn(spark, sf_dir):
    """Hypertable rollup path: hourly algebraic partials combined up to
    2h buckets, finalized as max — must equal a direct 2h aggregation
    (the algebraic-closure contract, here held to the DuckDB oracle)."""
    from ..operators.rollup import combine_partials, finalize, rollup_partials

    partials = rollup_partials(events_frame(spark, sf_dir), HOUR)
    return finalize(combine_partials(partials, TWO_HOURS), "max")


_ROLLUP_ROUTE_SQL = (
    f"{_S} SELECT series_key, ts_ms - ts_ms % {TWO_HOURS} AS ts_ms, "
    f"MAX(value) AS value FROM series GROUP BY series_key, ts_ms - ts_ms % {TWO_HOURS}"
)

QUERIES["ts_rollup_route"] = QuerySpec(_rollup_route_fn, _ROLLUP_ROUTE_SQL)


def _salted_agg_fn(spark, sf_dir):
    """Skew-hardened two-stage aggregation — identical result contract
    to a plain groupBy (max/count are order-free exact), held to the
    oracle to prove salting never changes answers."""
    from ..operators.skew import salted_agg

    ev = events_frame(spark, sf_dir)
    mx = salted_agg(ev, ["series_key"], agg_type="max", out_col="max_value")
    n = salted_agg(ev, ["series_key"], agg_type="count", out_col="n_points")
    return mx.join(n, "series_key").select(
        "series_key", "max_value", F.col("n_points").cast("bigint").alias("n_points")
    )


_SALTED_AGG_SQL = (
    f"{_S} SELECT series_key, MAX(value) AS max_value, "
    "CAST(COUNT(value) AS BIGINT) AS n_points FROM series GROUP BY series_key"
)

QUERIES["ts_salted_agg"] = QuerySpec(_salted_agg_fn, _SALTED_AGG_SQL)


def _series_ratio_fn(spark, sf_dir):
    from ..operators.mrange import series_ratio

    return series_ratio(
        events_frame(spark, sf_dir), "error", "click", HOUR, agg="count"
    )


# PromQL-style vector division: per-hour error/click event-count ratio,
# inner bucket alignment; counts are exact, ratio is one division.
_SERIES_RATIO_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    "CAST(COUNT(value) AS DOUBLE) AS v FROM series "
    "WHERE series_key IN ('error', 'click') GROUP BY 1, 2), "
    "n AS (SELECT ts_ms, v AS num_value FROM g WHERE series_key = 'error'), "
    "d AS (SELECT ts_ms, v AS den_value FROM g WHERE series_key = 'click') "
    "SELECT n.ts_ms, n.num_value, d.den_value, "
    "CASE WHEN d.den_value <> 0 THEN n.num_value / d.den_value END AS ratio "
    "FROM n JOIN d USING (ts_ms)"
)

QUERIES["ts_series_ratio"] = QuerySpec(_series_ratio_fn, _SERIES_RATIO_SQL)


def _salted_join_fn(spark, sf_dir):
    """Answer-preservation proof for the salted join: events (skewed on
    series_key by construction) joined to a per-series dim through the
    salt spread must equal the plain join — aggregated per series so
    the oracle is decimal-exact."""
    from ..operators.skew import salted_join
    from .common import dec

    ev = events_frame(spark, sf_dir)
    dim = ev.groupBy("series_key").agg(F.max("value").alias("series_max"))
    j = salted_join(ev.select("series_key", "ts_ms", "value"), dim, "series_key")
    return j.groupBy("series_key").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
        F.min("series_max").alias("series_max"),
    )


_SALTED_JOIN_SQL = (
    f"{_S}, dim AS (SELECT series_key, MAX(value) AS series_max FROM series "
    "GROUP BY series_key) "
    "SELECT s.series_key, COUNT(*) AS n, "
    "CAST(SUM(CAST(s.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, "
    "MIN(d.series_max) AS series_max "
    "FROM series s JOIN dim d USING (series_key) GROUP BY s.series_key"
)

QUERIES["ts_salted_join"] = QuerySpec(_salted_join_fn, _SALTED_JOIN_SQL)
