"""Oracle-checked catalog: the reference retrieval surface
(SURVEY.md §2.1-2.3 — S1/S2, F1-F4, A1-A17) over the ``events`` table
reshaped to the canonical many-series frame.

Exactness notes: min/max/count/first/last/range go through the engine's
``read_series`` directly (their doubles are exact — no accumulation);
sum/avg/std/var accumulate in DECIMAL on both engines and derive the
final doubles with the identical formula, so hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F, Window as W

from ..config import TimeSeriesConfig
from ..operators import retrieval as R
from ..operators.retrieval import bucket_start
from .common import DEC, EVENTS_SQL, G_SQL, QuerySpec, dec, events_frame, hourly_avg_frame

HOUR = 3_600_000
T_LO = 1_704_412_800_000  # 2024-01-05
T_HI = 1_705_276_800_000  # 2024-01-15

# F2 IN-list: literal timestamps present in the sf0.01 events table
# (IN-list pushdown semantics need literals, mirroring RTS FILTER_BY_TS).
TS_IN_LIST = [
    1704067207179,
    1704067432824,
    1704067589165,
    1704067705002,
    1704067706640,
    1704067942992,
    1704067945325,
    1704068081845,
    1704068127760,
    1704068534297,
]

_S = f"WITH series AS ({EVENTS_SQL})"


def _m4_fn(spark, sf_dir):
    from ..operators.downsample import m4_downsample

    return m4_downsample(events_frame(spark, sf_dir), 6 * HOUR)


def _engine(cfg: TimeSeriesConfig):
    def fn(spark, sf_dir):
        return R.read_series(events_frame(spark, sf_dir), cfg)

    return fn


def _bucket_sql(expr: str, bucket: int = HOUR, offset: int = 0, label_shift: int = 0) -> str:
    b = (
        f"(ts_ms - {offset}) - (ts_ms - {offset}) % {bucket} + {offset}"
        if offset
        else f"ts_ms - ts_ms % {bucket}"
    )
    return (
        f"{_S} SELECT series_key, {b} + {label_shift} AS ts_ms, {expr} AS value "
        f"FROM series GROUP BY series_key, {b}"
    )


def _decimal_agg(final_expr, bucket: int = HOUR, offset: int = 0, label_shift: int = 0):
    """Spark side of the exact-decimal aggregations: shared bucketing code
    (``bucket_start``) + decimal accumulation + double finalization."""

    def fn(spark, sf_dir):
        df = events_frame(spark, sf_dir)
        bcol = bucket_start(F.col("ts_ms"), bucket, offset)
        g = df.groupBy("series_key", (bcol + F.lit(label_shift)).alias("ts_ms")).agg(
            F.sum(dec("value")).cast("double").alias("s"),
            F.sum(dec("value") * dec("value")).cast("double").alias("q"),
            F.count("value").cast("double").alias("n"),
        )
        return g.select(
            "series_key", "ts_ms", final_expr().cast("double").alias("value")
        )

    return fn


_VAR_P = "(q - s*s/n)/n"
_VAR_S = "CASE WHEN n > 1 THEN (q - s*s/n)/(n-1) END"
_DEC_SQL = {
    "s": f"CAST(SUM(CAST(value AS {DEC})) AS DOUBLE)",
    "q": f"CAST(SUM(CAST(value AS {DEC}) * CAST(value AS {DEC})) AS DOUBLE)",
    "n": "CAST(COUNT(value) AS DOUBLE)",
}


def _dec_sql(final: str, bucket: int = HOUR, offset: int = 0, label_shift: int = 0) -> str:
    b = (
        f"(ts_ms - {offset}) - (ts_ms - {offset}) % {bucket} + {offset}"
        if offset
        else f"ts_ms - ts_ms % {bucket}"
    )
    inner = (
        f"SELECT series_key, {b} + {label_shift} AS ts_ms, {_DEC_SQL['s']} AS s, "
        f"{_DEC_SQL['q']} AS q, {_DEC_SQL['n']} AS n FROM series GROUP BY series_key, {b}"
    )
    return f"{_S}, g AS ({inner}) SELECT series_key, ts_ms, CAST({final} AS DOUBLE) AS value FROM g"


def _first_last_sql(desc: bool) -> str:
    order = "ts_ms DESC, seq DESC" if desc else "ts_ms, seq"
    return (
        f"{_S}, b AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS bucket_ms, value, "
        f"ROW_NUMBER() OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
        f"ORDER BY {order}) AS rn FROM series) "
        "SELECT series_key, bucket_ms AS ts_ms, value FROM b WHERE rn = 1"
    )


def _ohlc_fn(spark, sf_dir):
    """OHLC candle per (series, hour): open/close via seq-tiebroken
    min_by/max_by (map-side combinable — one partial→final hash agg, no
    window sort), high/low plain min/max. The canonical downsample for
    financial/metric dashboards; one shuffle at any scale."""
    df = events_frame(spark, sf_dir)
    bcol = bucket_start(F.col("ts_ms"), HOUR)
    key = F.struct(F.col("ts_ms"), F.col("seq"))
    return df.groupBy("series_key", bcol.alias("ts_ms")).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
    )


_OHLC_SQL = (
    f"{_S}, b AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS bucket_ms, value, "
    f"ROW_NUMBER() OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
    "ORDER BY ts_ms, seq) AS rn_o, "
    f"ROW_NUMBER() OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
    "ORDER BY ts_ms DESC, seq DESC) AS rn_c FROM series) "
    "SELECT series_key, bucket_ms AS ts_ms, "
    "MIN(CASE WHEN rn_o = 1 THEN value END) AS open, "
    "MAX(value) AS high, MIN(value) AS low, "
    "MIN(CASE WHEN rn_c = 1 THEN value END) AS close "
    "FROM b GROUP BY series_key, bucket_ms"
)


def _count_limit_fn(reverse: bool):
    cfg = TimeSeriesConfig(count=50, reversed=reverse)
    return _engine(cfg)


def _count_limit_sql(reverse: bool) -> str:
    order = "ts_ms DESC, seq DESC" if reverse else "ts_ms, seq"
    return (
        f"{_S}, r AS (SELECT series_key, ts_ms, value, ROW_NUMBER() OVER "
        f"(PARTITION BY series_key ORDER BY {order}) AS rn FROM series) "
        "SELECT series_key, ts_ms, value FROM r WHERE rn <= 50"
    )


def _meta_fn(spark, sf_dir):
    return R.series_metadata(events_frame(spark, sf_dir)).select(
        "series_key",
        "data_points_analyzed",
        "anomalies_found",
        "start_ts_ms",
        "end_ts_ms",
        "duration_ms",
    )


def _guard_fn(spark, sf_dir):
    df = events_frame(spark, sf_dir).filter(F.col("value") > 200.0)
    kept = R.min_points_guard(df.select("series_key", "ts_ms", "value"), 30)
    return kept.groupBy("series_key").agg(F.count("*").alias("n"))


def _zip_ingest_fn(spark, sf_dir):
    """S5: round-trip through the array-payload shape — pack each series
    into parallel (timestamps[], values[]) arrays (the Redis reply
    format, reference client.py:62-63), then zip_ingest back out."""
    from ..operators.sources import zip_ingest

    df = events_frame(spark, sf_dir)
    packed = (
        df.groupBy("series_key")
        .agg(F.sort_array(F.collect_list(F.struct("ts_ms", "seq", "value"))).alias("pts"))
        .select(
            "series_key",
            F.col("pts.ts_ms").alias("timestamps"),
            F.col("pts.value").alias("values"),
        )
    )
    return zip_ingest(packed)




def _twa_fn(spark, sf_dir):
    from ..operators.rate import time_weighted_avg

    return time_weighted_avg(events_frame(spark, sf_dir), HOUR)


# LOCF time-weighted average: LEAD within (series, bucket), decimal-
# exact weighted sum, zero-span buckets fall back to the earliest
# point's value ((ts, seq) tie-break — same as the engine's min_by).
_TWA_SQL = (
    f"{_S}, p AS (SELECT series_key, ts_ms, value, seq, "
    f"ts_ms - ts_ms % {HOUR} AS b, "
    f"LEAD(ts_ms) OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
    "ORDER BY ts_ms, seq) AS nxt, "
    f"ROW_NUMBER() OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
    "ORDER BY ts_ms, seq) AS rn FROM series), "
    "g AS (SELECT series_key, b AS ts_ms, "
    f"SUM(CAST(value AS {DEC}) * (nxt - ts_ms)) AS s, "
    "MIN(ts_ms) AS t0, MAX(ts_ms) AS t1, "
    "MIN(CASE WHEN rn = 1 THEN value END) AS v0 "
    "FROM p GROUP BY series_key, b) "
    "SELECT series_key, ts_ms, CASE WHEN t1 > t0 "
    "THEN CAST(s AS DOUBLE) / CAST(t1 - t0 AS DOUBLE) ELSE v0 END AS value "
    "FROM g"
)


def _counter_rate_fn(spark, sf_dir):
    from ..operators.rate import counter_rate

    return counter_rate(events_frame(spark, sf_dir), HOUR)


def _stl_fn(spark, sf_dir):
    from ..operators.rate import stl_decompose

    return stl_decompose(events_frame(spark, sf_dir))


# STL-lite: trend = centered 25-bucket MA from windowed DECIMAL
# sums/counts (single division — exact); seasonal = per-(series, phase)
# mean of detrended values integer-scaled to 1e9 (order-free sums);
# residual = detrended - seasonal. Same float op order both engines.
_STL_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    f"SUM(CAST(value AS {DEC})) AS s, COUNT(value) AS c FROM series "
    f"GROUP BY series_key, ts_ms - ts_ms % {HOUR}), "
    "t AS (SELECT series_key, ts_ms, "
    "CAST(s AS DOUBLE) / c AS value, "
    "CAST(SUM(s) OVER w AS DOUBLE) / SUM(c) OVER w AS trend "
    "FROM g WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms "
    "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)), "
    "d AS (SELECT *, value - trend AS detrended, "
    f"(ts_ms // {HOUR}) % 24 AS phase, "
    "CAST(round((value - trend) * 1e9) AS BIGINT) AS se9 FROM t), "
    "e AS (SELECT *, (CAST(SUM(se9) OVER p AS DOUBLE) / COUNT(*) OVER p) / 1e9 "
    "AS seasonal FROM d WINDOW p AS (PARTITION BY series_key, phase)) "
    "SELECT series_key, ts_ms, value, trend, seasonal, "
    "detrended - seasonal AS residual FROM e"
)


def _winsorize_fn(spark, sf_dir):
    from ..operators.rate import winsorize

    return winsorize(events_frame(spark, sf_dir))


# Per-series [p5, p95] clamp: LOW-percentile ranks via pure integer
# arithmetic ((n*pct+99)//100, floored at 1) over the (value, ts, seq)
# total order — bounds are actual series values, result engine-exact.
_WINSORIZE_SQL = (
    f"{_S}, st AS (SELECT series_key, ts_ms, value, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY value, ts_ms, seq) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM series), "
    "b AS (SELECT *, "
    "MIN(CASE WHEN rn = GREATEST(1, (n * 5 + 99) // 100) THEN value END) "
    "OVER (PARTITION BY series_key) AS lo, "
    "MIN(CASE WHEN rn = (n * 95 + 99) // 100 THEN value END) "
    "OVER (PARTITION BY series_key) AS hi FROM st) "
    "SELECT series_key, ts_ms, value, "
    "LEAST(GREATEST(value, lo), hi) AS value_w FROM b"
)


def _resets_fn(spark, sf_dir):
    from ..operators.rate import counter_resets

    return counter_resets(events_frame(spark, sf_dir), HOUR)


# PromQL resets(): count of value DROPS per hourly bucket (decimal-
# exact comparison), attributed to the later point's bucket; first
# point of a series starts no step. Pure integer counting — exact.
_RESETS_SQL = (
    f"{_S}, d AS (SELECT series_key, ts_ms, "
    f"CASE WHEN LAG(CAST(value AS {DEC})) OVER w IS NULL THEN NULL "
    f"WHEN CAST(value AS {DEC}) < LAG(CAST(value AS {DEC})) OVER w "
    "THEN 1 ELSE 0 END AS drp FROM series "
    "WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms, seq)) "
    f"SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    "COUNT(*) AS n_steps, CAST(SUM(drp) AS BIGINT) AS n_resets "
    f"FROM d WHERE drp IS NOT NULL GROUP BY series_key, ts_ms - ts_ms % {HOUR}"
)


# Reset-aware counter increase/rate: decimal-exact deltas vs the
# previous point per series, summed into the later point's bucket.
_COUNTER_RATE_SQL = (
    f"{_S}, d AS (SELECT series_key, ts_ms, CAST(value AS {DEC}) AS v, "
    f"LAG(CAST(value AS {DEC})) OVER (PARTITION BY series_key "
    "ORDER BY ts_ms, seq) AS pv FROM series), "
    f"i AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS b, "
    "CASE WHEN pv IS NULL THEN NULL WHEN v >= pv THEN v - pv ELSE v END AS inc "
    "FROM d) "
    "SELECT series_key, b AS ts_ms, CAST(SUM(inc) AS DOUBLE) AS increase, "
    "CAST(SUM(inc) AS DOUBLE) / 3600.0 AS rate_per_sec "
    "FROM i WHERE inc IS NOT NULL GROUP BY series_key, b"
)




def _lttb_fn(spark, sf_dir):
    from ..operators.downsample import lttb_fixed

    return lttb_fixed(events_frame(spark, sf_dir), 6 * HOUR)


# Fixed-anchor LTTB: A = prev bucket's last point, C = next bucket's
# decimal-exact mean point; area comparison and tie-breaks mirror the
# engine exactly (earliest ts among equal areas, endpoint rule at the
# series edges).
_B6 = 6 * HOUR
_LTTB_SQL = (
    f"{_S}, pt AS (SELECT series_key, ts_ms, value, seq, "
    f"ts_ms - ts_ms % {_B6} AS b FROM series), "
    "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY series_key, b "
    "ORDER BY ts_ms DESC, seq DESC) AS rl FROM pt), "
    "pb AS (SELECT series_key, b, "
    "SUM(CAST(ts_ms AS DECIMAL(38,0))) AS ts_sum, "
    f"SUM(CAST(value AS {DEC})) AS v_sum, COUNT(*) AS n, "
    "MIN(CASE WHEN rl = 1 THEN ts_ms END) AS lt, "
    "MIN(CASE WHEN rl = 1 THEN value END) AS lv "
    "FROM r GROUP BY series_key, b), "
    "an AS (SELECT series_key, b, LAG(lt) OVER wb AS ax, LAG(lv) OVER wb AS ay, "
    "CAST(LEAD(ts_sum) OVER wb AS DOUBLE)/CAST(LEAD(n) OVER wb AS DOUBLE) AS cx, "
    "CAST(LEAD(v_sum) OVER wb AS DOUBLE)/CAST(LEAD(n) OVER wb AS DOUBLE) AS cy "
    "FROM pb WINDOW wb AS (PARTITION BY series_key ORDER BY b)), "
    "j AS (SELECT p.series_key, p.b, p.ts_ms, p.value, p.seq, an.ax, an.cx, "
    "ABS((CAST(an.ax AS DOUBLE) - an.cx)*(p.value - an.ay) - "
    "(CAST(an.ax AS DOUBLE) - CAST(p.ts_ms AS DOUBLE))*(an.cy - an.ay)) AS area2 "
    "FROM pt p JOIN an ON p.series_key = an.series_key AND p.b = an.b), "
    "k AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY "
    "CASE WHEN ax IS NULL THEN CAST(ts_ms AS DOUBLE) "
    "WHEN cx IS NULL THEN -CAST(ts_ms AS DOUBLE) ELSE -area2 END, ts_ms, seq) AS rn "
    "FROM j) "
    "SELECT series_key, b AS bucket_ms, ts_ms, value FROM k WHERE rn = 1"
)




def _irate_fn(spark, sf_dir):
    from ..operators.rate import irate

    return irate(events_frame(spark, sf_dir), HOUR)


# PromQL-style irate: last reset-aware sample step ending in each
# bucket; the step's left end may sit in the previous bucket. One
# subtraction + one division — no accumulation, bit-exact.
_IRATE_SQL = (
    f"{_S}, d AS (SELECT series_key, ts_ms, value, seq, "
    f"ts_ms - ts_ms % {HOUR} AS b, "
    "LAG(value) OVER w AS pv, LAG(ts_ms) OVER w AS pt, "
    f"ROW_NUMBER() OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
    "ORDER BY ts_ms DESC, seq DESC) AS rn FROM series "
    "WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms, seq)) "
    "SELECT series_key, b AS ts_ms, "
    "(CASE WHEN value >= pv THEN value - pv ELSE value END) / "
    "(CAST(CASE WHEN ts_ms - pt = 0 THEN 1000 ELSE ts_ms - pt END AS DOUBLE) "
    "/ 1000.0) AS irate_per_sec "
    "FROM d WHERE rn = 1 AND pv IS NOT NULL"
)




def _debounce_fn(spark, sf_dir):
    from ..operators.downsample import debounce

    return debounce(events_frame(spark, sf_dir), 30 * 60 * 1000)


# Cooldown debounce: keep a point iff >= 30min since the last KEPT
# point (window restarts at each kept point — a sequential recurrence,
# replayed as a recursive CTE carrying last-kept-ts; pure integer
# arithmetic). Duplicate-ts ties advance in (ts, seq) order.
_DEBOUNCE_CD = 30 * 60 * 1000
_DEBOUNCE_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), "
    "o AS (SELECT series_key, ts_ms, value, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms, seq) AS rn FROM series), "
    "r AS (SELECT series_key, ts_ms, value, rn, ts_ms AS lk, 1 AS kept "
    "FROM o WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, "
    f"CASE WHEN o.ts_ms - r.lk >= {_DEBOUNCE_CD} THEN o.ts_ms ELSE r.lk END, "
    f"CASE WHEN o.ts_ms - r.lk >= {_DEBOUNCE_CD} THEN 1 ELSE 0 END "
    "FROM o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, value FROM r WHERE kept = 1"
)




def _equidepth_fn(spark, sf_dir):
    df = events_frame(spark, sf_dir)
    w = W.partitionBy("series_key").orderBy("value", "seq")
    q = df.withColumn("quartile", F.ntile(4).over(w).cast("bigint"))
    return q.groupBy("series_key", "quartile").agg(
        F.count("*").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# Equi-depth (quantile-bucketed) histogram: NTILE over a deterministic
# (value, seq) order, then per-bucket extent/count — the equi-WIDTH
# histogram's complement (q_histogram). Standard-SQL NTILE distribution
# (first n%k buckets take the extra row) matches across engines.
_EQUIDEPTH_SQL = (
    f"{_S}, q AS (SELECT series_key, value, CAST(NTILE(4) OVER "
    "(PARTITION BY series_key ORDER BY value, seq) AS BIGINT) AS quartile "
    "FROM series) "
    "SELECT series_key, quartile, COUNT(*) AS n, MIN(value) AS lo, "
    "MAX(value) AS hi FROM q GROUP BY series_key, quartile"
)




def _deriv_fn(spark, sf_dir):
    from ..operators.rate import deriv_slope

    return deriv_slope(events_frame(spark, sf_dir), HOUR)


# PromQL-style deriv: per-bucket least-squares slope from exact integer
# (ms offsets) and decimal (values) co-moments; the division and the
# x1000 unit change are the only float ops.
_DERIV_SLOPE_SQL = (
    f"{_S}, st AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS b, ts_ms, "
    f"CAST(ts_ms - (ts_ms - ts_ms % {HOUR}) AS BIGINT) AS t, "
    f"CAST(value AS {DEC}) AS v FROM series), "
    "g AS (SELECT series_key, b AS ts_ms, COUNT(*) AS n, SUM(t) AS sx, "
    "SUM(v) AS sy, SUM(v * t) AS sxy, SUM(t * t) AS sxx, "
    "COUNT(DISTINCT ts_ms) AS nt FROM st GROUP BY series_key, b) "
    "SELECT series_key, ts_ms, CASE WHEN nt >= 2 THEN "
    "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) "
    "* 1000.0 END AS slope_per_sec FROM g"
)




GAP_THRESH_MS = 2 * HOUR


def _gap_detect_fn(spark, sf_dir):
    """Silence watchdog: report every gap > 2h between consecutive
    points of a series (the 'metric stopped reporting' alert that
    complements value-based detectors). One window sort per series —
    lead(ts) minus ts, filtered; integer arithmetic end to end."""
    df = events_frame(spark, sf_dir)
    w = W.partitionBy("series_key").orderBy("ts_ms", "seq")
    nxt = F.lead("ts_ms").over(w)
    g = df.select(
        "series_key",
        F.col("ts_ms").alias("gap_start_ms"),
        nxt.alias("gap_end_ms"),
        (nxt - F.col("ts_ms")).alias("gap_ms"),
    )
    return g.filter(F.col("gap_ms") > GAP_THRESH_MS)


_GAP_DETECT_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms AS gap_start_ms, "
    "LEAD(ts_ms) OVER (PARTITION BY series_key ORDER BY ts_ms, seq) AS gap_end_ms "
    "FROM series) "
    "SELECT series_key, gap_start_ms, gap_end_ms, "
    "gap_end_ms - gap_start_ms AS gap_ms FROM g "
    f"WHERE gap_end_ms - gap_start_ms > {GAP_THRESH_MS}"
)


def _seasonal_strength_fn(spark, sf_dir):
    """Hyndman's seasonal-strength statistic per series:
    max(0, 1 − Var(residual)/Var(seasonal + residual)) over the STL
    decomposition — ≈1 means the daily cycle explains nearly all
    non-trend variation, ≈0 means no usable seasonality (so
    seasonal-naive detectors would be noise). Determinism: residual
    and seasonal+residual are integer-scaled (floor(x·1e2 + 0.5) — floor of the binary double is engine-pure where round() is not, and the COARSE 1e2 quantum keeps every co-moment product under 2^53 so the final double casts are exact: DuckDB's INT128→double conversion is not correctly rounded above 2^53) and the
    two variances come from exact DECIMAL co-moment sums (n, Σx, Σx²)
    — the strength is a fixed four-op float expression over exact
    integers, identical on any engine or partitioning. One per-series
    hash agg on top of the decomposition's own shuffles."""
    from ..operators.rate import stl_decompose

    d = stl_decompose(events_frame(spark, sf_dir)).filter(
        F.col("residual").isNotNull()
    )
    D38 = "decimal(38,0)"
    r = F.floor(F.col("residual") * 1e2 + 0.5).cast(D38)
    y = F.floor((F.col("seasonal") + F.col("residual")) * 1e2 + 0.5).cast(D38)
    agg = d.groupBy("series_key").agg(
        F.count("*").cast(D38).alias("n"),
        F.sum(r).alias("sr"),
        F.sum(r * r).alias("srr"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
    )
    num = (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")).cast("double")
    den = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    strength = F.greatest(F.lit(0.0), F.lit(1.0) - num / den)
    return agg.filter(F.col("n") >= 3).select(
        "series_key",
        F.col("n").cast("bigint").alias("n_buckets"),
        F.when(den > 0, strength).alias("seasonal_strength"),
    )


# Variances from exact integer co-moments over the STL subquery; the
# strength is the same fixed float expression on both engines.
_SEASONAL_STRENGTH_SQL = (
    "SELECT series_key, CAST(n AS BIGINT) AS n_buckets, "
    "CASE WHEN CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN "
    "GREATEST(0.0, 1.0 - CAST(n * srr - sr * sr AS DOUBLE) / "
    "CAST(n * syy - sy * sy AS DOUBLE)) END AS seasonal_strength "
    "FROM (SELECT series_key, COUNT(*) AS n, "
    "SUM(r) AS sr, SUM(r * r) AS srr, SUM(y) AS sy, SUM(y * y) AS syy "
    "FROM (SELECT series_key, "
    "CAST(floor(residual * 1e2 + 0.5) AS BIGINT) AS r, "
    "CAST(floor((seasonal + residual) * 1e2 + 0.5) AS BIGINT) AS y "
    f"FROM ({_STL_SQL}) stl WHERE residual IS NOT NULL) x "
    "GROUP BY series_key) a WHERE n >= 3"
)


DAY = 24 * HOUR


def _calendar_profile_fn(spark, sf_dir):
    """Seasonality heatmap: per (series, day-of-week, hour-of-day) —
    the dashboard profile behind 'is Tuesday 9am normally this busy'.
    Calendar parts come from pure INTEGER epoch-ms arithmetic (hour =
    ts/3600000 mod 24; dow = epoch-day + 4 mod 7, 0 = Sunday — epoch
    day 0 was a Thursday), never timezone-dependent date functions
    whose session-zone semantics differ across engines. One map-side-
    combinable hash agg; the shuffle carries ≤ series×168 rows. The avg
    is one double division over an exact DECIMAL sum.

    Output: (series_key, dow, hour, n, avg_value)."""
    df = events_frame(spark, sf_dir)
    hour = F.floor(F.col("ts_ms") / HOUR).cast("bigint") % 24
    dow = (F.floor(F.col("ts_ms") / DAY).cast("bigint") + 4) % 7
    g = df.groupBy(
        "series_key", dow.alias("dow"), hour.alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).alias("__s"),
    )
    return g.select(
        "series_key",
        "dow",
        "hour",
        "n",
        (F.col("__s").cast("double") / F.col("n").cast("double")).alias(
            "avg_value"
        ),
    )


_CALENDAR_PROFILE_SQL = (
    f"{_S} SELECT series_key, "
    f"(CAST(floor(ts_ms / {DAY}) AS BIGINT) + 4) % 7 AS dow, "
    f"CAST(floor(ts_ms / {HOUR}) AS BIGINT) % 24 AS hour, "
    "COUNT(*) AS n, "
    f"CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_value "
    "FROM series GROUP BY 1, 2, 3"
)


SEASONAL_TOL = 150.0


def _seasonal_anomaly_fn(spark, sf_dir):
    """Seasonal-baseline residual anomalies — the monitor behind
    'alert when a metric leaves its NORMAL-FOR-THIS-HOUR band' (the
    production upgrade over the flat absolute threshold D5, which
    either misses rush-hour-sized deviations at night or fires every
    rush hour): expected value = the (series, dow, hour) calendar
    profile mean, residual = value − expected, anomaly when |residual|
    exceeds a fixed tolerance.

    Exactness: the expected value is one double division of an exact
    DECIMAL sum (the `_calendar_profile_fn` discipline), the residual
    a single double subtraction — both engine-pure per row. Shape: the
    profile is ≤ series×168 rows at ANY corpus size (calendar grain),
    so the join back to the event stream is a broadcast; total cost is
    two scans of events (one building the profile, one scoring) and
    zero wide shuffles beyond the tiny profile agg.

    Output: anomalous events only — (series_key, ts_ms, value,
    expected, residual).
    """
    df = events_frame(spark, sf_dir)
    hour = F.floor(F.col("ts_ms") / HOUR).cast("bigint") % 24
    dow = (F.floor(F.col("ts_ms") / DAY).cast("bigint") + 4) % 7
    prof = (
        df.groupBy("series_key", dow.alias("dow"), hour.alias("hour"))
        .agg(F.count("*").alias("n"), F.sum(dec("value")).alias("__s"))
        .select(
            "series_key", "dow", "hour",
            (F.col("__s").cast("double") / F.col("n").cast("double")).alias(
                "expected"
            ),
        )
    )
    scored = df.select(
        "series_key", "ts_ms", "value", dow.alias("dow"), hour.alias("hour")
    ).join(F.broadcast(prof), ["series_key", "dow", "hour"])
    return scored.select(
        "series_key",
        "ts_ms",
        "value",
        "expected",
        (F.col("value") - F.col("expected")).alias("residual"),
    ).filter(F.abs(F.col("value") - F.col("expected")) > SEASONAL_TOL)


_SEASONAL_ANOMALY_SQL = (
    f"{_S}, p AS (SELECT series_key, "
    f"(CAST(floor(ts_ms / {DAY}) AS BIGINT) + 4) % 7 AS dow, "
    f"CAST(floor(ts_ms / {HOUR}) AS BIGINT) % 24 AS hour, "
    f"CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS expected "
    "FROM series GROUP BY 1, 2, 3) "
    "SELECT s.series_key, s.ts_ms, s.value, p.expected, "
    "s.value - p.expected AS residual FROM series s JOIN p "
    f"ON p.series_key = s.series_key "
    f"AND p.dow = (CAST(floor(s.ts_ms / {DAY}) AS BIGINT) + 4) % 7 "
    f"AND p.hour = CAST(floor(s.ts_ms / {HOUR}) AS BIGINT) % 24 "
    f"WHERE abs(s.value - p.expected) > {SEASONAL_TOL!r}"
)


HEARTBEAT_MS = HOUR


def _heartbeat_sla_fn(spark, sf_dir):
    """Per-series availability summary from heartbeat gaps — see
    `operators/rate.heartbeat_sla` for semantics and the 100 TB
    physical shape (one lag window + one per-series hash agg).

    r4: deterministic final ORDER BY (driver-hash hygiene; a sort of
    |series| rows is free at any scale)."""
    from ..operators.rate import heartbeat_sla

    return heartbeat_sla(events_frame(spark, sf_dir), HEARTBEAT_MS).orderBy(
        "series_key"
    )


# r4 note: the integer SUMs are CAST AS BIGINT in the FINAL projection —
# DuckDB's SUM over integers returns HUGEINT (int128), which pandas
# materializes as float64 (6 -> 6.0) while Spark emits int64; a
# pandas-mediated value hash then diverges even though fetchall()-based
# comparison (the repo harness) says bit-exact.  This was the r3 driver
# hash failure.  See scripts/dtype_audit.py.
_HEARTBEAT_SLA_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms, "
    "LEAD(ts_ms) OVER (PARTITION BY series_key ORDER BY ts_ms, seq) - ts_ms AS gap "
    "FROM series), "
    "a AS (SELECT series_key, MAX(ts_ms) - MIN(ts_ms) AS span_ms, "
    "COUNT(*) AS n_points, "
    f"CAST(COALESCE(SUM(CASE WHEN gap > {HEARTBEAT_MS} THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations, "
    f"CAST(COALESCE(SUM(GREATEST(gap - {HEARTBEAT_MS}, 0)), 0) AS BIGINT) AS downtime_ms "
    "FROM g GROUP BY series_key) "
    "SELECT series_key, span_ms, n_points, n_violations, downtime_ms, "
    "CASE WHEN span_ms > 0 THEN 1.0 - CAST(downtime_ms AS DOUBLE) / "
    "CAST(span_ms AS DOUBLE) END AS uptime_ratio FROM a ORDER BY series_key"
)




def _pctl_bands_fn(spark, sf_dir):
    """Monitoring-style percentile bands (p50/p90/p99) per (series,
    hour): LOW percentile at rank ceil(q*n) — pure rank selection, no
    interpolation, so the bands are bit-exact and partitioning-
    independent. One ranked window + one conditional aggregation."""
    df = events_frame(spark, sf_dir)
    b = bucket_start(F.col("ts_ms"), HOUR)
    w = W.partitionBy("series_key", "__b").orderBy("value", "seq")
    r = (
        df.select("series_key", "value", "seq", b.alias("__b"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(W.partitionBy("series_key", "__b")))
    )
    def band(q, name):
        rank = F.ceil(F.col("__n") * q).cast("bigint")
        return F.min(F.when(F.col("__rn") == rank, F.col("value"))).alias(name)
    return r.groupBy("series_key", F.col("__b").alias("ts_ms")).agg(
        band(0.5, "p50"), band(0.9, "p90"), band(0.99, "p99"),
        F.count("*").alias("n"),
    )


_PCTL_BANDS_SQL = (
    f"{_S}, r AS (SELECT series_key, value, ts_ms - ts_ms % {HOUR} AS b, "
    "ROW_NUMBER() OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR} "
    "ORDER BY value, seq) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key, ts_ms - ts_ms % {HOUR}) AS n "
    "FROM series) "
    "SELECT series_key, b AS ts_ms, "
    "MIN(CASE WHEN rn = CAST(CEIL(n * 0.5) AS BIGINT) THEN value END) AS p50, "
    "MIN(CASE WHEN rn = CAST(CEIL(n * 0.9) AS BIGINT) THEN value END) AS p90, "
    "MIN(CASE WHEN rn = CAST(CEIL(n * 0.99) AS BIGINT) THEN value END) AS p99, "
    "COUNT(*) AS n FROM r GROUP BY series_key, b"
).replace("{HOUR}", str(3_600_000))


QUERIES: dict[str, QuerySpec] = {
    # S1/F1: bounded range scan — pushed to the parquet reader
    "ts_scan_range": QuerySpec(
        _engine(TimeSeriesConfig(from_time=T_LO, to_time=T_HI)),
        f"{_S} SELECT series_key, ts_ms, value FROM series "
        f"WHERE ts_ms BETWEEN {T_LO} AND {T_HI}",
    ),
    # F2: timestamp IN-list
    "ts_filter_by_ts": QuerySpec(
        _engine(TimeSeriesConfig(filter_by_ts=TS_IN_LIST)),
        f"{_S} SELECT series_key, ts_ms, value FROM series "
        f"WHERE ts_ms IN ({', '.join(map(str, TS_IN_LIST))})",
    ),
    # F3: value range
    "ts_filter_value": QuerySpec(
        _engine(TimeSeriesConfig(filter_by_min_value=100.0, filter_by_max_value=300.0)),
        f"{_S} SELECT series_key, ts_ms, value FROM series "
        "WHERE value BETWEEN 100.0 AND 300.0",
    ),
    # A15: latest-value dedup per (series, ts)
    "ts_latest_dedup": QuerySpec(
        _engine(TimeSeriesConfig(latest=True)),
        f"{_S} SELECT series_key, ts_ms, arg_max(value, seq) AS value "
        "FROM series GROUP BY series_key, ts_ms",
    ),
    # A16 (+S2): per-series sample cap, scan direction fwd/rev
    "ts_count_limit": QuerySpec(_count_limit_fn(False), _count_limit_sql(False)),
    "ts_count_limit_rev": QuerySpec(_count_limit_fn(True), _count_limit_sql(True)),
    # A3/A4/A6: exact built-ins straight through the engine
    "ts_agg_min": QuerySpec(
        _engine(TimeSeriesConfig(aggregation_type="min", bucket_size_msec=HOUR)),
        _bucket_sql("MIN(value)"),
    ),
    "ts_agg_max": QuerySpec(
        _engine(TimeSeriesConfig(aggregation_type="max", bucket_size_msec=HOUR)),
        _bucket_sql("MAX(value)"),
    ),
    "ts_agg_count": QuerySpec(
        _engine(TimeSeriesConfig(aggregation_type="count", bucket_size_msec=HOUR)),
        _bucket_sql("CAST(COUNT(value) AS DOUBLE)"),
    ),
    # A5: range = max-min (exact doubles)
    "ts_agg_ohlc": QuerySpec(_ohlc_fn, _OHLC_SQL),
    "ts_agg_range": QuerySpec(
        _engine(TimeSeriesConfig(aggregation_type="range", bucket_size_msec=HOUR)),
        _bucket_sql("MAX(value) - MIN(value)"),
    ),
    # A7/A8: first/last by timestamp (seq tiebreak)
    "ts_agg_first": QuerySpec(
        _engine(TimeSeriesConfig(aggregation_type="first", bucket_size_msec=HOUR)),
        _first_last_sql(desc=False),
    ),
    "ts_agg_last": QuerySpec(
        _engine(TimeSeriesConfig(aggregation_type="last", bucket_size_msec=HOUR)),
        _first_last_sql(desc=True),
    ),
    # A1/A2/A9-A12: decimal-exact accumulation on both engines
    "ts_agg_sum": QuerySpec(
        _decimal_agg(lambda: F.col("s")), _dec_sql("s")
    ),
    "ts_agg_avg": QuerySpec(
        _decimal_agg(lambda: F.col("s") / F.col("n")), _dec_sql("s/n")
    ),
    "ts_agg_varp": QuerySpec(
        _decimal_agg(lambda: (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")),
        _dec_sql(_VAR_P),
    ),
    "ts_agg_vars": QuerySpec(
        _decimal_agg(
            lambda: F.when(
                F.col("n") > 1,
                (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1),
            )
        ),
        _dec_sql(_VAR_S),
    ),
    "ts_agg_stdp": QuerySpec(
        _decimal_agg(
            lambda: F.sqrt(
                F.greatest((F.col("q") - F.col("s") * F.col("s") / F.col("n")) / F.col("n"), F.lit(0.0))
            )
        ),
        _dec_sql(f"SQRT(GREATEST({_VAR_P}, 0.0))"),
    ),
    "ts_agg_stds": QuerySpec(
        _decimal_agg(
            lambda: F.when(
                F.col("n") > 1,
                F.sqrt(
                    F.greatest(
                        (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1),
                        F.lit(0.0),
                    )
                ),
            )
        ),
        _dec_sql(f"CASE WHEN n > 1 THEN SQRT(GREATEST((q - s*s/n)/(n-1), 0.0)) END"),
    ),
    # A13: align shifts bucket boundaries by 30 min
    "ts_agg_align": QuerySpec(
        _decimal_agg(lambda: F.col("s"), offset=HOUR // 2),
        _dec_sql("s", offset=HOUR // 2),
    ),
    # A14: '~' mid / '+' end bucket labels
    "ts_bucket_mid": QuerySpec(
        _decimal_agg(lambda: F.col("s") / F.col("n"), label_shift=HOUR // 2),
        _dec_sql("s/n", label_shift=HOUR // 2),
    ),
    "ts_bucket_end": QuerySpec(
        _decimal_agg(lambda: F.col("s") / F.col("n"), label_shift=HOUR),
        _dec_sql("s/n", label_shift=HOUR),
    ),
    # A17: per-series run metadata
    "ts_meta": QuerySpec(
        _meta_fn,
        f"{_S} SELECT series_key, COUNT(*) AS data_points_analyzed, "
        "CAST(0 AS BIGINT) AS anomalies_found, MIN(ts_ms) AS start_ts_ms, "
        "MAX(ts_ms) AS end_ts_ms, MAX(ts_ms) - MIN(ts_ms) AS duration_ms "
        "FROM series GROUP BY series_key",
    ),
    # F4: min-points guard after a selective filter
    "ts_guard_min_points": QuerySpec(
        _guard_fn,
        f"{_S} SELECT series_key, COUNT(*) AS n FROM series "
        "WHERE value > 200.0 GROUP BY series_key HAVING COUNT(*) >= 30",
    ),
    # S5: array-payload (Redis-reply-shaped) ingestion round-trip
    "ts_zip_ingest": QuerySpec(
        _zip_ingest_fn,
        f"{_S} SELECT series_key, ts_ms, value FROM series",
    ),
    # extension: M4 visualization downsampling (VLDB 2014) — first/last/
    # min/max point per (series, pixel bucket), one hash aggregation
    "ts_downsample_m4": QuerySpec(
        _m4_fn,
        # tie-breaks mirror the engine exactly: (ts, seq) for first/last,
        # (value, ts) / (value DESC, ts) for min/max
        f"{_S}, pt AS (SELECT series_key, ts_ms - ts_ms % {6 * HOUR} AS b, "
        "ts_ms, value, seq FROM series), "
        "r AS (SELECT *, "
        "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY ts_ms, seq) AS rf, "
        "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY ts_ms DESC, seq DESC) AS rl, "
        "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY value, ts_ms) AS rmin, "
        "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY value DESC, ts_ms) AS rmax "
        "FROM pt) "
        "SELECT series_key, b AS bucket_ms, "
        "MIN(CASE WHEN rf = 1 THEN ts_ms END) AS ts_first, "
        "MIN(CASE WHEN rf = 1 THEN value END) AS v_first, "
        "MIN(CASE WHEN rl = 1 THEN ts_ms END) AS ts_last, "
        "MIN(CASE WHEN rl = 1 THEN value END) AS v_last, "
        "MIN(CASE WHEN rmin = 1 THEN ts_ms END) AS ts_min, "
        "MIN(CASE WHEN rmin = 1 THEN value END) AS v_min, "
        "MIN(CASE WHEN rmax = 1 THEN ts_ms END) AS ts_max, "
        "MIN(CASE WHEN rmax = 1 THEN value END) AS v_max "
        "FROM r GROUP BY series_key, b",
    ),
    # extension: LOCF time-weighted average per bucket (TimescaleDB
    # time_weight family) — decimal-exact weighted sums
    "ts_time_weighted_avg": QuerySpec(_twa_fn, _TWA_SQL),
    # extension: reset-aware counter increase/rate per bucket (PromQL
    # increase/rate family) — decimal-exact deltas
    "ts_counter_rate": QuerySpec(_counter_rate_fn, _COUNTER_RATE_SQL),
    "ts_resets": QuerySpec(_resets_fn, _RESETS_SQL),
    "ts_winsorize": QuerySpec(_winsorize_fn, _WINSORIZE_SQL),
    "ts_stl_decompose": QuerySpec(_stl_fn, _STL_SQL),
    # extension: fixed-anchor LTTB downsampling (parallel one-pass variant)
    "ts_downsample_lttb": QuerySpec(_lttb_fn, _LTTB_SQL),
    # extension: instantaneous rate (last reset-aware step per bucket)
    "ts_irate": QuerySpec(_irate_fn, _IRATE_SQL),
    # extension: cooldown debouncing (sequential keep-rule, recursive oracle)
    "ts_debounce": QuerySpec(_debounce_fn, _DEBOUNCE_SQL),
    # extension: equi-depth histogram (NTILE buckets; complements q_histogram)
    "ts_equidepth_histogram": QuerySpec(_equidepth_fn, _EQUIDEPTH_SQL),
    # extension: per-bucket least-squares trend slope (PromQL deriv)
    "ts_deriv_slope": QuerySpec(_deriv_fn, _DERIV_SLOPE_SQL),
    # extension: silence watchdog (gaps > threshold between points)
    "ts_gap_detect": QuerySpec(_gap_detect_fn, _GAP_DETECT_SQL),
    # extension: per-series availability summary from heartbeat gaps
    "ts_heartbeat_sla": QuerySpec(_heartbeat_sla_fn, _HEARTBEAT_SLA_SQL),
    # extension: dow×hour seasonality heatmap (integer calendar parts)
    "ts_calendar_profile": QuerySpec(_calendar_profile_fn, _CALENDAR_PROFILE_SQL),
    # r6: seasonal-baseline residual anomalies (normal-for-this-hour band)
    "ts_seasonal_anomaly": QuerySpec(_seasonal_anomaly_fn, _SEASONAL_ANOMALY_SQL),
    # extension: Hyndman seasonal strength over the STL decomposition
    "ts_seasonal_strength": QuerySpec(
        _seasonal_strength_fn, _SEASONAL_STRENGTH_SQL
    ),
    # extension: exact LOW-percentile monitoring bands per bucket
    "ts_percentile_bands": QuerySpec(_pctl_bands_fn, _PCTL_BANDS_SQL),
}


# extension: trailing-window interpolated quantile baselines


def _rolling_quantile_fn(spark, sf_dir):
    """Rolling p50/p95 baselines over the exact hourly-average series:
    trailing 24-bucket window, linear-interpolation percentile (both
    engines use lower + frac*(upper-lower) at rank p*(n-1)), rounded to
    9 decimals so association-order ulps cannot flip the hash."""
    from ..operators.rate import rolling_quantiles

    return rolling_quantiles(hourly_avg_frame(spark, sf_dir), window_rows=24)


_ROLLING_QUANTILE_SQL = (
    f"WITH series AS ({EVENTS_SQL}), g AS ({G_SQL}) "
    "SELECT series_key, ts_ms, value, "
    "round(quantile_cont(value, 0.5) OVER w, 9) AS q50, "
    "round(quantile_cont(value, 0.95) OVER w, 9) AS q95 "
    "FROM g WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms "
    "ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)"
)

QUERIES["ts_rolling_quantile"] = QuerySpec(_rolling_quantile_fn, _ROLLING_QUANTILE_SQL)


def _psi_drift_fn(spark, sf_dir):
    from ..operators.rate import psi_drift

    return psi_drift(events_frame(spark, sf_dir), n_buckets=10)


# PSI per series: first-vs-second time half, 10 equal-width value bins
# over the series' own range, Laplace-smoothed shares; per-bucket terms
# rounded+integer-scaled BEFORE summation (order-free bigint total —
# the unigram_logprob idiom).
_PSI_SQL = (
    f"WITH series AS ({EVENTS_SQL}), "
    "st AS (SELECT series_key, MIN(ts_ms) AS mnt, MAX(ts_ms) AS mxt, "
    "MIN(value) AS mnv, MAX(value) AS mxv FROM series GROUP BY 1), "
    "pts AS (SELECT s.series_key, "
    "CASE WHEN s.ts_ms <= (st.mnt + st.mxt) // 2 THEN 0 ELSE 1 END AS h, "
    "CASE WHEN st.mxv > st.mnv THEN "
    "CAST(LEAST(floor(((s.value - st.mnv) * 10.0) / (st.mxv - st.mnv)), 9.0) "
    "AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b "
    "FROM series s JOIN st USING (series_key)), "
    "c AS (SELECT series_key, b, "
    "SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS ca, "
    "SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS cb FROM pts GROUP BY 1, 2), "
    "tot AS (SELECT series_key, CAST(SUM(ca) AS BIGINT) AS na, "
    "CAST(SUM(cb) AS BIGINT) AS nb FROM c GROUP BY 1), "
    "spine AS (SELECT st.series_key, gs.b FROM st, "
    "(SELECT unnest(range(0, 10)) AS b) gs), "
    "f AS (SELECT sp.series_key, COALESCE(c.ca, 0) + 1 AS ca1, "
    "COALESCE(c.cb, 0) + 1 AS cb1, t.na, t.nb FROM spine sp "
    "LEFT JOIN c ON c.series_key = sp.series_key AND c.b = sp.b "
    "JOIN tot t ON t.series_key = sp.series_key), "
    "tm AS (SELECT series_key, na, nb, CAST(round("
    "(CAST(ca1 AS DOUBLE) / CAST(na + 10 AS DOUBLE) "
    "- CAST(cb1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)) "
    "* ln((CAST(ca1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)) "
    "/ (CAST(cb1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE))) "
    "* 1000000000.0) AS BIGINT) AS e9 FROM f) "
    "SELECT series_key, MAX(na) AS n_a, MAX(nb) AS n_b, "
    "CAST(SUM(e9) AS BIGINT) AS psi_e9, "
    "CAST(CAST(SUM(e9) AS BIGINT) AS DOUBLE) / 1000000000.0 AS psi "
    "FROM tm GROUP BY series_key"
)

QUERIES["ts_psi_drift"] = QuerySpec(_psi_drift_fn, _PSI_SQL)


def _value_entropy_fn(spark, sf_dir):
    from ..operators.rate import value_entropy

    return value_entropy(events_frame(spark, sf_dir), n_buckets=10)


# Shannon entropy over the PSI binning; non-empty bins only (0 ln 0 = 0),
# per-bin terms rounded+integer-scaled before the per-series sum.
_VALUE_ENTROPY_SQL = (
    f"WITH series AS ({EVENTS_SQL}), "
    "st AS (SELECT series_key, MIN(value) AS mnv, MAX(value) AS mxv "
    "FROM series GROUP BY 1), "
    "pts AS (SELECT s.series_key, CASE WHEN st.mxv > st.mnv THEN "
    "CAST(LEAST(floor(((s.value - st.mnv) * 10.0) / (st.mxv - st.mnv)), 9.0) "
    "AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b "
    "FROM series s JOIN st USING (series_key)), "
    "c AS (SELECT series_key, b, COUNT(*) AS c FROM pts GROUP BY 1, 2), "
    "tot AS (SELECT series_key, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1), "
    "tm AS (SELECT c.series_key, t.n, CAST(round("
    "(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) "
    "* ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) "
    "* 1000000000.0) AS BIGINT) AS e9 FROM c JOIN tot t USING (series_key)) "
    "SELECT series_key, MAX(n) AS n_points, "
    "CAST(-SUM(e9) AS BIGINT) AS entropy_e9, "
    "CAST(CAST(-SUM(e9) AS BIGINT) AS DOUBLE) / 1000000000.0 AS entropy "
    "FROM tm GROUP BY series_key"
)

QUERIES["ts_value_entropy"] = QuerySpec(_value_entropy_fn, _VALUE_ENTROPY_SQL)


def _theil_sen_fn(spark, sf_dir):
    """Theil–Sen robust trend slope per series, made scale-safe by a
    FIXED-WIDTH profile: each series is reduced to ≤64 equal-width time
    buckets (exact integer bucketing over its [min, max] span, decimal
    bucket means), and the estimator is the LOW median of the C(k,2) ≤
    2016 pairwise bucket slopes — so the quadratic lives on a bounded
    profile, never on raw points (raw pairwise slopes are Ω(n²/series),
    hopeless at 100 TB; the bucketed profile keeps the estimator's
    outlier-resistance while the cost stays linear scan + two hash
    aggs). Pair generation and median selection happen IN-ROW on the
    ≤64-element profile array (struct array_sort, rank (n+1)//2 with
    (slope, ia, ib) tiebreak), so there is no self-join and no window.
    Emits series with ≥2 non-empty buckets."""
    series = events_frame(spark, sf_dir)
    bounds = series.groupBy("series_key").agg(
        F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")
    )
    span = F.col("mx") - F.col("mn") + 1
    b = series.join(bounds, "series_key").select(
        "series_key",
        F.expr("((ts_ms - mn) * 64) div (mx - mn + 1)").alias("idx"),
        "value",
        span.alias("span"),
    )
    ba = b.groupBy("series_key", "idx").agg(
        F.first("span").alias("span"),
        (
            F.sum(dec("value")).cast("double")
            / F.count("*").cast("double")
        ).alias("avg"),
    )
    arr = ba.groupBy("series_key").agg(
        F.first("span").alias("span"),
        F.array_sort(F.collect_list(F.struct("idx", "avg"))).alias("p"),
    ).filter(F.size("p") >= 2)
    slopes = F.expr(
        "array_sort(flatten(transform(p, (a, i) -> "
        "transform(slice(p, i + 2, size(p)), b -> struct("
        "(b.avg - a.avg) / CAST(b.idx - a.idx AS DOUBLE) AS slope, "
        "a.idx AS ia, b.idx AS ib)))))"
    )
    med = F.element_at(F.col("s"), ((F.size("s") + 1) / 2).cast("int"))
    return (
        arr.select("series_key", F.size("p").cast("bigint").alias("n_buckets"),
                   "span", slopes.alias("s"))
        .select(
            "series_key",
            "n_buckets",
            med.getField("slope").alias("slope_per_bucket"),
            (
                med.getField("slope")
                / (F.col("span").cast("double") / F.lit(64.0))
            ).alias("slope_per_ms"),
        )
    )


_THEIL_SEN_SQL = (
    f"WITH series AS ({EVENTS_SQL}), "
    "bd AS (SELECT series_key, MIN(ts_ms) AS mn, MAX(ts_ms) AS mx "
    "FROM series GROUP BY 1), "
    "bk AS (SELECT s.series_key, ((s.ts_ms - bd.mn) * 64) // (bd.mx - bd.mn + 1) "
    "AS idx, s.value, bd.mx - bd.mn + 1 AS span "
    "FROM series s JOIN bd USING (series_key)), "
    "ba AS (SELECT series_key, idx, ANY_VALUE(span) AS span, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / "
    "CAST(COUNT(*) AS DOUBLE) AS avg FROM bk GROUP BY 1, 2), "
    "nb AS (SELECT series_key, CAST(COUNT(*) AS BIGINT) AS n_buckets "
    "FROM ba GROUP BY 1 HAVING COUNT(*) >= 2), "
    "sl AS (SELECT a.series_key, "
    "(b.avg - a.avg) / CAST(b.idx - a.idx AS DOUBLE) AS slope, "
    "a.idx AS ia, b.idx AS ib, a.span AS span FROM ba a "
    "JOIN ba b ON a.series_key = b.series_key AND a.idx < b.idx), "
    "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY series_key "
    "ORDER BY slope, ia, ib) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS np FROM sl) "
    "SELECT r.series_key, nb.n_buckets, r.slope AS slope_per_bucket, "
    "r.slope / (CAST(r.span AS DOUBLE) / 64.0) AS slope_per_ms "
    "FROM rk r JOIN nb USING (series_key) WHERE r.rn = (r.np + 1) // 2"
)

QUERIES["ts_theil_sen"] = QuerySpec(_theil_sen_fn, _THEIL_SEN_SQL)


def _backtest_fn(spark, sf_dir):
    """Walk-forward forecast backtest — the eval-family sibling of
    emb_ann_recall_eval: per series, score the seasonal-naive
    forecaster (v̂_t = v_{t−24h}) against the persistence baseline
    (v̂_t = v_{t−1}) on the SAME eval points (both lags defined), and
    report the skill ratio. Per-point |error| quantizes to integer
    1e-9 units BEFORE summation (the le9 idiom: double sums are
    order-dependent; integer sums are exact under any partitioning).
    One per-series window pass; no joins."""
    from pyspark.sql import Window as W

    g = hourly_avg_frame(spark, sf_dir)
    w = W.partitionBy("series_key").orderBy("ts_ms")
    lag1 = F.lag("value", 1).over(w)
    lag24 = F.lag("value", 24).over(w)
    e = (
        g.select("series_key", "value", lag1.alias("p1"), lag24.alias("p24"))
        .filter(F.col("p1").isNotNull() & F.col("p24").isNotNull())
        .select(
            "series_key",
            F.round(F.abs(F.col("value") - F.col("p24")) * 1e9)
            .cast("bigint")
            .alias("e24"),
            F.round(F.abs(F.col("value") - F.col("p1")) * 1e9)
            .cast("bigint")
            .alias("e1"),
        )
    )
    a = e.groupBy("series_key").agg(
        F.count("*").alias("n_evals"),
        F.sum("e24").cast("bigint").alias("s24"),
        F.sum("e1").cast("bigint").alias("s1"),
    )
    mae24 = F.col("s24").cast("double") / F.col("n_evals").cast("double") / F.lit(1e9)
    mae1 = F.col("s1").cast("double") / F.col("n_evals").cast("double") / F.lit(1e9)
    return a.select(
        "series_key",
        "n_evals",
        mae24.alias("mae_seasonal"),
        mae1.alias("mae_persistence"),
        (F.col("s24").cast("double") / F.col("s1").cast("double")).alias(
            "error_ratio"
        ),
    )


_BACKTEST_SQL = (
    f"WITH series AS ({EVENTS_SQL}), g AS ({G_SQL}), "
    "l AS (SELECT series_key, value, "
    "LAG(value, 1) OVER w AS p1, LAG(value, 24) OVER w AS p24 FROM g "
    "WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms)), "
    "e AS (SELECT series_key, "
    "CAST(round(ABS(value - p24) * 1e9) AS BIGINT) AS e24, "
    "CAST(round(ABS(value - p1) * 1e9) AS BIGINT) AS e1 "
    "FROM l WHERE p1 IS NOT NULL AND p24 IS NOT NULL), "
    "a AS (SELECT series_key, COUNT(*) AS n_evals, "
    "CAST(SUM(e24) AS BIGINT) AS s24, CAST(SUM(e1) AS BIGINT) AS s1 "
    "FROM e GROUP BY 1) "
    "SELECT series_key, n_evals, "
    "CAST(s24 AS DOUBLE) / CAST(n_evals AS DOUBLE) / 1e9 AS mae_seasonal, "
    "CAST(s1 AS DOUBLE) / CAST(n_evals AS DOUBLE) / 1e9 AS mae_persistence, "
    "CAST(s24 AS DOUBLE) / CAST(s1 AS DOUBLE) AS error_ratio FROM a"
)

QUERIES["ts_backtest_mae"] = QuerySpec(_backtest_fn, _BACKTEST_SQL)
