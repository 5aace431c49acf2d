"""Oracle-checked catalog: cross-series correlation (Luminol
Correlator surface). Exactness: series values are hourly SUMS of
integer-scaled (×100, floor+0.5) event values — bigint math end to
end; r derives from exact sums with the identical closed form on both
engines, so the doubles hash-match."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.correlate import cross_correlate
from .common import EVENTS_SQL, G_SQL, QuerySpec, events_frame, hourly_avg_frame

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


def _rolling_corr_fn(spark, sf_dir):
    """Rolling 24h correlation of two aligned hourly series (click vs
    view): exact bigint co-moment sums over a trailing rows-frame; the
    closed-form r is the only float math. One join on the bucket key +
    one window sort — no per-window rescan."""
    from pyspark.sql import Window as W

    h = _hourly_int_sums(spark, sf_dir)
    a = h.filter(F.col("series_key") == "click").select(
        "ts_ms", F.col("value").alias("va")
    )
    b = h.filter(F.col("series_key") == "view").select(
        "ts_ms", F.col("value").alias("vb")
    )
    j = a.join(b, "ts_ms")
    w = W.orderBy("ts_ms").rowsBetween(-23, 0)
    n = F.count("*").over(w)
    sx, sy = F.sum("va").over(w), F.sum("vb").over(w)
    sxy = F.sum(F.col("va") * F.col("vb")).over(w)
    sxx = F.sum(F.col("va") * F.col("va")).over(w)
    syy = F.sum(F.col("vb") * F.col("vb")).over(w)
    cov_n = (n * sxy - sx * sy).cast("double")
    den = F.sqrt(
        (n * sxx - sx * sx).cast("double") * (n * syy - sy * sy).cast("double")
    )
    staged = j.select(
        "ts_ms",
        n.alias("n_overlap"),
        cov_n.alias("cn"),
        den.alias("dn"),
    )
    return staged.select(
        "ts_ms",
        "n_overlap",
        F.when(
            (F.col("n_overlap") >= 2) & (F.col("dn") > 0),
            F.col("cn") / F.col("dn"),
        ).alias("r"),
    )


_ROLLING_CORR_SQL = (
    f"{_S}, {_HOURLY}, "
    "a AS (SELECT ts AS ts_ms, v AS va FROM h WHERE series_key = 'click'), "
    "b AS (SELECT ts AS ts_ms, v AS vb FROM h WHERE series_key = 'view'), "
    "j AS (SELECT a.ts_ms, va, vb FROM a JOIN b USING (ts_ms)), "
    "g AS (SELECT ts_ms, COUNT(*) OVER w AS n, SUM(va) OVER w AS sx, "
    "SUM(vb) OVER w AS sy, SUM(va*vb) OVER w AS sxy, SUM(va*va) OVER w AS sxx, "
    "SUM(vb*vb) OVER w AS syy FROM j "
    "WINDOW w AS (ORDER BY ts_ms ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) "
    "SELECT ts_ms, n AS n_overlap, "
    "CASE WHEN n >= 2 AND sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * "
    "CAST(n*syy - sy*sy AS DOUBLE)) > 0 "
    "THEN CAST(n*sxy - sx*sy AS DOUBLE) / "
    "sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)) "
    "END AS r FROM g"
)

QUERIES["ts_rolling_corr"] = QuerySpec(_rolling_corr_fn, _ROLLING_CORR_SQL)


def _autocorr_fn(spark, sf_dir):
    """Autocorrelation: the cross-correlator pointed at one series
    (click vs itself) over daily-scale lags — the standard seasonality
    probe (a peak at lag = 24h reveals daily periodicity)."""
    return cross_correlate(
        _hourly_int_sums(spark, sf_dir), "click", "click",
        [0, 6 * HOUR, 12 * HOUR, 24 * HOUR], exact=True,
    )


_AUTO_SHIFTS = [0, 6 * HOUR, 12 * HOUR, 24 * HOUR]
_AUTOCORR_SQL = (
    f"{_S}, {_HOURLY}, "
    "a AS (SELECT ts, v AS va FROM h WHERE series_key = 'click'), "
    "b AS (SELECT ts, v AS vb FROM h WHERE series_key = 'click'), "
    "sh AS (SELECT s AS shift_ms, b.ts - s AS ts, vb FROM b, "
    f"unnest([{', '.join(str(s) for s in _AUTO_SHIFTS)}]) AS u(s)), "
    "j AS (SELECT shift_ms, va, vb FROM a JOIN sh ON a.ts = sh.ts), "
    "g AS (SELECT shift_ms, COUNT(*) AS n_overlap, SUM(va) AS sx, SUM(vb) AS sy, "
    "SUM(va*vb) AS sxy, SUM(va*va) AS sxx, SUM(vb*vb) AS syy FROM j GROUP BY shift_ms) "
    "SELECT shift_ms, n_overlap, "
    "CAST(n_overlap*sxy - sx*sy AS DOUBLE) / "
    "sqrt(CAST(n_overlap*sxx - sx*sx AS DOUBLE) * CAST(n_overlap*syy - sy*sy AS DOUBLE)) AS r "
    "FROM g WHERE n_overlap >= 2"
)

QUERIES["ts_autocorrelate"] = QuerySpec(_autocorr_fn, _AUTOCORR_SQL)


def _goertzel_fn(spark, sf_dir):
    """Daily-seasonality energy: Goertzel at period 24 over the exact
    hourly averages."""
    from ..operators.correlate import goertzel_power
    from .common import hourly_avg_frame

    return goertzel_power(hourly_avg_frame(spark, sf_dir), 24)


# coeff = 2*cos(2*pi/24) as the identical repr'd double; the recursion
# carries (s1, s2) with the engine's exact op association.
# e0 suffix: DuckDB types bare high-precision literals as DECIMAL and
# its DECIMAL->DOUBLE conversion drifts 1 ulp; exponent notation is
# parsed directly as DOUBLE (bit-identical to the kernel constant)
_GOERTZEL_C = "1.9318516525781366e0"
_GOERTZEL_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), g AS ({G_SQL}), "
    "o AS (SELECT series_key, ts_ms, value, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM g), "
    "r AS (SELECT series_key, rn, n, value AS s1, CAST(0.0 AS DOUBLE) AS s2 "
    "FROM o WHERE rn = 1 "
    "UNION ALL "
    f"SELECT o.series_key, o.rn, o.n, (o.value + {_GOERTZEL_C}*r.s1) - r.s2, r.s1 "
    "FROM o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, n, "
    f"(s1*s1 + s2*s2) - {_GOERTZEL_C}*s1*s2 AS power FROM r WHERE rn = n"
)

QUERIES["ts_goertzel_power"] = QuerySpec(_goertzel_fn, _GOERTZEL_SQL)


# UCR-style subsequence pattern search (the "find windows shaped like
# THIS" query behind motif/shape retrieval — Rakthanmanon et al., KDD
# 2012 popularized the z-normalized form): score every trailing
# m-point window of every series against a fixed spike template by
# Pearson r, report the top-5 windows per series. Pearson IS the
# z-normalized match score, and its co-moments here are exact bigints:
# the only float math is one sqrt + one division per window.
_PM_M = 12
_PM_Q = [0, 1, 3, 6, 10, 8, 6, 4, 3, 2, 1, 0]  # asymmetric spike template
_PM_SQ = sum(_PM_Q)
_PM_SQQ = sum(q * q for q in _PM_Q)
_PM_K = 5


def _pattern_match_fn(spark, sf_dir):
    """Shape: one per-series window sort (the hourly relation is
    series×hours — already reduced), m−1 lags + two frame sums over
    the SAME window spec (one physical Window exec), a bounded ranked
    window for the per-series top-k. At 100 TB the hourly rollup is
    the only wide shuffle; the pattern never leaves codegen (its
    terms are literal coefficients)."""
    from pyspark.sql import Window as W

    m, Q = _PM_M, _PM_Q
    h = _hourly_int_sums(spark, sf_dir)
    wo = W.partitionBy("series_key").orderBy("ts_ms")
    wf = wo.rowsBetween(-(m - 1), 0)
    n = F.count("*").over(wf)
    sx = F.sum("value").over(wf)
    sxx = F.sum(F.col("value") * F.col("value")).over(wf)
    dot = None
    for j in range(m):
        term = F.lit(Q[j]) * F.lag("value", m - 1 - j).over(wo)
        dot = term if dot is None else dot + term
    num = (F.lit(m) * dot - sx * F.lit(_PM_SQ)).cast("double")
    var_x = (F.lit(m) * sxx - sx * sx).cast("double")
    den = F.sqrt(var_x * F.lit(float(m * _PM_SQQ - _PM_SQ * _PM_SQ)))
    scored = (
        h.select(
            "series_key",
            "ts_ms",
            n.alias("__n"),
            num.alias("__num"),
            den.alias("__den"),
        )
        .filter((F.col("__n") == m) & (F.col("__den") > 0))
        .select(
            "series_key", "ts_ms", (F.col("__num") / F.col("__den")).alias("r")
        )
    )
    wr = W.partitionBy("series_key").orderBy(F.col("r").desc(), F.col("ts_ms"))
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= _PM_K)
        .select("series_key", "ts_ms", "r", "rank")
    )


_PM_DOT = " + ".join(
    f"{_PM_Q[j]} * lag(v, {_PM_M - 1 - j}) OVER wo" for j in range(_PM_M)
)
_PATTERN_MATCH_SQL = (
    f"{_S}, {_HOURLY}, "
    "g AS (SELECT series_key, ts AS ts_ms, "
    "COUNT(*) OVER wf AS n, SUM(v) OVER wf AS sx, SUM(v*v) OVER wf AS sxx, "
    f"({_PM_DOT}) AS dot FROM h "
    "WINDOW wo AS (PARTITION BY series_key ORDER BY ts), "
    f"wf AS (PARTITION BY series_key ORDER BY ts ROWS BETWEEN {_PM_M - 1} PRECEDING AND CURRENT ROW)), "
    "scored AS (SELECT series_key, ts_ms, "
    f"CAST({_PM_M}*dot - sx*{_PM_SQ} AS DOUBLE) / "
    f"sqrt(CAST({_PM_M}*sxx - sx*sx AS DOUBLE) * {float(_PM_M * _PM_SQQ - _PM_SQ * _PM_SQ)!r}) AS r "
    f"FROM g WHERE n = {_PM_M} AND "
    f"sqrt(CAST({_PM_M}*sxx - sx*sx AS DOUBLE) * {float(_PM_M * _PM_SQQ - _PM_SQ * _PM_SQ)!r}) > 0), "
    "ranked AS (SELECT series_key, ts_ms, r, CAST(ROW_NUMBER() OVER ("
    "PARTITION BY series_key ORDER BY r DESC, ts_ms) AS BIGINT) AS rank FROM scored) "
    f"SELECT series_key, ts_ms, r, rank FROM ranked WHERE rank <= {_PM_K}"
)

QUERIES["ts_pattern_match"] = QuerySpec(_pattern_match_fn, _PATTERN_MATCH_SQL)
