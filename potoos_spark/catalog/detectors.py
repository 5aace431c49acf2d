"""Oracle-checked catalog: the detector suite (SURVEY.md §2.4 D1-D10)
over the exact hourly-average series.

Cross-engine exactness: detector inputs are the decimal-exact hourly
averages; EMA detectors use the explicit recurrence (numpy loop ↔
recursive CTE — identical float64 op order); normalization uses the
range (max-min: no accumulation) instead of the stddev so every score
is bit-identical on both engines. The engine's default 'std'
normalizer stays Luminol-faithful; 'range' is the oracle-exact mode.
``bitmap_detector`` (D3) is window-function SQL end-to-end: equal-width
SAX symbols, base-p chunk words, per-word lag/future frame counts, and
a left-associative normalized-bitmap distance (same op order as the
kernel) — bit-exact like the rest.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..config import DetectorConfig
from ..detectors.base import score as detect_score
from ..detectors.windows import extract_anomalies
from .common import EVENTS_SQL, G_SQL, QuerySpec, hourly_avg_frame

ALPHA = 0.2
BETA = repr(1.0 - ALPHA)  # repr roundtrips the exact double
DAY_MS = 86_400_000

_BASE = f"WITH RECURSIVE series AS ({EVENTS_SQL}), g AS ({G_SQL})"

# --- shared SQL fragments -------------------------------------------------

# EMA over a (series_key, ts_ms, value) relation named {rel}, column {col}.
def _ema_cte(rel: str, col: str, out: str) -> str:
    return (
        f"o_{out} AS (SELECT series_key, ts_ms, {col} AS v, ROW_NUMBER() OVER "
        f"(PARTITION BY series_key ORDER BY ts_ms) AS rn FROM {rel}), "
        f"{out} AS ("
        f"SELECT series_key, ts_ms, v, rn, v AS ema FROM o_{out} WHERE rn = 1 "
        "UNION ALL "
        f"SELECT o.series_key, o.ts_ms, o.v, o.rn, {ALPHA}*o.v + {BETA}*e.ema "
        f"FROM o_{out} o JOIN {out} e ON o.series_key = e.series_key AND o.rn = e.rn + 1)"
    )


_RANGE = "SELECT series_key, MAX(v) - MIN(v) AS r FROM {src} GROUP BY series_key"

_EXP_AVG_SQL = (
    f"{_BASE}, {_ema_cte('g', 'value', 'e')}, "
    f"rng AS ({_RANGE.format(src='o_e')}) "
    "SELECT e.series_key, e.ts_ms, e.v AS value, "
    "CASE WHEN rng.r > 0 THEN ABS(e.v - e.ema)/rng.r ELSE 0.0 END AS score "
    "FROM e JOIN rng USING (series_key)"
)

# derivative: d_i = |Δv| / (Δt/1000), d_1 copied from d_2, then EMA + range.
_DERIV_REL = (
    "dd AS (SELECT series_key, ts_ms, value, "
    "ABS(value - LAG(value) OVER w) / "
    "(CASE WHEN (ts_ms - LAG(ts_ms) OVER w) = 0 THEN 1000 "
    "ELSE ts_ms - LAG(ts_ms) OVER w END / 1000.0) AS d_raw "
    "FROM g WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms)), "
    "d AS (SELECT series_key, ts_ms, value, "
    "COALESCE(d_raw, LEAD(d_raw) OVER (PARTITION BY series_key ORDER BY ts_ms)) AS d "
    "FROM dd)"
)

_DERIV_SQL = (
    f"{_BASE}, {_DERIV_REL}, {_ema_cte('d', 'd', 'e')}, "
    f"rng AS ({_RANGE.format(src='o_e')}), "
    "v AS (SELECT series_key, ts_ms, value FROM d) "
    "SELECT e.series_key, e.ts_ms, v.value, "
    "CASE WHEN rng.r > 0 THEN ABS(e.v - e.ema)/rng.r ELSE 0.0 END AS score "
    "FROM e JOIN rng USING (series_key) "
    "JOIN v ON v.series_key = e.series_key AND v.ts_ms = e.ts_ms"
)

_ABS_SCORE = (
    "CASE WHEN value > 250.0 THEN value - 250.0 "
    "WHEN value < 5.0 THEN 5.0 - value ELSE 0.0 END"
)

_ABS_SQL = (
    f"{_BASE} SELECT series_key, ts_ms, value, {_ABS_SCORE} AS score FROM g"
)

# D10 gaps-and-islands over absolute-threshold scores (threshold 2.0);
# peak = earliest ts among max-score rows (mirrors max_by(ts, (score,-ts))).
_WINDOWS_SQL = (
    f"{_BASE}, sc AS (SELECT series_key, ts_ms, {_ABS_SCORE} AS score FROM g), "
    "fl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) AS rn FROM sc), "
    "ab AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) AS isl "
    "FROM fl WHERE score >= 2.0), "
    "agg AS (SELECT series_key, isl, MIN(ts_ms) AS start_ts_ms, MAX(ts_ms) AS end_ts_ms, "
    "MAX(score) AS anomaly_score FROM ab GROUP BY series_key, isl) "
    "SELECT a.series_key, a.start_ts_ms, a.end_ts_ms, "
    "MIN(b.ts_ms) AS exact_ts_ms, a.anomaly_score "
    "FROM agg a JOIN ab b ON b.series_key = a.series_key AND b.isl = a.isl "
    "AND b.score = a.anomaly_score "
    "GROUP BY a.series_key, a.start_ts_ms, a.end_ts_ms, a.anomaly_score"
)

# D9 refine: absolute-threshold windows (as in _WINDOWS_SQL), then a
# second absolute-threshold pass (200/10) re-scores only the points
# inside each window; extent is kept, peak recomputed from refined
# scores (earliest among max — mirrors max_by(ts, (score, -ts))).
_REFINE_SCORE = (
    "CASE WHEN value > 200.0 THEN value - 200.0 "
    "WHEN value < 10.0 THEN 10.0 - value ELSE 0.0 END"
)

_REFINE_SQL = (
    f"{_BASE}, sc AS (SELECT series_key, ts_ms, {_ABS_SCORE} AS score FROM g), "
    "fl AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) AS rn FROM sc), "
    "ab AS (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) AS isl "
    "FROM fl WHERE score >= 2.0), "
    "agg AS (SELECT series_key, isl, MIN(ts_ms) AS start_ts_ms, MAX(ts_ms) AS end_ts_ms "
    "FROM ab GROUP BY series_key, isl), "
    f"rsc AS (SELECT series_key, ts_ms, {_REFINE_SCORE} AS score FROM g), "
    "rj AS (SELECT a.series_key, a.start_ts_ms, a.end_ts_ms, r.ts_ms, r.score "
    "FROM agg a JOIN rsc r ON r.series_key = a.series_key "
    "AND r.ts_ms BETWEEN a.start_ts_ms AND a.end_ts_ms), "
    "pk AS (SELECT series_key, start_ts_ms, end_ts_ms, MAX(score) AS anomaly_score "
    "FROM rj GROUP BY series_key, start_ts_ms, end_ts_ms) "
    "SELECT p.series_key, p.start_ts_ms, p.end_ts_ms, MIN(r.ts_ms) AS exact_ts_ms, "
    "p.anomaly_score FROM pk p JOIN rj r ON r.series_key = p.series_key "
    "AND r.start_ts_ms = p.start_ts_ms AND r.end_ts_ms = p.end_ts_ms "
    "AND r.score = p.anomaly_score "
    "GROUP BY p.series_key, p.start_ts_ms, p.end_ts_ms, p.anomaly_score"
)

# D6: baseline = the same series shifted forward one day (yesterday's
# value, as-of matched); score = percent-diff exceedance over 20%.
_DIFF_PCT_SQL = (
    f"{_BASE}, base AS (SELECT series_key, ts_ms + {DAY_MS} AS ts_ms, value AS base_value FROM g), "
    "j AS (SELECT s.series_key, s.ts_ms, s.value, b.base_value "
    "FROM g s ASOF LEFT JOIN base b ON s.series_key = b.series_key AND s.ts_ms >= b.ts_ms) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN base_value IS NOT NULL AND base_value <> 0 "
    "AND (value - base_value)/ABS(base_value)*100.0 > 20.0 "
    "THEN (value - base_value)/ABS(base_value)*100.0 - 20.0 ELSE 0.0 END AS score "
    "FROM j"
)

# D7: trailing-10 sign test vs the day-shifted baseline.
_SIGN_SQL = (
    f"{_BASE}, base AS (SELECT series_key, ts_ms + {DAY_MS} AS ts_ms, value AS base_value FROM g), "
    "j AS (SELECT s.series_key, s.ts_ms, s.value, b.base_value "
    "FROM g s ASOF LEFT JOIN base b ON s.series_key = b.series_key AND s.ts_ms >= b.ts_ms), "
    "k AS (SELECT series_key, ts_ms, value, "
    "CASE WHEN base_value IS NOT NULL AND value > base_value * 1.0 THEN 1 ELSE 0 END AS sgn FROM j), "
    "r AS (SELECT series_key, ts_ms, value, "
    "CAST(SUM(sgn) OVER w AS DOUBLE) AS s, CAST(COUNT(*) OVER w AS DOUBLE) AS n FROM k "
    "WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN n >= 10.0 THEN GREATEST((s - n/2.0)/SQRT(n/4.0), 0.0) ELSE 0.0 END AS score FROM r"
)


# --- Spark sides ----------------------------------------------------------

def _scored(algorithm: str, params: dict, with_baseline: bool = False):
    def fn(spark, sf_dir):
        g = hourly_avg_frame(spark, sf_dir)
        baseline = None
        if with_baseline:
            baseline = g.select(
                "series_key", (F.col("ts_ms") + DAY_MS).alias("ts_ms"), "value"
            )
        cfg = DetectorConfig(algorithm_name=algorithm, algorithm_params=params)
        return detect_score(g, cfg, baseline=baseline)

    return fn


def _calibrated_fn(spark, sf_dir):
    """Percentile-rank score calibration: raw detector scores live on
    arbitrary, detector-specific scales (an EMA deviation and a MAD
    z-ish score are not comparable), so ensembles and cross-series
    alerting first map each series' scores to their within-series
    percentile rank — uniform on [0, 1] by construction, making 'top
    1% most anomalous' mean the same thing for every series and every
    detector. percent_rank = (rank − 1)/(n − 1) is pure integer
    arithmetic over a total order ((score, ts) — bucket ts is unique
    per series), so the calibrated scores are bit-exact. One window
    sort per series on top of the detector's own shuffles."""
    from pyspark.sql import Window as W

    g = hourly_avg_frame(spark, sf_dir)
    cfg = DetectorConfig(algorithm_name="mad", algorithm_params={})
    scored = detect_score(g, cfg)
    w = W.partitionBy("series_key").orderBy("score", "ts_ms")
    return scored.select(
        "series_key",
        "ts_ms",
        "score",
        F.percent_rank().over(w).alias("calibrated"),
    )


def _windows_fn(spark, sf_dir):
    g = hourly_avg_frame(spark, sf_dir)
    scores = detect_score(
        g,
        DetectorConfig(
            algorithm_name="absolute_threshold",
            algorithm_params={
                "absolute_threshold_value_upper": 250.0,
                "absolute_threshold_value_lower": 5.0,
            },
        ),
    )
    return extract_anomalies(scores, score_threshold=2.0)


def _refine_fn(spark, sf_dir):
    from ..detectors.windows import refine_anomalies

    g = hourly_avg_frame(spark, sf_dir)
    scores = detect_score(
        g,
        DetectorConfig(
            algorithm_name="absolute_threshold",
            algorithm_params={
                "absolute_threshold_value_upper": 250.0,
                "absolute_threshold_value_lower": 5.0,
            },
        ),
    )
    anomalies = extract_anomalies(scores, score_threshold=2.0)
    return refine_anomalies(
        g,
        anomalies,
        "absolute_threshold",
        {
            "absolute_threshold_value_upper": 200.0,
            "absolute_threshold_value_lower": 10.0,
        },
    )


def _ensemble_fn(spark, sf_dir):
    g = hourly_avg_frame(spark, sf_dir)
    return detect_score(
        g,
        DetectorConfig(
            algorithm_name="default_detector",
            algorithm_params={"normalizer": "range"},
        ),
    )


_ENSEMBLE_SQL = (
    f"{_BASE}, {_ema_cte('g', 'value', 'e1')}, rng1 AS ({_RANGE.format(src='o_e1')}), "
    f"s1 AS (SELECT e1.series_key, e1.ts_ms, e1.v AS value, "
    "CASE WHEN rng1.r > 0 THEN ABS(e1.v - e1.ema)/rng1.r ELSE 0.0 END AS score "
    "FROM e1 JOIN rng1 USING (series_key)), "
    f"{_DERIV_REL}, {_ema_cte('d', 'd', 'e2')}, rng2 AS ({_RANGE.format(src='o_e2')}), "
    "s2 AS (SELECT e2.series_key, e2.ts_ms, "
    "CASE WHEN rng2.r > 0 THEN ABS(e2.v - e2.ema)/rng2.r ELSE 0.0 END AS score "
    "FROM e2 JOIN rng2 USING (series_key)) "
    "SELECT s1.series_key, s1.ts_ms, s1.value, (s1.score + s2.score)/2.0 AS score "
    "FROM s1 JOIN s2 ON s1.series_key = s2.series_key AND s1.ts_ms = s2.ts_ms"
)


# D8: plugin registry exercised through the catalog — a user-registered
# closed-form scorer (percent-of-series-max) dispatched by name exactly
# like a built-in, and simple enough to hold to the SQL oracle standard.
from ..detectors.base import is_registered, register_detector

if not is_registered("percent_of_max"):

    @register_detector("percent_of_max")
    def _percent_of_max(df, **_params):
        from pyspark.sql import Window as W

        mx = F.max("value").over(W.partitionBy("series_key"))
        score = F.when(mx > 0, F.col("value") / mx).otherwise(F.lit(0.0))
        return df.select("series_key", "ts_ms", "value", score.alias("score"))


_PLUGIN_SQL = (
    f"{_BASE}, mx AS (SELECT series_key, MAX(value) AS m FROM g GROUP BY series_key) "
    "SELECT g.series_key, g.ts_ms, g.value, "
    "CASE WHEN mx.m > 0 THEN g.value / mx.m ELSE 0.0 END AS score "
    "FROM g JOIN mx USING (series_key)"
)


def _plugin_fn(spark, sf_dir):
    g = hourly_avg_frame(spark, sf_dir)
    return detect_score(g, DetectorConfig(algorithm_name="percent_of_max"))


# D3 bitmap oracle: the SAX-bitmap pipeline is window-function SQL.
# Equal-width bins over the per-series range → base-p word of each
# chunk_size-symbol chunk → per-word counts in the 24-row lagging /
# future frames → squared distance of the normalized bitmaps summed
# LEFT-ASSOCIATIVELY in word order (mirrors the kernel's loop; see
# sequential.py bitmap_detector). Scores outside full-window reach, or
# for flat/short series, are 0 — same guards as the kernel.
_BM_P, _BM_CS, _BM_W = 4, 2, 24  # precision, chunk_size, lag/future window


def _bitmap_sql() -> str:
    p, cs, w = _BM_P, _BM_CS, _BM_W
    n_words = p ** cs
    lag_f = f"ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING"
    fut_f = f"ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING"
    cnts = ", ".join(
        f"SUM(CASE WHEN word = {k} THEN 1 ELSE 0 END) OVER (wl {lag_f}) AS l{k}, "
        f"SUM(CASE WHEN word = {k} THEN 1 ELSE 0 END) OVER (wl {fut_f}) AS f{k}"
        for k in range(n_words)
    )
    dist = " + ".join(
        f"(l{k}/CAST(ls AS DOUBLE) - f{k}/CAST(fs AS DOUBLE))"
        f"*(l{k}/CAST(ls AS DOUBLE) - f{k}/CAST(fs AS DOUBLE))"
        for k in range(n_words)
    )
    return (
        f"{_BASE}, "
        "st AS (SELECT *, MIN(value) OVER ws AS lo, MAX(value) OVER ws AS hi, "
        "COUNT(*) OVER ws AS n, "
        "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) - 1 AS i "
        "FROM g WINDOW ws AS (PARTITION BY series_key)), "
        # sym = least(floor((v-lo)/(hi-lo)*p), p-1); word = base-p chunk code
        "sy AS (SELECT *, CASE WHEN hi > lo THEN "
        f"LEAST(CAST(FLOOR((value - lo)/(hi - lo)*{p}) AS BIGINT), {p - 1}) "
        "END AS sym FROM st), "
        "wd AS (SELECT *, CASE WHEN i >= " + str(cs - 1) + " THEN "
        + " + ".join(
            f"LAG(sym, {cs - 1 - j}) OVER (PARTITION BY series_key ORDER BY ts_ms)"
            f" * {p ** (cs - 1 - j)}"
            for j in range(cs)
        ).replace(f"LAG(sym, 0) OVER (PARTITION BY series_key ORDER BY ts_ms) * 1", "sym")
        + " END AS word FROM sy), "
        f"ct AS (SELECT *, {cnts}, "
        f"SUM(CASE WHEN word IS NOT NULL THEN 1 ELSE 0 END) OVER (wl {lag_f}) AS ls, "
        f"SUM(CASE WHEN word IS NOT NULL THEN 1 ELSE 0 END) OVER (wl {fut_f}) AS fs "
        "FROM wd WINDOW wl AS (PARTITION BY series_key ORDER BY ts_ms)) "
        "SELECT series_key, ts_ms, value, "
        f"CASE WHEN n >= {2 * w} AND hi > lo AND i >= {w} AND i < n - {w} "
        f"AND ls > 0 AND fs > 0 THEN {dist} ELSE 0.0 END AS score "
        "FROM ct"
    )


_BITMAP_SQL = _bitmap_sql()


def _bitmap_fn(spark, sf_dir):
    g = hourly_avg_frame(spark, sf_dir)
    return detect_score(
        g,
        DetectorConfig(
            algorithm_name="bitmap_detector",
            algorithm_params={"lag_window_size": 24, "future_window_size": 24},
        ),
    )


# Extension: robust MAD detector. LOW median (rank ceil(n/2), ordered
# by (value, ts_ms)) on both engines — no interpolation, so scores are
# bit-exact. Score op order mirrors detectors/builtin.py::mad_detector:
# dev / (scale * mad).
_MAD_SQL = (
    f"{_BASE}, "
    "r1 AS (SELECT series_key, ts_ms, value, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY value, ts_ms) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM g), "
    "med AS (SELECT series_key, MIN(value) AS med FROM r1 "
    "WHERE rn = (n + 1) // 2 GROUP BY series_key), "
    "dv AS (SELECT g.series_key, g.ts_ms, g.value, "
    "ABS(g.value - med.med) AS dev FROM g JOIN med USING (series_key)), "
    "r2 AS (SELECT series_key, ts_ms, dev, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY dev, ts_ms) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM dv), "
    "mad AS (SELECT series_key, MIN(dev) AS mad FROM r2 "
    "WHERE rn = (n + 1) // 2 GROUP BY series_key) "
    "SELECT dv.series_key, dv.ts_ms, dv.value, "
    "CASE WHEN CAST(1.4826 AS DOUBLE) * mad.mad > 0 "
    "THEN dv.dev / (CAST(1.4826 AS DOUBLE) * mad.mad) ELSE 0.0 END AS score "
    "FROM dv JOIN mad USING (series_key)"
)

def _incidents_fn(spark, sf_dir):
    from ..detectors.windows import merge_incidents

    return merge_incidents(_windows_fn(spark, sf_dir))


# Global incident merge over the per-series windows: sweep as window
# functions (running max end → break flag → running incident id) over
# the alert-volume relation. DuckDB accepts the full windows query as
# a subquery.
_INCIDENTS_SQL = (
    "SELECT incident_start_ms, incident_end_ms, n_windows, n_series, peak_score "
    "FROM (SELECT inc, MIN(start_ts_ms) AS incident_start_ms, "
    "MAX(end_ts_ms) AS incident_end_ms, COUNT(*) AS n_windows, "
    "COUNT(DISTINCT series_key) AS n_series, MAX(anomaly_score) AS peak_score "
    "FROM (SELECT *, SUM(brk) OVER "
    "(ORDER BY start_ts_ms, end_ts_ms, series_key) AS inc "
    "FROM (SELECT *, CASE WHEN pme IS NULL OR start_ts_ms > pme THEN 1 ELSE 0 END AS brk "
    "FROM (SELECT *, MAX(end_ts_ms) OVER "
    "(ORDER BY start_ts_ms, end_ts_ms, series_key "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme "
    f"FROM ({_WINDOWS_SQL}) win) a) b) c GROUP BY inc) d"
)


# Percentile-rank calibration over the MAD scores: percent_rank is
# (rank-1)/(n-1) integer arithmetic over the total (score, ts) order —
# bit-exact. DuckDB accepts the full WITH query as a subquery.
_CALIBRATED_SQL = (
    "SELECT series_key, ts_ms, score, "
    "PERCENT_RANK() OVER (PARTITION BY series_key ORDER BY score, ts_ms) "
    f"AS calibrated FROM ({_MAD_SQL}) scored"
)




# Extension: seasonal-naive scorer — forecast = value one season (24
# hourly buckets) earlier; score = |value - base| / per-series range.
# Pure lag/max/min windows: no accumulation, bit-exact.
_SEASONAL_SQL = (
    f"{_BASE}, w1 AS (SELECT series_key, ts_ms, value, "
    "LAG(value, 24) OVER (PARTITION BY series_key ORDER BY ts_ms) AS base, "
    "MAX(value) OVER (PARTITION BY series_key) - "
    "MIN(value) OVER (PARTITION BY series_key) AS r FROM g) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN base IS NOT NULL AND r > 0 THEN ABS(value - base)/r "
    "ELSE 0.0 END AS score FROM w1"
)


# Extension: Hampel filter — rolling (5 preceding..5 following) LOW
# median + LOW MAD, both read in-row from the sorted window list (no
# interpolation, no accumulation → bit-exact). Mirrors
# detectors/builtin.py::hampel op order: dev / (scale * mad).
_HAMPEL_SQL = (
    f"{_BASE}, l AS (SELECT series_key, ts_ms, value, "
    "list_sort(list(value) OVER (PARTITION BY series_key ORDER BY ts_ms "
    "ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)) AS lst FROM g), "
    "m AS (SELECT *, lst[CAST((len(lst) + 1) // 2 AS INT)] AS med FROM l), "
    "d AS (SELECT *, list_sort(list_transform(lst, x -> ABS(x - med))) AS dl FROM m) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN CAST(1.4826 AS DOUBLE) * dl[CAST((len(dl) + 1) // 2 AS INT)] > 0 "
    "THEN ABS(value - med) / (CAST(1.4826 AS DOUBLE) * dl[CAST((len(dl) + 1) // 2 AS INT)]) "
    "ELSE 0.0 END AS score FROM d"
)




# Extension: two-sided CUSUM — the recurrence as a recursive CTE. mu =
# LOW median (rank (n+1)//2 by (value, ts)), k = 0.05 * range: exact
# inputs, so GREATEST(s + dev, 0.0) replays the kernel's
# max(s + dev, 0.0) float64 trajectory bit-for-bit (same association:
# dev = (value - mu) - k on both sides).
_CUSUM_SQL = (
    f"{_BASE}, "
    "st AS (SELECT series_key, ts_ms, value, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY value, ts_ms) AS vr, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n, "
    "MAX(value) OVER (PARTITION BY series_key) - "
    "MIN(value) OVER (PARTITION BY series_key) AS rng FROM g), "
    "med AS (SELECT series_key, MIN(value) AS mu FROM st "
    "WHERE vr = (n + 1) // 2 GROUP BY series_key), "
    "d AS (SELECT st.series_key, st.ts_ms, st.value, st.rn, st.rng, "
    "(st.value - med.mu) - 0.05 * st.rng AS dp, "
    "(med.mu - st.value) - 0.05 * st.rng AS dn "
    "FROM st JOIN med USING (series_key)), "
    "r AS (SELECT series_key, ts_ms, value, rn, rng, "
    "GREATEST(0.0 + dp, 0.0) AS sp, GREATEST(0.0 + dn, 0.0) AS sn "
    "FROM d WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, o.rng, "
    "GREATEST(r.sp + o.dp, 0.0), GREATEST(r.sn + o.dn, 0.0) "
    "FROM d o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN rng > 0 THEN GREATEST(sp, sn) / rng ELSE 0.0 END AS score "
    "FROM r"
)


# Extension: two-sided Page-Hinkley — the recurrence as a recursive
# CTE carrying (running sum s, up, dn). The center is the RUNNING mean
# s/rn (recomputed per row, same division op order as the kernel);
# delta = 0.02 * range. GREATEST(acc + ((v - mean) - delta), 0.0)
# replays the kernel's max(...) float64 trajectory bit-for-bit.
_PH_SQL = (
    f"{_BASE}, "
    "st AS (SELECT series_key, ts_ms, value, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms) AS rn, "
    "MAX(value) OVER (PARTITION BY series_key) - "
    "MIN(value) OVER (PARTITION BY series_key) AS rng FROM g), "
    "r AS (SELECT series_key, ts_ms, value, rn, rng, value AS s, "
    "GREATEST((value - value) - 0.02 * rng, 0.0) AS up, "
    "GREATEST((value - value) - 0.02 * rng, 0.0) AS dn "
    "FROM st WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, o.rng, "
    "r.s + o.value, "
    "GREATEST(r.up + ((o.value - (r.s + o.value) / o.rn) - 0.02 * o.rng), 0.0), "
    "GREATEST(r.dn + (((r.s + o.value) / o.rn - o.value) - 0.02 * o.rng), 0.0) "
    "FROM st o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN rng > 0 THEN GREATEST(up, dn) / rng ELSE 0.0 END AS score "
    "FROM r"
)




# Extension: Holt double-exponential (level+trend) forecast scorer —
# the coupled recurrence as a recursive CTE carrying (level, trend).
# Literals 0.8/0.9 equal the kernel's computed 1-a/1-b exactly
# (1.0-0.2 == 0.8 and 1.0-0.1 == 0.9 in float64); op order mirrors
# sequential.py::_holt_kernel (pred = level + trend; numerator stored,
# one division by the range at the end).
_HOLT_SQL = (
    f"{_BASE}, "
    "nrm AS (SELECT series_key, MAX(value) - MIN(value) AS rng FROM g "
    "GROUP BY series_key), "
    "o AS (SELECT series_key, ts_ms, value, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms) AS rn FROM g), "
    "r AS (SELECT series_key, ts_ms, value, rn, value AS level, "
    "CAST(0.0 AS DOUBLE) AS trend, CAST(0.0 AS DOUBLE) AS sraw "
    "FROM o WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, "
    "0.2*o.value + 0.8*(r.level + r.trend), "
    "0.1*((0.2*o.value + 0.8*(r.level + r.trend)) - r.level) + 0.9*r.trend, "
    "ABS(o.value - (r.level + r.trend)) "
    "FROM o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT r.series_key, r.ts_ms, r.value, "
    "CASE WHEN nrm.rng > 0 THEN r.sraw / nrm.rng ELSE 0.0 END AS score "
    "FROM r JOIN nrm USING (series_key)"
)




def _stl_residual_fn(spark, sf_dir):
    """Seasonality-aware scoring: run the detector on the STL residual
    instead of the raw series — the daily cycle and slow trend are
    explained away, so only genuine surprises score. Normalizer is the
    per-series residual RANGE (max-min: no accumulation, exact)."""
    from ..catalog.common import events_frame
    from ..operators.rate import stl_decompose

    d = stl_decompose(events_frame(spark, sf_dir))
    from pyspark.sql import Window as W

    wp = W.partitionBy("series_key")
    rng = F.max("residual").over(wp) - F.min("residual").over(wp)
    return d.select(
        "series_key",
        "ts_ms",
        "value",
        F.when(rng > 0, F.abs(F.col("residual")) / rng)
        .otherwise(F.lit(0.0))
        .alias("score"),
    )


from .timeseries import _STL_SQL as _STL_INNER_SQL  # noqa: E402

_STL_RESIDUAL_SQL = (
    f"WITH stl AS ({_STL_INNER_SQL}) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN MAX(residual) OVER p - MIN(residual) OVER p > 0 THEN "
    "ABS(residual) / (MAX(residual) OVER p - MIN(residual) OVER p) "
    "ELSE 0.0 END AS score FROM stl "
    "WINDOW p AS (PARTITION BY series_key)"
)


def _windows_pct_fn(spark, sf_dir):
    """D10 in score_percent_threshold mode (config.py:85): the island
    threshold is 0.5 x the per-series max score."""
    g = hourly_avg_frame(spark, sf_dir)
    scores = detect_score(
        g,
        DetectorConfig(
            algorithm_name="absolute_threshold",
            algorithm_params={
                "absolute_threshold_value_upper": 250.0,
                "absolute_threshold_value_lower": 5.0,
            },
        ),
    )
    return extract_anomalies(scores, score_percent_threshold=0.5)


# percent-threshold islands: thr = 0.5 * MAX(score) per series, scores
# must also be > 0 (flat zero-score series yield no windows).
_WINDOWS_PCT_SQL = (
    f"{_BASE}, sc AS (SELECT series_key, ts_ms, {_ABS_SCORE} AS score FROM g), "
    "mx AS (SELECT series_key, MAX(score) * 0.5 AS thr FROM sc GROUP BY series_key), "
    "fl AS (SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY sc.series_key "
    "ORDER BY sc.ts_ms) AS rn FROM sc), "
    "ab AS (SELECT fl.*, rn - ROW_NUMBER() OVER (PARTITION BY fl.series_key "
    "ORDER BY fl.ts_ms) AS isl FROM fl JOIN mx ON mx.series_key = fl.series_key "
    "WHERE fl.score >= mx.thr AND fl.score > 0), "
    "agg AS (SELECT series_key, isl, MIN(ts_ms) AS start_ts_ms, "
    "MAX(ts_ms) AS end_ts_ms, MAX(score) AS anomaly_score "
    "FROM ab GROUP BY series_key, isl) "
    "SELECT a.series_key, a.start_ts_ms, a.end_ts_ms, "
    "MIN(b.ts_ms) AS exact_ts_ms, a.anomaly_score "
    "FROM agg a JOIN ab b ON b.series_key = a.series_key AND b.isl = a.isl "
    "AND b.score = a.anomaly_score "
    "GROUP BY a.series_key, a.start_ts_ms, a.end_ts_ms, a.anomaly_score"
)


QUERIES: dict[str, QuerySpec] = {
    # D5: absolute threshold — pure column expressions
    "det_absolute_threshold": QuerySpec(
        _scored(
            "absolute_threshold",
            {
                "absolute_threshold_value_upper": 250.0,
                "absolute_threshold_value_lower": 5.0,
            },
        ),
        _ABS_SQL,
    ),
    # D2: exp-avg EMA detector (range-normalized oracle mode)
    "det_exp_avg": QuerySpec(
        _scored("exp_avg_detector", {"normalizer": "range"}), _EXP_AVG_SQL
    ),
    # D1: derivative detector (the reference default)
    "det_derivative": QuerySpec(
        _scored("derivative_detector", {"normalizer": "range"}), _DERIV_SQL
    ),
    # D4: ensemble of D1+D2
    "det_ensemble": QuerySpec(_ensemble_fn, _ENSEMBLE_SQL),
    # D6: percent deviation vs as-of-aligned baseline (yesterday's value)
    "det_diff_percent": QuerySpec(
        _scored(
            "diff_percent_threshold",
            {"percent_threshold_upper": 20.0},
            with_baseline=True,
        ),
        _DIFF_PCT_SQL,
    ),
    # D7: rolling sign test vs baseline
    "det_sign_test": QuerySpec(
        _scored("sign_test", {"window_size": 10}, with_baseline=True), _SIGN_SQL
    ),
    # D10: threshold → contiguous anomaly windows with peak point
    "det_windows": QuerySpec(_windows_fn, _WINDOWS_SQL),
    # D10 percent-threshold mode (score_percent_threshold, config.py:85)
    "det_windows_percent": QuerySpec(_windows_pct_fn, _WINDOWS_PCT_SQL),
    # D9: refine pass — second algorithm re-scores within found windows
    "det_refine": QuerySpec(_refine_fn, _REFINE_SQL),
    # D8: plugin-registered custom algorithm, dispatched by name
    "det_custom_plugin": QuerySpec(_plugin_fn, _PLUGIN_SQL),
    # D3: SAX-bitmap — not SQL-expressible; driver does a rows-only check
    "det_bitmap": QuerySpec(_bitmap_fn, _BITMAP_SQL),
    # extension: robust MAD scorer (low-median — no interpolation, exact)
    "det_mad": QuerySpec(_scored("mad", {}), _MAD_SQL),
    # extension: percentile-rank score calibration (uniform [0,1] per
    # series — the precursor to mixing heterogeneous detectors)
    "det_score_calibrated": QuerySpec(_calibrated_fn, _CALIBRATED_SQL),
    # extension: global incident merge (the on-call rollup of
    # per-series anomaly windows)
    "det_incidents": QuerySpec(_incidents_fn, _INCIDENTS_SQL),
    # extension: seasonal-naive baseline scorer (daily season over hourly buckets)
    "det_seasonal_naive": QuerySpec(
        _scored("seasonal_naive", {"period": 24}), _SEASONAL_SQL
    ),
    # extension: Hampel rolling robust outlier filter
    "det_hampel": QuerySpec(
        _scored("hampel", {"half_window": 5}), _HAMPEL_SQL
    ),
    # extension: two-sided CUSUM change-point scorer (recursive-CTE oracle)
    "det_cusum": QuerySpec(_scored("cusum", {}), _CUSUM_SQL),
    # extension: Page-Hinkley running-mean drift scorer (adaptive center)
    "det_page_hinkley": QuerySpec(_scored("page_hinkley", {}), _PH_SQL),
    # extension: seasonality-aware scoring on the STL residual
    "det_stl_residual": QuerySpec(_stl_residual_fn, _STL_RESIDUAL_SQL),
    # extension: Holt level+trend one-step-ahead forecast scorer
    "det_holt_winters": QuerySpec(_scored("holt_winters", {}), _HOLT_SQL),
}


def _macd_fn(spark, sf_dir):
    from ..detectors.sequential import macd_frame
    from .common import hourly_avg_frame

    return macd_frame(hourly_avg_frame(spark, sf_dir))


from ..detectors.sequential import (  # noqa: E402
    MACD_A_FAST as _MAF, MACD_B_FAST as _MBF,
    MACD_A_SLOW as _MAS, MACD_B_SLOW as _MBS,
    MACD_A_SIG as _MAG, MACD_B_SIG as _MBG,
)

from .common import flit as _fl  # noqa: E402

# MACD(12,26,9) as ONE recursive CTE carrying (ef, es, sig); the signal
# update inlines macd = ef' − es' with the new-state expressions (same
# float value — identical expressions), initial state ef=es=v0, sig=0.
# Constants go through flit(): DuckDB's bare numeric literal path lands
# one ulp off for repr(2/13) and repr(1 − 2/27) (decimal→double double
# rounding); the string cast is correctly rounded.
_MACD_SQL = (
    f"{_BASE}, "
    "o AS (SELECT series_key, ts_ms, value AS v, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms) AS rn FROM g), "
    "r AS (SELECT series_key, ts_ms, v, rn, v AS ef, v AS es, "
    "CAST(0.0 AS DOUBLE) AS sig FROM o WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.v, o.rn, "
    f"{_fl(_MAF)} * o.v + {_fl(_MBF)} * r.ef, "
    f"{_fl(_MAS)} * o.v + {_fl(_MBS)} * r.es, "
    f"{_fl(_MAG)} * (({_fl(_MAF)} * o.v + {_fl(_MBF)} * r.ef) - "
    f"({_fl(_MAS)} * o.v + {_fl(_MBS)} * r.es)) + {_fl(_MBG)} * r.sig "
    "FROM o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, v AS value, ef - es AS macd, sig AS signal, "
    "(ef - es) - sig AS histogram FROM r"
)

QUERIES["ts_macd"] = QuerySpec(_macd_fn, _MACD_SQL)
