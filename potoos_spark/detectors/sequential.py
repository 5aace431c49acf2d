"""Sequential-state detectors (SURVEY.md §2.4 D1/D2/D4/D3).

EMA and SAX-bitmap passes are inherently order-dependent per series, so
they run as Arrow-batched ``applyInPandas`` kernels partitioned by
``series_key`` — each series' sequential pass is local to one task after
a single hash partition, and every series is processed in parallel
(the reference ran one series at a time in driver Python,
/root/reference/potoos/client.py:91). NumPy/pandas vectorize within a
series; no row-at-a-time Python anywhere.

Score conventions (documented semantics, re-derived from the published
Luminol algorithms — Luminol itself is not a dependency):

* ``exp_avg_detector``: ema
  via the adjust=False recurrence ``ema_i = a*v_i + (1-a)*ema_{i-1}``,
  ``ema_0 = v_0``; score = |v - ema| / stddev_samp(series) (0 if the
  series is constant). With ``lag_window_size`` set, mean/std come from
  the trailing window instead.
* ``derivative_detector``: d_i = |v_i - v_{i-1}| / ((t_i - t_{i-1})/1000)
  (per-second rate; d_0 = d_1); score = |d - ema(d)| / stddev_samp(d).
* ``default_detector``: mean of the two scores above (ensemble, D4).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .base import register_detector

_OUT_SCHEMA = "series_key string, ts_ms bigint, value double, score double"


def _per_series(df: DataFrame, kernel: Callable[[pd.DataFrame], pd.DataFrame]) -> DataFrame:
    # stable mergesort + seq tiebreak: the recurrences are order-
    # dependent, so duplicate timestamps must order identically on
    # every run/partitioning (quicksort gives no tie order and Spark's
    # group input order varies) — same discipline as retrieval.py
    cols = ["series_key", "ts_ms", "value"] + (
        ["seq"] if "seq" in df.columns else []
    )

    def wrapped(pdf: pd.DataFrame) -> pd.DataFrame:
        sort_cols = ["ts_ms", "seq"] if "seq" in pdf.columns else ["ts_ms"]
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        out = kernel(pdf)
        return out[["series_key", "ts_ms", "value", "score"]]

    return (
        df.select(*cols)
        .groupBy("series_key")
        .applyInPandas(wrapped, schema=_OUT_SCHEMA)
    )


def _ema(values: np.ndarray, alpha: float) -> np.ndarray:
    """Explicit recurrence ``ema_i = a*v_i + (1-a)*ema_{i-1}`` with
    ``ema_0 = v_0``. Written as a plain loop (not pandas ewm) so the
    float64 operation order is *exactly* the documented recurrence —
    a SQL recursive-CTE oracle reproduces it bit-for-bit."""
    beta = 1.0 - alpha
    out = np.empty(len(values), dtype=np.float64)
    if len(values) == 0:
        return out
    e = values[0]
    out[0] = e
    for i in range(1, len(values)):
        e = alpha * values[i] + beta * e
        out[i] = e
    return out


def _safe_div(num: np.ndarray, denom: float) -> np.ndarray:
    if denom is None or denom == 0 or np.isnan(denom):
        return np.zeros_like(num)
    return num / denom


def _norm_denom(sample: np.ndarray, normalizer: str) -> float:
    """'std' (Luminol-style, default) or 'range' (max-min; exactly
    reproducible cross-engine since no accumulation is involved)."""
    if len(sample) < 2:
        return 0.0
    if normalizer == "range":
        return float(np.max(sample) - np.min(sample))
    return float(np.std(sample, ddof=1))


def _exp_avg_kernel(alpha: float, lag_window_size: int | None, normalizer: str = "std"):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        if len(v) == 0:
            pdf["score"] = np.zeros(0)
            return pdf
        if lag_window_size:
            roll = pd.Series(v).rolling(int(lag_window_size), min_periods=1)
            mean = roll.mean().to_numpy()
            std = roll.std(ddof=1).to_numpy()
            score = np.abs(v - mean)
            score = np.where((std > 0) & ~np.isnan(std), score / std, 0.0)
        else:
            ema = _ema(v, alpha)
            score = _safe_div(np.abs(v - ema), _norm_denom(v, normalizer))
        pdf["score"] = score
        return pdf

    return kernel


def _derivative_kernel(alpha: float, normalizer: str = "std"):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        t = pdf["ts_ms"].to_numpy(dtype=np.float64)
        n = len(v)
        if n < 2:
            pdf["score"] = np.zeros(n)
            return pdf
        dt = np.diff(t) / 1000.0
        dt[dt == 0] = 1.0
        d = np.abs(np.diff(v)) / dt
        d = np.concatenate([[d[0]], d])  # d_0 = d_1, reference-style copy
        ema = _ema(d, alpha)
        pdf["score"] = _safe_div(np.abs(d - ema), _norm_denom(d, normalizer))
        return pdf

    return kernel


@register_detector("exp_avg_detector")
def exp_avg_detector(
    df: DataFrame,
    smoothing_factor: float = 0.2,
    lag_window_size: int | None = None,
    normalizer: str = "std",
) -> DataFrame:
    """D2: deviation from the exponential moving average."""
    return _per_series(
        df, _exp_avg_kernel(float(smoothing_factor), lag_window_size, normalizer)
    )


@register_detector("derivative_detector")
def derivative_detector(
    df: DataFrame, smoothing_factor: float = 0.2, normalizer: str = "std"
) -> DataFrame:
    """D1 (the reference's default algorithm, config.py:86): deviation of
    |dv/dt| from its exponential moving average."""
    return _per_series(df, _derivative_kernel(float(smoothing_factor), normalizer))


@register_detector("default_detector")
def default_detector(
    df: DataFrame, smoothing_factor: float = 0.2, normalizer: str = "std"
) -> DataFrame:
    """D4: ensemble — mean of exp_avg and derivative scores, computed in
    one pandas pass per series (not two Spark jobs)."""
    exp_k = _exp_avg_kernel(float(smoothing_factor), None, normalizer)
    der_k = _derivative_kernel(float(smoothing_factor), normalizer)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        a = exp_k(pdf.copy())["score"].to_numpy()
        b = der_k(pdf.copy())["score"].to_numpy()
        pdf["score"] = (a + b) / 2.0
        return pdf

    return _per_series(df, kernel)


@register_detector("bitmap_detector")
def bitmap_detector(
    df: DataFrame,
    precision: int = 4,
    chunk_size: int = 2,
    lag_window_size: int = 50,
    future_window_size: int = 50,
) -> DataFrame:
    """D3: SAX-bitmap detector. Values are discretized into ``precision``
    equal-width bins over the series range (SAX symbols); consecutive
    ``chunk_size``-symbol words are counted in a lagging and a future
    window around each point; score = squared distance between the two
    normalized word-frequency bitmaps (chaos-game bitmap distance).
    Points without both full windows score 0.
    """
    p = int(precision)
    cs = int(chunk_size)
    lw = int(lag_window_size)
    fw = int(future_window_size)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = len(v)
        scores = np.zeros(n)
        if n >= lw + fw and np.nanmax(v) > np.nanmin(v):
            lo, hi = np.nanmin(v), np.nanmax(v)
            with np.errstate(invalid="ignore"):
                sym = np.minimum(
                    ((v - lo) / (hi - lo) * p).astype(np.int64), p - 1
                )
            nan_mask = np.isnan(v)
            # word id of the chunk ENDING at i (base-p encoding); chunks
            # touching a NaN point get NO word (-1) — NaN cast to int64
            # would otherwise alias to a valid symbol after base-p
            # wraparound and silently corrupt the bitmaps
            words = np.full(n, -1, dtype=np.int64)
            if n >= cs:
                w = np.zeros(n - cs + 1, dtype=np.int64)
                bad = np.zeros(n - cs + 1, dtype=bool)
                for j in range(cs):
                    w = w * p + sym[j : j + n - cs + 1]
                    bad |= nan_mask[j : j + n - cs + 1]
                w[bad] = -1
                words[cs - 1 :] = w
            n_words = p**cs
            # prefix counts of each word id → O(n · p^cs) bitmap windows
            onehot = np.zeros((n + 1, n_words), dtype=np.int32)
            valid = words >= 0
            onehot[1:][valid, words[valid]] = 1
            prefix = np.cumsum(onehot, axis=0)
            for i in range(lw, n - fw):
                lag = prefix[i] - prefix[max(0, i - lw)]
                fut = prefix[min(n, i + fw)] - prefix[i]
                ls, fs = lag.sum(), fut.sum()
                if ls > 0 and fs > 0:
                    diff = lag / ls - fut / fs
                    # left-associative sum in word order (np.dot's SIMD
                    # reduction reorders additions) so the score is
                    # bit-reproducible in the word-indexed SQL oracle
                    s = 0.0
                    for x in diff:
                        s += x * x
                    scores[i] = s
        pdf["score"] = scores
        return pdf

    return _per_series(df, kernel)


def _cusum_kernel(allowance_frac: float):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = len(v)
        if n == 0:
            pdf["score"] = np.zeros(0)
            return pdf
        sv = np.sort(v)
        mu = sv[(n + 1) // 2 - 1]  # LOW median: exact, no accumulation
        rng = float(np.max(v) - np.min(v))
        k = allowance_frac * rng
        # explicit loop: the float64 op order IS the documented
        # recurrence, so the recursive-CTE oracle matches bit-for-bit
        dp = (v - mu) - k
        dn = (mu - v) - k
        sp = sn = 0.0
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            sp = max(sp + dp[i], 0.0)
            sn = max(sn + dn[i], 0.0)
            out[i] = max(sp, sn)
        pdf["score"] = out / rng if rng > 0 else np.zeros(n)
        return pdf

    return kernel


@register_detector("cusum")
def cusum_detector(df: DataFrame, allowance_frac: float = 0.05) -> DataFrame:
    """Two-sided CUSUM change-point scorer (extension tier — no reference
    file:line; Page 1954, the standard sequential change detector):

        s+_i = max(s+_{i-1} + ((x_i - mu) - k), 0)
        s-_i = max(s-_{i-1} + ((mu - x_i) - k), 0)
        score_i = max(s+_i, s-_i) / range

    mu is the per-series LOW median and k = allowance_frac * range —
    both exact (sort/extremes, no float accumulation), so the only
    sequential float path is the recurrence itself, reproduced
    bit-for-bit by a recursive-CTE SQL oracle. Sustained level shifts
    accumulate score linearly; isolated spikes decay — complements the
    point-wise EMA/MAD detectors."""
    return _per_series(df, _cusum_kernel(float(allowance_frac)))


def _holt_kernel(alpha: float, beta: float):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = len(v)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            pdf["score"] = out
            return pdf
        rng = float(np.max(v) - np.min(v))
        level, trend = v[0], 0.0
        # score_i = |v_i - (level_{i-1} + trend_{i-1})| / range — the
        # one-step-ahead forecast error, computed BEFORE the update
        for i in range(1, n):
            pred = level + trend
            out[i] = abs(v[i] - pred) / rng if rng > 0 else 0.0
            new_level = alpha * v[i] + (1.0 - alpha) * pred
            trend = beta * (new_level - level) + (1.0 - beta) * trend
            level = new_level
        pdf["score"] = out
        return pdf

    return kernel


@register_detector("holt_winters")
def holt_winters_detector(
    df: DataFrame, smoothing_factor: float = 0.2, trend_factor: float = 0.1
) -> DataFrame:
    """Holt's double-exponential (level + trend) one-step-ahead forecast
    scorer (extension tier — no reference file:line; Holt 1957, the
    standard trending-series baseline the plain EMA detectors lack):

        pred_i    = level_{i-1} + trend_{i-1}
        score_i   = |v_i - pred_i| / range
        level_i   = a*v_i + (1-a)*pred_i
        trend_i   = b*(level_i - level_{i-1}) + (1-b)*trend_{i-1}

    with level_1 = v_1, trend_1 = 0, score_1 = 0. A steadily trending
    series scores low (the trend term absorbs the slope — the
    derivative detector's blind spot is exactly its strength); trend
    *breaks* spike. The coupled float64 recurrence is replayed
    bit-for-bit by a recursive-CTE oracle carrying (level, trend)."""
    return _per_series(df, _holt_kernel(float(smoothing_factor), float(trend_factor)))


def _page_hinkley_kernel(delta_frac: float):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = len(v)
        if n == 0:
            pdf["score"] = np.zeros(0)
            return pdf
        rng = float(np.max(v) - np.min(v))
        delta = delta_frac * rng
        # explicit loop: the float64 op order IS the documented
        # recurrence, replayed bit-for-bit by the recursive-CTE oracle
        # carrying (s, up, dn)
        s = 0.0
        up = dn = 0.0
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            s += v[i]
            mean = s / (i + 1)
            up = max(up + ((v[i] - mean) - delta), 0.0)
            dn = max(dn + ((mean - v[i]) - delta), 0.0)
            out[i] = max(up, dn)
        pdf["score"] = out / rng if rng > 0 else np.zeros(n)
        return pdf

    return kernel


@register_detector("page_hinkley")
def page_hinkley_detector(df: DataFrame, delta_frac: float = 0.02) -> DataFrame:
    """Two-sided Page-Hinkley drift scorer (extension tier — no
    reference file:line; Page 1954 / Hinkley 1971, the standard
    streaming concept-drift test, e.g. Gama et al. 2014 survey):

        mean_i = (v_1 + ... + v_i) / i          (running mean)
        up_i   = max(up_{i-1} + ((v_i - mean_i) - delta), 0)
        dn_i   = max(dn_{i-1} + ((mean_i - v_i) - delta), 0)
        score_i = max(up_i, dn_i) / range

    with delta = delta_frac * range. Unlike CUSUM (fixed global
    median center), the center ADAPTS as the running mean absorbs
    drift — a slow ramp scores low while an abrupt level shift spikes
    before the mean catches up, so the two detectors separate gradual
    vs sudden change. The only sequential float path is the (s, up,
    dn) recurrence, reproduced bit-for-bit by a recursive-CTE oracle."""
    return _per_series(df, _page_hinkley_kernel(float(delta_frac)))


# MACD constants: alpha = 2/(n+1) for the standard (12, 26, 9) periods,
# computed ONCE here and embedded verbatim in the SQL oracle — both
# engines multiply by the identical float64s.
MACD_A_FAST = 2.0 / (12 + 1)
MACD_B_FAST = 1.0 - MACD_A_FAST
MACD_A_SLOW = 2.0 / (26 + 1)
MACD_B_SLOW = 1.0 - MACD_A_SLOW
MACD_A_SIG = 2.0 / (9 + 1)
MACD_B_SIG = 1.0 - MACD_A_SIG


def macd_frame(df: DataFrame) -> DataFrame:
    """MACD(12, 26, 9) — the classic EMA-crossover trend indicator
    (extension tier; Appel's moving-average convergence/divergence),
    over the canonical (series_key, ts_ms, value) frame:

        ef_i = a_f·v_i + (1−a_f)·ef_{i−1}     (ef_0 = v_0)
        es_i = a_s·v_i + (1−a_s)·es_{i−1}     (es_0 = v_0)
        macd_i = ef_i − es_i
        sig_i  = a_g·macd_i + (1−a_g)·sig_{i−1}   (sig_0 = macd_0 = 0)
        hist_i = macd_i − sig_i

    Same float64 discipline as the EMA detectors: the explicit loop's
    op order IS the documented recurrence, so a recursive-CTE oracle
    carrying (ef, es, sig) replays it bit-for-bit. One applyInPandas
    per series — three O(1)-state recurrences in a single pass.

    Output: (series_key, ts_ms, value, macd, signal, histogram)."""
    out_schema = (
        "series_key string, ts_ms bigint, value double, "
        "macd double, signal double, histogram double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ts_ms", "seq"] if "seq" in pdf.columns else ["ts_ms"],
            kind="mergesort",
        ).reset_index(drop=True)
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = len(v)
        macd = np.zeros(n)
        sig = np.zeros(n)
        if n:
            ef = es = v[0]
            s = 0.0
            for i in range(1, n):
                ef = MACD_A_FAST * v[i] + MACD_B_FAST * ef
                es = MACD_A_SLOW * v[i] + MACD_B_SLOW * es
                m = ef - es
                s = MACD_A_SIG * m + MACD_B_SIG * s
                macd[i] = m
                sig[i] = s
        out = pdf[["series_key", "ts_ms", "value"]].copy()
        out["macd"] = macd
        out["signal"] = sig
        out["histogram"] = macd - sig
        return out

    cols = ["series_key", "ts_ms", "value"] + (
        ["seq"] if "seq" in df.columns else []
    )
    return df.select(*cols).groupBy("series_key").applyInPandas(
        kernel, schema=out_schema
    )
