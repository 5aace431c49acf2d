"""Cross-series correlation — the companion surface to anomaly
detection in the published Luminol library (``luminol.correlator.
Correlator``: Pearson cross-correlation over time-shifted alignments;
public API, github.com/linkedin/luminol). The reference wraps only
``AnomalyDetector`` (/root/reference/potoos/client.py:91), so this is
an extension completing the library surface on Spark.

Semantics: for a pair of series and each lag in ``shifts_ms``, shift
the candidate series by the lag, inner-join on timestamp, and compute
the Pearson coefficient over the overlap. Output one row per
(series pair, shift) — the caller picks argmax |r| for the best
alignment. Implementation is join + ``corr`` aggregate: one shuffle
per lag batch, all JVM-side; no per-row Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def cross_correlate(
    df: DataFrame,
    key_a: str,
    key_b: str,
    shifts_ms: Sequence[int] = (0,),
    min_overlap: int = 2,
    exact: bool = False,
) -> DataFrame:
    """Pearson correlation of series ``key_b`` against ``key_a`` at each
    time shift. Positive shift = b lags a by that many ms (b's
    timestamps are moved earlier before aligning).

    ``exact=True`` computes r from the closed form over exact sums —
    use with integer-valued series (e.g. scaled counts): every
    accumulation is then order-free and the result is bit-identical
    across engines. Default uses Spark's streaming ``corr``.

    Output: (shift_ms, n_overlap, r) — one row per shift with at least
    ``min_overlap`` aligned points."""
    a = df.filter(F.col("series_key") == key_a).select(
        F.col("ts_ms").alias("ts"), F.col("value").alias("va")
    )
    b = df.filter(F.col("series_key") == key_b).select("ts_ms", F.col("value").alias("vb"))
    shifted = b.select(
        F.explode(F.array(*[F.lit(int(s)) for s in shifts_ms])).alias("shift_ms"),
        "ts_ms",
        "vb",
    ).select("shift_ms", (F.col("ts_ms") - F.col("shift_ms")).alias("ts"), "vb")
    joined = a.join(shifted, "ts")
    if not exact:
        return (
            joined.groupBy("shift_ms")
            .agg(
                F.count("*").alias("n_overlap"),
                F.corr("va", "vb").alias("r"),
            )
            .filter(F.col("n_overlap") >= int(min_overlap))
        )
    x, y = F.col("va"), F.col("vb")
    sums = joined.groupBy("shift_ms").agg(
        F.count("*").alias("n_overlap"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n_overlap")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        sums.filter(n >= int(min_overlap))
        .select("shift_ms", "n_overlap", (num / den).alias("r"))
    )


def best_shift(
    df: DataFrame,
    key_a: str,
    key_b: str,
    shifts_ms: Sequence[int],
    min_overlap: int = 2,
) -> DataFrame:
    """The Correlator-style answer: the single shift maximizing |r|
    (ties → smaller |shift|, then smaller shift)."""
    scored = cross_correlate(df, key_a, key_b, shifts_ms, min_overlap)
    ranked = scored.orderBy(
        F.abs(F.col("r")).desc(), F.abs(F.col("shift_ms")), F.col("shift_ms")
    )
    return ranked.limit(1)


def goertzel_power(df: DataFrame, period_samples: int) -> DataFrame:
    """Spectral energy at one target period via the Goertzel recurrence
    (public DSP classic — the single-bin DFT):

        s_i = (x_i + coeff*s_{i-1}) - s_{i-2},  coeff = 2*cos(2π/period)
        power = (s_N² + s_{N-1}²) - coeff*s_N*s_{N-1}

    per series over its ordered samples — the cheap seasonality-strength
    probe (one pass, O(1) state; a full FFT is neither needed nor
    distributable per-series). Runs in the same ``applyInPandas``
    sequential lane as the EMA detectors; the two-term recurrence is
    replayed bit-for-bit by a recursive-CTE oracle (coeff embedded as
    the identical repr'd double literal).

    Output: (series_key, n, power).
    """
    import math

    import numpy as np
    import pandas as pd

    coeff = 2.0 * math.cos(2.0 * math.pi / int(period_samples))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_ms").reset_index(drop=True)
        v = pdf["value"].to_numpy(dtype=np.float64)
        s1 = s2 = 0.0
        for x in v:
            s = (x + coeff * s1) - s2
            s2 = s1
            s1 = s
        power = (s1 * s1 + s2 * s2) - coeff * s1 * s2
        return pd.DataFrame(
            {
                "series_key": [pdf["series_key"].iloc[0]] if len(v) else [],
                "n": [len(v)] if len(v) else [],
                "power": [power] if len(v) else [],
            }
        )

    return (
        df.select("series_key", "ts_ms", "value")
        .groupBy("series_key")
        .applyInPandas(kernel, schema="series_key string, n bigint, power double")
    )
