"""Correlator semantics: a series correlated against its own lagged
copy must peak exactly at that lag."""

from __future__ import annotations

import pytest

from potoos_spark.operators.correlate import best_shift, cross_correlate

LAG = 5_000


@pytest.fixture()
def lagged_pair(spark):
    vals = [(i % 7) * 1.0 + (3.0 if i % 11 == 0 else 0.0) for i in range(200)]
    rows = [("a", 1_000_000 + i * 1_000, v) for i, v in enumerate(vals)]
    rows += [("b", 1_000_000 + i * 1_000 + LAG, v) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double")


def test_best_shift_recovers_lag(spark, lagged_pair):
    shifts = [s * 1_000 for s in range(-8, 9)]
    row = best_shift(lagged_pair, "a", "b", shifts).first()
    assert row["shift_ms"] == LAG
    assert row["r"] == pytest.approx(1.0)


def test_exact_and_streaming_corr_agree(spark, lagged_pair):
    from pyspark.sql import functions as F

    df = lagged_pair.withColumn("value", F.col("value") * 100)
    a = {
        r["shift_ms"]: r["r"]
        for r in cross_correlate(df, "a", "b", [0, LAG], exact=True).collect()
    }
    b = {
        r["shift_ms"]: r["r"]
        for r in cross_correlate(df, "a", "b", [0, LAG], exact=False).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9)


def test_pattern_match_finds_planted_template(spark):
    """r6 subsequence search: plant an affine copy of the spike
    template (2q+5) into an otherwise flat-noise series — the window
    ending at the plant must rank #1 for that series with r ≈ 1
    (Pearson is affine-invariant), and every reported window must be
    a full m-point window (rank column bounded, bigint)."""
    from potoos_spark.catalog.correlate import (
        _PM_M,
        _PM_Q,
        _pattern_match_fn,
    )
    from potoos_spark.catalog import CATALOG
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    HOUR = 3_600_000
    # build a synthetic events table through the same hourly path the
    # catalog fn uses is overkill here — drive the catalog fn on the
    # real fixture for shape, then check the math on a planted frame
    # via the same expressions (hourly sums of value*100).
    vals = [7.0] * 40
    start = 20
    for j, q in enumerate(_PM_Q):
        vals[start + j] = 2.0 * q + 5.0
    rows = [("s", i * HOUR + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, ts bigint, value double")
    # mirror _hourly_int_sums on this local frame
    iv = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    h = (
        df.select(
            F.col("event_type").alias("series_key"),
            (F.col("ts") - F.pmod(F.col("ts"), F.lit(HOUR))).alias("ts_ms"),
            iv.alias("iv"),
        )
        .groupBy("series_key", "ts_ms")
        .agg(F.sum("iv").alias("value"))
    )
    import potoos_spark.catalog.correlate as C
    from pyspark.sql import Window as W

    m, Q = C._PM_M, C._PM_Q
    wo = W.partitionBy("series_key").orderBy("ts_ms")
    wf = wo.rowsBetween(-(m - 1), 0)
    sx = F.sum("value").over(wf)
    sxx = F.sum(F.col("value") * F.col("value")).over(wf)
    dot = None
    for j in range(m):
        t = F.lit(Q[j]) * F.lag("value", m - 1 - j).over(wo)
        dot = t if dot is None else dot + t
    num = (F.lit(m) * dot - sx * F.lit(C._PM_SQ)).cast("double")
    den = F.sqrt(
        (F.lit(m) * sxx - sx * sx).cast("double")
        * F.lit(float(m * C._PM_SQQ - C._PM_SQ**2))
    )
    scored = (
        h.select(
            "series_key", "ts_ms", F.count("*").over(wf).alias("n"),
            F.when(den > 0, num / den).alias("r"),  # the fn's den>0 guard
        )
        .filter(F.col("n") == m)
        .orderBy(F.col("r").desc_nulls_last())
        .collect()
    )
    best = scored[0]
    assert best["ts_ms"] == (start + m - 1) * HOUR  # window ends at plant end
    assert best["r"] > 0.999999
    assert all((r["r"] is None) or (r["r"] < 0.9) for r in scored[1:] if r["ts_ms"] != best["ts_ms"])

    # and the catalog fn runs on the fixture with the bounded output
    out = CATALOG["ts_pattern_match"].fn(spark, SF_DIR).collect()
    per = {}
    for r in out:
        per.setdefault(r["series_key"], []).append(r["rank"])
    assert per and all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
