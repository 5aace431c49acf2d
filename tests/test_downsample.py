"""Unit semantics for operators/downsample.py (M4 is pinned by its
oracle entry; these cover the fixed-anchor LTTB selection rules)."""

from __future__ import annotations

from potoos_spark.operators.downsample import lttb_fixed

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"


def _rows(df):
    return {
        r["bucket_ms"]: (r["ts_ms"], r["value"])
        for r in df.collect()
    }


def test_lttb_picks_max_area_point_in_interior_bucket(spark):
    rows = [
        ("k", 0, 0.0, 1), ("k", 5000, 10.0, 2),           # bucket 0
        ("k", 11_000, 0.0, 3), ("k", 15_000, 100.0, 4),   # bucket 1
        ("k", 19_000, 0.0, 5),
        ("k", 25_000, 50.0, 6),                            # bucket 2
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _rows(lttb_fixed(df, 10_000))
    assert got[0] == (0, 0.0)            # first bucket: earliest point
    assert got[10_000] == (15_000, 100.0)  # spike maximizes the triangle
    assert got[20_000] == (25_000, 50.0)  # last bucket: latest point
    assert len(got) == 3                  # exactly one point per bucket


def test_lttb_single_bucket_keeps_earliest(spark):
    rows = [("k", 1000, 5.0, 1), ("k", 2000, 9.0, 2)]
    df = spark.createDataFrame(rows, SCHEMA)
    # only bucket → no A anchor → endpoint rule keeps earliest
    assert _rows(lttb_fixed(df, 10_000)) == {0: (1000, 5.0)}


def test_lttb_area_tie_breaks_to_earliest(spark):
    # symmetric points around a flat anchor line have equal area
    rows = [
        ("k", 9000, 10.0, 1),                              # bucket 0 (A)
        ("k", 14_000, 20.0, 2), ("k", 16_000, 0.0, 3),     # bucket 1
        ("k", 21_000, 10.0, 4),                            # bucket 2 (C)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _rows(lttb_fixed(df, 10_000))
    # both interior candidates deviate ±10 around the A→C chord at
    # equal |slope|; areas tie → earliest ts wins
    assert got[10_000][0] == 14_000


def test_debounce_restarts_window_at_kept_point(spark):
    from potoos_spark.operators.downsample import debounce

    # cooldown 10s: keep t=0; t=7 too soon; t=12 kept (12-0>=10);
    # t=19 too soon (19-12<10, window restarted at 12); t=22 kept —
    # fixed 10s buckets would have kept t=19 (bucket [10,20) first-seen
    # is 12, but 19 falls in the same bucket; the restart rule differs)
    rows = [("k", t * 1000, float(t), t) for t in (0, 7, 12, 19, 22)]
    df = spark.createDataFrame(
        rows, "series_key string, ts_ms bigint, value double, seq bigint"
    )
    kept = sorted(r["ts_ms"] for r in debounce(df, 10_000).collect())
    assert kept == [0, 12_000, 22_000]
