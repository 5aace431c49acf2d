"""Rollup-store correctness: every aggregator served from the rollup
ladder must match the same aggregation computed directly on raw data,
including when the request routes through combine (coarser bucket than
the materialized resolution)."""

from __future__ import annotations

import pytest

from potoos_spark.config import TimeSeriesConfig
from potoos_spark.operators.retrieval import apply_aggregation, events_series
from potoos_spark.operators.rollup import rollup_agg, write_rollups
from tests.conftest import SF_DIR

MIN_10 = 600_000
HOUR = 3_600_000
DAY = 86_400_000

# sum/avg/var accumulate doubles whose combine order differs from the
# direct single-pass sum → tolerance; the rest are order-free exact
EXACT = ("min", "max", "count", "first", "last", "range")
APPROX = ("sum", "avg", "var.p", "var.s", "std.p", "std.s")


@pytest.fixture(scope="module")
def ladder(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("rollups")
    series = events_series(spark, SF_DIR).select("series_key", "ts_ms", "value", "seq")
    tables = write_rollups(
        series, "ru_t", {"10m": MIN_10, "1h": HOUR}, path_prefix=str(path)
    )
    yield tables
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _direct(spark, agg, bucket):
    cfg = TimeSeriesConfig(aggregation_type=agg, bucket_size_msec=bucket)
    series = events_series(spark, SF_DIR)
    return {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in apply_aggregation(series, cfg).collect()
    }


@pytest.mark.parametrize("agg", EXACT + APPROX)
def test_rollup_serves_day_buckets(spark, ladder, agg):
    got = {
        (r["series_key"], r["ts_ms"]): r["value"]
        for r in rollup_agg(spark, ladder, DAY, agg).collect()
    }
    want = _direct(spark, agg, DAY)
    assert set(got) == set(want)
    for k in want:
        if agg in EXACT:
            assert got[k] == want[k], (k, agg)
        else:
            assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-9), (k, agg)


def test_routing_picks_coarsest_divisor(spark, ladder):
    # 2h request: both 10m and 1h divide; must route via the 1h table
    got = rollup_agg(spark, ladder, 2 * HOUR, "count")
    want = _direct(spark, "count", 2 * HOUR)
    assert {
        (r["series_key"], r["ts_ms"]): r["value"] for r in got.collect()
    } == want


def test_unserved_resolution_raises(spark, ladder):
    with pytest.raises(ValueError, match="no rollup resolution"):
        rollup_agg(spark, ladder, 90_000, "avg")  # 1.5 min: nothing divides
