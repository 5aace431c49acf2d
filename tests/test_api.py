"""API-surface parity tests mirroring the reference's orchestration
suite (/root/reference/tests/test_client.py): source check, config
resolution/override, and the D8 custom-algorithm plugin paths."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potoos_spark import (
    DetectorConfig,
    PotoosSession,
    TimeSeriesConfig,
    register_detector,
    score,
)


def test_check_source_rejects_non_series_frame(spark):
    # reference: missing timeseries module -> RuntimeError (client.py:31-35)
    bad = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(RuntimeError, match="missing columns"):
        PotoosSession(spark).read_series(bad)


def test_monitor_per_call_config_overrides_default(spark, series4):
    # reference: ts_config argument wins over the instance default
    # (client.py:130; test_client.py:239-255)
    sess = PotoosSession(
        spark, ts_config=TimeSeriesConfig(filter_by_min_value=1e9)  # filters all
    )
    empty = sess.read_series(series4)
    assert empty.count() == 0
    override = sess.read_series(series4, TimeSeriesConfig())
    assert override.count() == 4


def test_algorithm_class_callable_dispatch(spark, series4):
    # D8 direct callable (reference config.py:90, validation :99-100)
    def doubled(df, **params):
        return df.select(
            "series_key", "ts_ms", "value", (F.col("value") * 2).alias("score")
        )

    out = score(series4, DetectorConfig(algorithm_class=doubled))
    rows = {r["ts_ms"]: r["score"] for r in out.collect()}
    assert rows[1000] == 20.0 and rows[4000] == 80.0


def test_register_detector_plugin_dispatch(spark, series4):
    # D8 named registration: plugins dispatch identically to built-ins
    @register_detector("unit_test_constant")
    def constant(df, c=7.0):
        return df.select(
            "series_key", "ts_ms", "value", F.lit(float(c)).alias("score")
        )

    cfg = DetectorConfig(
        algorithm_name="unit_test_constant", algorithm_params={"c": 3.0}
    )
    out = score(series4, cfg)
    assert {r["score"] for r in out.collect()} == {3.0}


def test_unknown_algorithm_name_raises():
    with pytest.raises(ValueError, match="unknown algorithm_name"):
        DetectorConfig(algorithm_name="nope")


def test_error_propagation_through_monitor(spark):
    # reference: exceptions propagate transparently (test_client.py:257-267)
    sess = PotoosSession(spark)
    with pytest.raises(RuntimeError):
        sess.monitor(spark.createDataFrame([(1,)], "x int"))


def test_register_tables_enables_sql(spark):
    from potoos_spark import PotoosSession

    from tests.conftest import SF_DIR

    sess = PotoosSession(spark)
    tables = sess.register_tables(SF_DIR)
    assert set(tables) >= {"lineitem", "orders", "events"}
    n = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == tables["lineitem"].count() > 0
    joined = spark.sql(
        "SELECT COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ).collect()[0]["n"]
    assert joined > 0
