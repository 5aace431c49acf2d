"""salted_agg must agree with the direct aggregation for every
decomposable aggregator, including on a pathologically skewed frame."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potoos_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' carries 50x the rows of each cold key
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("value")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10)).alias("k"),
        (F.col("id") % 13).cast("double").alias("value"),
    )
    return hot.unionAll(cold)


# lazy: Column construction needs an active session
AGGS = {
    "sum": lambda: F.sum("value"),
    "count": lambda: F.count("value").cast("double"),
    "min": lambda: F.min("value"),
    "max": lambda: F.max("value"),
    "avg": lambda: F.avg("value"),
    "var.p": lambda: F.var_pop("value"),
    "var.s": lambda: F.var_samp("value"),
    "std.p": lambda: F.stddev_pop("value"),
    "std.s": lambda: F.stddev_samp("value"),
}


@pytest.mark.parametrize("agg", sorted(AGGS))
def test_salted_agg_matches_direct(spark, skewed, agg):
    got = {
        r["k"]: r["value"]
        for r in salted_agg(skewed, ["k"], agg_type=agg, n_salts=16).collect()
    }
    want = {
        r["k"]: r["v"]
        for r in skewed.groupBy("k").agg(AGGS[agg]().cast("double").alias("v")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12, abs=1e-12), (k, agg)


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], agg_type="first")


def test_salted_join_row_identical_to_plain_join(spark):
    from potoos_spark.operators.skew import salted_join

    facts = spark.createDataFrame(
        [("hot", i, float(i)) for i in range(500)] + [("cold", 0, 9.0)],
        "k string, i bigint, v double",
    )
    dim = spark.createDataFrame([("hot", 1.5), ("cold", 2.0)], "k string, m double")
    got = sorted(tuple(r) for r in salted_join(facts, dim, "k").collect())
    want = sorted(tuple(r) for r in facts.join(dim, "k").collect())
    assert got == want
