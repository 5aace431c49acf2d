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


# --- skewed-series stress (VERDICT r2 item 8) ------------------------------


@pytest.fixture(scope="module")
def skewed_series(spark):
    """One series holds 50% of all rows (the hot-key shape a shared
    multi-tenant metric table develops at scale)."""
    hot = spark.range(100_000).select(
        F.lit("hot").alias("series_key"),
        (1_000_000 + F.col("id") * 10).alias("ts_ms"),
        (F.col("id") % 101).cast("double").alias("value"),
        F.col("id").alias("seq"),
    )
    cold = spark.range(100_000).select(
        F.concat(F.lit("c"), F.col("id") % 50).alias("series_key"),
        (1_000_000 + F.col("id") * 10).alias("ts_ms"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.col("id").alias("seq"),
    )
    return hot.unionAll(cold)


def test_count_limit_on_skewed_series(spark, skewed_series):
    """apply_count_limit must return exactly `count` newest points per
    series regardless of one series dominating the shuffle partition,
    and the answer must not depend on the input partitioning."""
    from potoos_spark.config import TimeSeriesConfig
    from potoos_spark.operators.retrieval import apply_count_limit

    cfg = TimeSeriesConfig(count=25, reversed=True)
    out = apply_count_limit(skewed_series, cfg)
    counts = {
        r["series_key"]: r["n"]
        for r in out.groupBy("series_key").agg(F.count("*").alias("n")).collect()
    }
    assert counts["hot"] == 25 and all(v == 25 for v in counts.values())
    hot_max = out.filter(F.col("series_key") == "hot").agg(
        F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi")
    ).collect()[0]
    # newest-first cap: the kept window is the top of the hot series
    assert hot_max["hi"] == 1_000_000 + 99_999 * 10
    assert hot_max["lo"] == 1_000_000 + (99_999 - 24) * 10
    repart = apply_count_limit(skewed_series.repartition(13), cfg)
    assert sorted(map(tuple, repart.collect())) == sorted(map(tuple, out.collect()))


def test_sequential_detector_on_skewed_series(spark, skewed_series):
    """The Arrow-batched sequential kernel must stream the hot series
    (one group = 100k points) without error, emit one score per input
    point, and produce partitioning-independent scores."""
    from potoos_spark.detectors.sequential import exp_avg_detector

    scored = exp_avg_detector(skewed_series)
    per_series = {
        r["series_key"]: r["n"]
        for r in scored.groupBy("series_key").agg(F.count("*").alias("n")).collect()
    }
    assert per_series["hot"] == 100_000
    assert sum(per_series.values()) == 200_000
    a = scored.filter(F.col("series_key") == "hot").agg(
        F.sum("score").alias("s")
    ).collect()[0]["s"]
    b = (
        exp_avg_detector(skewed_series.repartition(17))
        .filter(F.col("series_key") == "hot")
        .agg(F.sum("score").alias("s"))
        .collect()[0]["s"]
    )
    assert a == pytest.approx(b, rel=1e-12)


def test_aqe_splits_skewed_join(spark, skewed_series):
    """With skew thresholds scaled down to local data volumes, AQE must
    mark and split the hot partition of a shuffle join on series_key —
    the runtime behavior SCALE.md's skew story relies on."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # NB: no manual repartition on either input — OptimizeSkewedJoin
        # only rewrites shuffles whose origin is ENSURE_REQUIREMENTS, so a
        # user repartition() on the dim side would silently disable it.
        # No keyed operator downstream either (it would make the split
        # introduce an extra shuffle, which AQE declines by default).
        dim = spark.createDataFrame(
            [("hot", 1.0)] + [(f"c{i}", 2.0) for i in range(50)],
            "series_key string, weight double",
        )
        joined = skewed_series.join(dim, "series_key").select(
            (F.col("value") * F.col("weight")).alias("wv")
        )
        rows = joined.collect()
        assert len(rows) == 200_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
        assert "AQEShuffleRead" in final_plan and "skewed" in final_plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_two_phase_cap_row_identical_to_single_window(spark):
    """The skew-safe two-phase cap must reproduce the one-window
    source_cap exactly — keep-set AND ranks — on a hot-group frame,
    for any salt count (including n_salts=1, the degenerate case)."""
    from potoos_spark.operators.curate import source_cap
    from potoos_spark.operators.skew import two_phase_cap

    rows = [(i, "hot") for i in range(5000)] + [
        (10_000 + i, f"cold{i % 7}") for i in range(70)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    want = sorted(map(tuple, source_cap(df, cap=10).collect()))
    for n_salts in (1, 8, 32):
        got = sorted(map(tuple, two_phase_cap(df, cap=10, n_salts=n_salts).collect()))
        assert got == want, n_salts


def test_global_rank_matches_single_window(spark):
    """global_rank must reproduce the one-task Window.orderBy
    row_number exactly, for any n_parts (including n_parts=1 and more
    partitions than rows)."""
    from pyspark.sql import Window as W, functions as F

    from potoos_spark.operators.skew import global_rank

    df = spark.range(1000).select(
        (F.col("id") * 37 % 101).alias("v"), F.col("id").alias("i")
    )
    w = W.orderBy("v", "i")
    want = sorted(
        (r["v"], r["i"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("bigint")).collect()
    )
    for n_parts in (1, 7, 32, 2000):
        got = sorted(
            (r["v"], r["i"], r["rank"])
            for r in global_rank(df, ["v", "i"], n_parts=n_parts).collect()
        )
        assert got == want, n_parts
    spark.catalog.clearCache()


def test_global_ntile_matches_ansi_ntile(spark):
    """global_ntile must equal SQL NTILE(n) bit-for-bit, including the
    uneven-remainder layout (first t%n tiles one row larger) and the
    t < n degenerate case."""
    from pyspark.sql import Window as W, functions as F

    from potoos_spark.operators.skew import global_ntile

    for t, n in ((1003, 10), (10, 10), (7, 10), (100, 7)):
        df = spark.range(t).select(
            (F.col("id") * 13 % 89).alias("v"), F.col("id").alias("i")
        )
        w = W.orderBy("v", "i")
        want = sorted(
            (r["v"], r["i"], r["nt"])
            for r in df.withColumn("nt", F.ntile(n).over(w).cast("bigint")).collect()
        )
        got = sorted(
            (r["v"], r["i"], r["tile"])
            for r in global_ntile(df, ["v", "i"], n, n_parts=8).collect()
        )
        assert got == want, (t, n)
    spark.catalog.clearCache()


def test_global_rank_plan_has_no_global_window(spark):
    """The executed plan must not contain a partition-less Window (the
    single-task global sort global_rank exists to avoid): every Window
    operator must be partitioned."""
    import re

    from pyspark.sql import functions as F

    from potoos_spark.operators.skew import global_rank

    df = spark.range(100).select(
        (F.col("id") % 11).alias("v"), F.col("id").alias("i")
    )
    plan = (
        global_rank(df, ["v", "i"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for m in re.finditer(r"Window \[.*?\]", plan):
        assert "__pid" in m.group(0), m.group(0)
    spark.catalog.clearCache()


def test_global_cumsum_matches_single_window(spark):
    """Bit-equality with the single-task global-window cumsum across
    partition counts, descending order, and DECIMAL values — the exact
    contract q_abc_classification / corpus_coverage_curve rely on."""
    from pyspark.sql import Window as W

    from potoos_spark.operators.skew import global_cumsum

    df = spark.range(977).select(
        F.col("id").alias("i"),
        ((F.col("id") * 37) % 211).cast("decimal(18,2)").alias("v"),
    )
    w = W.orderBy(F.col("v").desc(), "i").rowsBetween(
        W.unboundedPreceding, 0
    )
    want = {
        (r["i"], str(r["c"]))
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    for n_parts in (2, 7, 32):
        got = {
            (r["i"], str(r["c"]))
            for r in global_cumsum(
                df,
                [F.col("v").desc(), "i"],
                "v",
                out_col="c",
                n_parts=n_parts,
            ).collect()
        }
        assert got == want, n_parts
    spark.catalog.clearCache()


def test_global_cumsum_bigint_ascending(spark):
    from pyspark.sql import Window as W

    from potoos_spark.operators.skew import global_cumsum

    df = spark.range(500).select(
        F.col("id").alias("i"), (F.col("id") % 11).alias("v")
    )
    w = W.orderBy("i").rowsBetween(W.unboundedPreceding, 0)
    want = [
        (r["i"], r["c"])
        for r in df.withColumn("c", F.sum("v").over(w)).orderBy("i").collect()
    ]
    got = [
        (r["i"], r["c"])
        for r in global_cumsum(df, ["i"], "v", out_col="c", n_parts=5)
        .orderBy("i")
        .collect()
    ]
    assert got == want
    spark.catalog.clearCache()


def test_global_cumsum_rejects_float(spark):
    from potoos_spark.operators.skew import global_cumsum

    df = spark.range(10).select(
        F.col("id").alias("i"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ValueError, match="order-sensitive"):
        global_cumsum(df, ["i"], "v")


def test_swapped_catalog_entries_have_no_global_window(spark):
    """q_abc_classification, q_ltv_deciles, and corpus_coverage_curve
    moved off single-task global windows onto the two-phase machinery;
    every Window in their executed plans must mention __pid (either
    partitioned by it, or the ≤ n_parts offset relation ordered by
    it)."""
    import re

    from potoos_spark.catalog import CATALOG

    sf = "/root/testdata/sf0.001"
    for name in (
        "q_abc_classification",
        "q_ltv_deciles",
        "corpus_coverage_curve",
        "q_skyline",
    ):
        plan = (
            CATALOG[name]
            .fn(spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for m in re.finditer(r"Window \[.*?\]", plan):
            assert "__pid" in m.group(0), (name, m.group(0))
    spark.catalog.clearCache()


def test_global_cummax_matches_single_window(spark):
    """Inclusive and strict-predecessor (exclusive) running max, bit
    equal to the one-window form across partition counts — including
    the NULL-only-for-the-global-first-row exclusive contract the
    skyline sweep relies on."""
    from pyspark.sql import Window as W

    from potoos_spark.operators.skew import global_cummax

    df = spark.range(600).select(
        F.col("id").alias("i"),
        ((F.col("id") * 89) % 331).cast("double").alias("v"),
    )
    for inclusive in (True, False):
        end = 0 if inclusive else -1
        w = W.orderBy("i").rowsBetween(W.unboundedPreceding, end)
        want = [
            (r["i"], r["m"])
            for r in df.withColumn("m", F.max("v").over(w))
            .orderBy("i")
            .collect()
        ]
        for n_parts in (3, 32):
            got = [
                (r["i"], r["m"])
                for r in global_cummax(
                    df, ["i"], "v", out_col="m",
                    n_parts=n_parts, inclusive=inclusive,
                )
                .orderBy("i")
                .collect()
            ]
            assert got == want, (inclusive, n_parts)
    spark.catalog.clearCache()


def test_scd2_history_collapses_runs_and_closes_intervals(spark, tmp_path):
    """r6 SCD type-2: consecutive runs of the same state collapse to
    one versioned row; intervals are half-open ([from, next_from-1]),
    only the last version per user is current, and simultaneous events
    order deterministically by event_id."""
    import datetime

    from potoos_spark.catalog import CATALOG

    rows = [
        # user 1: A A B A  -> 3 versions (run of A collapses)
        (101, datetime.datetime(2024, 1, 1, 0, 0, 1), 1, "A", 1.0, "{}"),
        (102, datetime.datetime(2024, 1, 1, 0, 0, 2), 1, "A", 1.0, "{}"),
        (103, datetime.datetime(2024, 1, 1, 0, 0, 3), 1, "B", 1.0, "{}"),
        (104, datetime.datetime(2024, 1, 1, 0, 0, 4), 1, "A", 1.0, "{}"),
        # user 2: two events at the SAME ts -> event_id breaks the tie
        (202, datetime.datetime(2024, 1, 1, 0, 0, 5), 2, "Y", 1.0, "{}"),
        (201, datetime.datetime(2024, 1, 1, 0, 0, 5), 2, "X", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sfdir")
    df.write.parquet(f"{d}/events.parquet")
    got = sorted(
        map(tuple, CATALOG["q_scd2_history"].fn(spark, d).collect())
    )
    ms = lambda s: int(datetime.datetime(2024, 1, 1, 0, 0, s, tzinfo=datetime.timezone.utc).timestamp() * 1000)
    assert got == sorted([
        (1, "A", 1, ms(1), ms(3) - 1, False),
        (1, "B", 2, ms(3), ms(4) - 1, False),
        (1, "A", 3, ms(4), None, True),
        (2, "X", 1, ms(5), ms(5) - 1, False),  # tie: event_id 201 first
        (2, "Y", 2, ms(5), None, True),
    ])


def test_attribution_first_touch_and_purchase_rollup(spark, monkeypatch):
    """r7 first-touch attribution: the earliest event (ts, then seq)
    defines the channel; all the user's purchase value lands there;
    users without purchases still count in n_users."""
    import potoos_spark.catalog.relational_tpch as R
    from pyspark.sql import functions as F

    rows = [
        # user 1: ts tie at 1000 -> seq 1 (click) is the first touch
        (1, 1, "click", 1000, 2.0),
        (2, 1, "view", 1000, 0.0),
        (3, 1, "purchase", 2000, 10.0),
        (4, 1, "purchase", 3000, 5.5),
        # user 2: first touch 'view', never buys
        (5, 2, "view", 500, 0.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, "
        "ts_ms bigint, value double",
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"), "value",
    )
    monkeypatch.setattr(R, "table", lambda spark, sf_dir, name: ev)
    got = {r["first_touch"]: r for r in R._attribution_fn(spark, "x").collect()}
    assert set(got) == {"click", "view"}
    c, v = got["click"], got["view"]
    assert (c["n_users"], c["n_purchases"], c["attributed_value"]) == (1, 2, 15.5)
    assert (v["n_users"], v["n_purchases"], v["attributed_value"]) == (1, 0, 0.0)
