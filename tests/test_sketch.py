"""Sketch tier: no SQL oracle (approximate by design) — instead pin
the HLL error envelope against exact distinct counts, and pin
mergeability (union of fine sketches ≈ coarse exact)."""

from __future__ import annotations

import duckdb
import pytest

from potoos_spark.operators.sketch import (
    approx_distinct,
    hll_distinct,
    hll_union_distinct,
)
from potoos_spark.catalog.common import table
from tests.conftest import SF_ORACLE_DIR

# lgConfigK=12 → ~1.6% RSE; 3σ ≈ 5%. approx_count_distinct rsd=0.05.
REL_TOL = 0.05


def _exact(by: str) -> dict:
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT {by}, COUNT(DISTINCT l_partkey) FROM "
        f"'{SF_ORACLE_DIR}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    con.close()
    return {r[0]: r[1] for r in rows}


@pytest.fixture(scope="module")
def exact_by_flag():
    return _exact("l_returnflag")


def _assert_close(approx: dict, exact: dict):
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= REL_TOL * e, (k, approx[k], e)


def test_hll_distinct_within_error(spark, exact_by_flag):
    li = table(spark, SF_ORACLE_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in hll_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    _assert_close(got, exact_by_flag)


def test_hll_union_matches_direct_sketch(spark, exact_by_flag):
    """Union of per-(flag,status) sketches ≈ the coarse exact count —
    the mergeability contract that makes sketches a rollup."""
    li = table(spark, SF_ORACLE_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in hll_union_distinct(
            li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_partkey"
        ).collect()
    }
    _assert_close(got, exact_by_flag)


def test_approx_count_distinct_within_rsd(spark, exact_by_flag):
    li = table(spark, SF_ORACLE_DIR, "lineitem")
    got = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in approx_distinct(li, ["l_returnflag"], "l_partkey").collect()
    }
    _assert_close(got, exact_by_flag)


def test_kll_quantiles_rank_error(spark):
    """KLL guarantees rank accuracy: the estimated p50/p95/p99 values
    must sit within ±4% *rank* of the target (default k ⇒ ~1.7% 1σ)."""
    import bisect

    from potoos_spark.catalog.common import events_frame
    from potoos_spark.operators.sketch import kll_quantiles

    ev = events_frame(spark, SF_ORACLE_DIR)
    got = {
        r["series_key"]: (r["p50"], r["p95"], r["p99"])
        for r in kll_quantiles(ev, ["series_key"], "value").collect()
    }
    con = duckdb.connect()
    exact = con.sql(
        "SELECT event_type, list_sort(list(value)) FROM "
        f"'{SF_ORACLE_DIR}/events.parquet' GROUP BY 1"
    ).fetchall()
    con.close()
    for key, values in exact:
        n = len(values)
        for est, target in zip(got[key], (0.5, 0.95, 0.99)):
            rank = bisect.bisect_left(values, est) / n
            assert abs(rank - target) <= 0.04, (key, target, rank)


def test_theta_overlap_bounds(spark):
    from pyspark.sql import functions as F

    from potoos_spark.operators.sketch import theta_overlap

    li = table(spark, SF_ORACLE_DIR, "lineitem").select(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    )
    row = theta_overlap(li, "yr", "l_partkey", 1996, 1997).collect()[0]
    con = duckdb.connect()
    na, nb, ni = con.sql(
        f"""
        WITH a AS (SELECT DISTINCT l_partkey FROM '{SF_ORACLE_DIR}/lineitem.parquet'
                   WHERE year(l_shipdate) = 1996),
             b AS (SELECT DISTINCT l_partkey FROM '{SF_ORACLE_DIR}/lineitem.parquet'
                   WHERE year(l_shipdate) = 1997)
        SELECT (SELECT COUNT(*) FROM a), (SELECT COUNT(*) FROM b),
               (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        """
    ).fetchall()[0]
    con.close()
    assert abs(row["n_a"] - na) <= 0.05 * na
    assert abs(row["n_b"] - nb) <= 0.05 * nb
    assert abs(row["n_intersection"] - ni) <= 0.10 * max(ni, 1)
    assert abs(row["n_only_a"] - (na - ni)) <= 0.10 * max(na - ni, 1)


def test_kmv_distinct_exact_small_groups_and_error_envelope(spark):
    """Groups with <= k distinct values must be EXACT (the sketch holds
    the whole set); larger groups must estimate within the KMV standard
    error envelope (~1/sqrt(k-2), generous 3-sigma bound) and the
    estimate must be partitioning-independent (deterministic md5)."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.sketch import kmv_distinct

    small = spark.range(40).select(
        F.lit("small").alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    big = spark.range(20_000).select(
        F.lit("big").alias("g"),
        F.concat(F.lit("w"), (F.col("id") % 5_000)).alias("v"),
    )
    df = small.unionAll(big)
    rows = {r["g"]: r for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert rows["small"]["exact_distinct"] == 40
    assert rows["small"]["est_distinct"] == 40.0 and rows["small"]["rel_err"] == 0.0
    assert rows["big"]["exact_distinct"] == 5_000
    assert rows["big"]["k_used"] == 64
    assert abs(rows["big"]["rel_err"]) <= 3.0 / (62 ** 0.5)  # 3 sigma
    again = {
        r["g"]: r["est_distinct"]
        for r in kmv_distinct(df.repartition(13), ["g"], "v", k=64).collect()
    }
    assert again["big"] == rows["big"]["est_distinct"]


# --- deterministic md5 twins (r5: the catalog-wired, oracle-checked
# forms; the seeded DataSketches ops above remain library API) --------


def test_hll_md5_error_envelope_and_exact_column(spark):
    """Raw md5-HLL estimate within 3σ (1.04/sqrt(256) ≈ 6.5% RSE) of
    the true distinct count, and the exact_distinct diagnostic column
    IS the true count."""
    from potoos_spark.operators.sketch import hll_distinct_md5

    li = table(spark, SF_ORACLE_DIR, "lineitem")
    exact = _exact("l_returnflag")  # l_partkey grain
    rows = hll_distinct_md5(li, ["l_returnflag"], "l_partkey").collect()
    assert {r["l_returnflag"] for r in rows} == set(exact)
    for r in rows:
        e = exact[r["l_returnflag"]]
        assert r["exact_distinct"] == e
        assert abs(r["rel_err"]) <= 3 * 1.04 / (256 ** 0.5), r
        assert r["est_distinct"] == pytest.approx(e * (1 + r["rel_err"]))


def test_hll_md5_union_merge_equals_direct_build(spark):
    """Register-wise max merge of fine sketches must equal building the
    coarse sketch directly — bit-for-bit, not approximately (max is
    associative/idempotent). This is the mergeability contract."""
    from potoos_spark.operators.sketch import hll_distinct_md5, hll_union_md5

    li = table(spark, SF_ORACLE_DIR, "lineitem")
    merged = {
        r["l_returnflag"]: r["est_distinct"]
        for r in hll_union_md5(
            li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_orderkey"
        ).collect()
    }
    direct = {
        r["l_returnflag"]: r["est_distinct"]
        for r in hll_distinct_md5(li, ["l_returnflag"], "l_orderkey").collect()
    }
    assert merged == direct


def test_sampled_quantiles_md5_partitioning_independent(spark):
    """The md5 row sample (unlike df.sample) must not depend on the
    physical partitioning, and the quantiles must be ordered values
    drawn from the sample."""
    from potoos_spark.catalog.common import events_frame
    from potoos_spark.operators.sketch import sampled_quantiles_md5

    ev = events_frame(spark, SF_ORACLE_DIR)
    a = sorted(
        sampled_quantiles_md5(ev, ["series_key"], "value", "seq").collect()
    )
    b = sorted(
        sampled_quantiles_md5(
            ev.repartition(17), ["series_key"], "value", "seq"
        ).collect()
    )
    assert a == b
    n_total = ev.count()
    for r in a:
        assert r["p50"] <= r["p95"] <= r["p99"]
        # ~1/8 sample per series (5 series, binomial slack)
        assert 0.08 * n_total / 5 <= r["n_sampled"] <= 0.18 * n_total / 5


def test_sampled_quantiles_md5_rank_error_vs_exact(spark):
    """DKW-style sanity: the sampled p50 lands within a generous rank
    band of the exact per-series p50 (n≈250 ⇒ ε ≈ 1.22/sqrt(n) ≈ 0.077
    at 95%; assert 3x that)."""
    from potoos_spark.catalog.common import events_frame
    from potoos_spark.operators.sketch import sampled_quantiles_md5

    ev = events_frame(spark, SF_ORACLE_DIR)
    got = {
        r["series_key"]: r["p50"]
        for r in sampled_quantiles_md5(
            ev, ["series_key"], "value", "seq"
        ).collect()
    }
    con = duckdb.connect()
    ranks = {
        k: con.sql(
            "SELECT CAST(SUM(CASE WHEN value <= ? THEN 1 ELSE 0 END) AS DOUBLE)"
            " / COUNT(*) FROM "
            f"'{SF_ORACLE_DIR}/events.parquet' WHERE event_type = ?"
        , params=[v, k]).fetchone()[0]
        for k, v in got.items()
    }
    con.close()
    for k, frac in ranks.items():
        assert abs(frac - 0.5) <= 0.25, (k, frac)


def test_kmv_theta_overlap_exact_when_small(spark):
    """Both sides ≤ k ⇒ θ = 1.0 and every output is EXACT set algebra."""
    from potoos_spark.operators.sketch import kmv_theta_overlap

    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(20, 70)]
    df = spark.createDataFrame(rows, "p string, key long")
    got = kmv_theta_overlap(df, "p", "key", "a", "b", k=64).collect()[0]
    assert (got["n_a"], got["n_b"]) == (40, 50)
    assert got["n_intersection"] == 20
    assert got["n_only_a"] == 20


def test_kmv_theta_overlap_error_envelope(spark):
    """Estimator branch (sides ≫ k): every estimate within 3σ ≈
    3/sqrt(256) of truth on the sf0.01 lineitem year overlap."""
    from pyspark.sql import functions as F
    from potoos_spark.operators.sketch import kmv_theta_overlap

    li = table(spark, SF_ORACLE_DIR, "lineitem").select(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    )
    got = kmv_theta_overlap(li, "yr", "l_partkey", 1996, 1997, k=256).collect()[0]
    con = duckdb.connect()
    a, b, inter = con.sql(
        f"""WITH d AS (SELECT DISTINCT year(l_shipdate) AS y, l_partkey AS k
        FROM '{SF_ORACLE_DIR}/lineitem.parquet' WHERE year(l_shipdate) IN (1996, 1997))
        SELECT COUNT(DISTINCT k) FILTER (y = 1996),
               COUNT(DISTINCT k) FILTER (y = 1997),
               COUNT(*) - COUNT(DISTINCT k) FROM d"""
    ).fetchone()
    con.close()
    tol = 3.0 / (256 ** 0.5)
    assert abs(got["n_a"] - a) <= tol * a
    assert abs(got["n_b"] - b) <= tol * b
    assert abs(got["n_intersection"] - inter) <= tol * inter
    assert abs(got["n_only_a"] - (a - inter)) <= 3 * tol * max(a - inter, 50)


def test_kmv_union_merge_equals_direct_and_exact_branch(spark):
    """Two-level fine→coarse bottom-k merge must equal the direct
    coarse sketch (pigeonhole containment), including when one fine
    group overflows k and others don't; a coarse group with < k
    distinct values is EXACT."""
    from pyspark.sql import functions as F
    from potoos_spark.operators.sketch import kmv_distinct, kmv_union

    K = 32
    rows = (
        # coarse 'big': fine 'x' has 200 values, fine 'y' has 5
        # (overlapping x), true nd = 200
        [("big", "x", i) for i in range(200)]
        + [("big", "y", i) for i in range(5)]
        # coarse 'small': 7 distinct values split across two fines
        + [("small", "x", i) for i in range(4)]
        + [("small", "y", i) for i in range(3, 7)]
    )
    df = spark.createDataFrame(rows, "g string, g2 string, v long")
    merged = {
        r["g"]: r for r in kmv_union(df, ["g", "g2"], ["g"], "v", k=K).collect()
    }
    assert merged["small"]["exact_distinct"] == 7
    assert merged["small"]["est_distinct"] == 7.0  # nd < k branch: exact
    assert merged["small"]["k_used"] == 7
    assert merged["big"]["exact_distinct"] == 200
    assert merged["big"]["k_used"] == K
    # fixed deterministic fixture: the md5 draw for 0..199 lands at
    # +24% with k=32 (2.4 sigma less lucky than average); assert a
    # 4-sigma envelope so the check guards estimator bugs, not luck
    assert abs(merged["big"]["rel_err"]) <= 4.0 / (K ** 0.5)

    # the estimator branch of the direct sketch must agree bit-for-bit
    direct = {
        r["g"]: r for r in kmv_distinct(
            df.select("g", F.col("v").cast("string").alias("v")), ["g"], "v", k=K
        ).collect()
    }
    assert merged["big"]["est_distinct"] == direct["big"]["est_distinct"]


def test_kmv_salted_row_identical_to_direct(spark):
    """The two-level salted form must reproduce kmv_distinct
    BIT-FOR-BIT (pigeonhole: every global bottom-k hash ranks <= k in
    its own salt slice), across salt counts and on a skewed input
    where one group holds most of the distinct values."""
    from pyspark.sql import functions as F
    from potoos_spark.operators.sketch import kmv_distinct, kmv_distinct_salted

    rows = [("hot", i) for i in range(5000)] + [
        (f"cold{i % 7}", i) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v long").select(
        "g", F.col("v").cast("string").alias("v")
    )
    direct = sorted(map(tuple, kmv_distinct(df, ["g"], "v", k=32).collect()))
    for n_salts in (2, 8, 32):
        salted = sorted(
            map(tuple, kmv_distinct_salted(df, ["g"], "v", k=32, n_salts=n_salts).collect())
        )
        assert salted == direct, n_salts


def test_kmv_salted_phase1_windows_are_salt_partitioned(spark):
    """Every Window in the salted plan is partitioned (no global sort);
    phase 1 partitions by (group, salt)."""
    from pyspark.sql import functions as F
    from potoos_spark.operators.sketch import kmv_distinct_salted

    df = spark.createDataFrame([("g", str(i)) for i in range(100)], "g string, v string")
    plan = (
        kmv_distinct_salted(df, ["g"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan  # the salt key reaches the physical window


def test_cms_merge_and_bloom_union_equal_direct(spark):
    """Cell-wise CMS addition and Bloom bit-set union must reproduce
    the direct whole-corpus sketches bit-for-bit (linearity / set
    union) — asserted against the direct operators, not just the
    shared oracle."""
    from pyspark.sql import functions as F
    from potoos_spark.operators.sketch import (
        bloom_probe,
        bloom_union,
        count_min_counters,
        count_min_merge,
    )

    ev = table(spark, SF_ORACLE_DIR, "events")
    direct = sorted(map(tuple, count_min_counters(ev, "user_id").collect()))
    merged = sorted(map(tuple, count_min_merge(ev, "user_id", "event_type").collect()))
    assert merged == direct

    cust = table(spark, SF_ORACLE_DIR, "customer")
    build = cust.filter(F.col("c_acctbal") > 5000)
    d = sorted(map(tuple, bloom_probe(build, cust, "c_custkey", "c_custkey", m=65536).collect()))
    u = sorted(map(tuple, bloom_union(build, cust, "c_custkey", "c_custkey", "c_nationkey", m=65536).collect()))
    assert u == d
