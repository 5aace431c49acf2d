"""Data-quality constraint audit: planted violations must be counted
exactly, clean data must gate 0 everywhere, and the plan must stay
windowless scalar aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from potoos_spark.operators.audit import (
    audit,
    fk_violations,
    pk_duplicates,
    predicate_violations,
)


def _dirty(spark):
    parent = spark.createDataFrame([(1,), (2,)], "k bigint")
    child = spark.createDataFrame(
        [(1, 10.0), (1, -5.0), (3, 20.0), (None, 30.0)],
        "k bigint, v double",
    )
    dup = spark.createDataFrame([(7,), (7,), (8,)], "k bigint")
    return parent, child, dup


def test_planted_violations_counted_exactly(spark):
    parent, child, dup = _dirty(spark)
    got = {
        r["constraint"]: r["n_violations"]
        for r in audit([
            # k=3 unmatched + NULL k -> 2
            fk_violations(child, parent, "k", "k", "fk"),
            # two 7s -> 1 excess row
            pk_duplicates(dup, "k", "pk"),
            # v=-5 fails, NULL-free -> 1
            predicate_violations(child, F.col("v") > 0.0, "chk_pos"),
        ]).collect()
    }
    assert got == {"fk": 2, "pk": 1, "chk_pos": 1}


def test_null_predicate_is_a_violation(spark):
    df = spark.createDataFrame([(1.0,), (None,)], "v double")
    got = predicate_violations(df, F.col("v") > 0.0, "c").collect()[0]
    assert got["n_violations"] == 1  # the NULL row: NOT (NULL IS TRUE)


def test_clean_fixture_gates_zero_and_plan_windowless(spark):
    from potoos_spark.catalog import CATALOG
    from tests.conftest import SF_DIR

    df = CATALOG["q_constraint_audit"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 7
    assert all(r["n_violations"] == 0 for r in rows), rows
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_multi_predicate_single_scan_matches_singles(spark):
    """The fused per-table CHECK pass must count identically to the
    one-pass-per-rule form, including NULL-violates semantics."""
    from potoos_spark.operators.audit import predicate_violations_multi

    df = spark.createDataFrame(
        [(1.0, 5.0), (-1.0, None), (None, 60.0)], "a double, b double"
    )
    got = {
        r["constraint"]: r["n_violations"]
        for r in predicate_violations_multi(df, {
            "a_pos": F.col("a") > 0.0,          # -1 and NULL -> 2
            "b_range": F.col("b").between(0.0, 50.0),  # NULL and 60 -> 2
        }).collect()
    }
    assert got == {"a_pos": 2, "b_range": 2}


def test_gini_known_values(spark, tmp_path):
    """Gini on hand-checked vectors: all-equal spend -> (n-1)/(2n)·0?
    No — exact rank formula: equal x gives G = 0; one-holder-takes-all
    gives G = (n-1)/n."""
    from potoos_spark.catalog.relational_ext import QUERIES

    # synthesize a tiny sf_dir: 4 customers in one nation, one with all
    # the spend; 4 in another nation with equal spend
    import pyspark.sql.functions as F  # noqa: F811

    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "CONCENTRATED", 0, ""), (1, "UNIFORM", 0, "")],
        "n_nationkey bigint, n_name string, n_regionkey bigint, n_comment string",
    ).write.parquet(f"{sf}/nation.parquet")
    cust = [(i, 0) for i in range(4)] + [(i, 1) for i in range(4, 8)]
    spark.createDataFrame(
        cust, "c_custkey bigint, c_nationkey bigint"
    ).write.parquet(f"{sf}/customer.parquet")
    orders = [(100 + i, i, 0.0) for i in range(3)] + [(103, 3, 1000.0)]
    orders += [(200 + i, i, 250.0) for i in range(4, 8)]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).write.parquet(f"{sf}/orders.parquet")

    got = {
        r.n_name: (r.n_customers, r.gini)
        for r in QUERIES["q_gini"].fn(spark, sf).collect()
    }
    # concentrated: x=[0,0,0,1000] -> G = (2*4*1000 - 5*1000)/(4*1000) = 0.75
    assert got["CONCENTRATED"] == (4, 0.75)
    # uniform: G = (2*(1+2+3+4)*250 - 5*1000)/(4*1000) = 0
    assert got["UNIFORM"] == (4, 0.0)


def test_benford_digit_extraction_exact(spark, tmp_path):
    """First-digit extraction is integer-exact: 0.01 -> cents 1 ->
    digit 1; 9999.99 -> 999999 -> digit 9; 105.00 -> 10500 -> 1."""
    from potoos_spark.catalog.relational_ext import QUERIES

    sf = str(tmp_path)
    rows = [(1, 1, 0.01), (2, 1, 9999.99), (3, 1, 105.00), (4, 1, 105.00)]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).write.parquet(f"{sf}/orders.parquet")
    got = {r.digit: (r.n, r.obs_freq) for r in QUERIES["q_benford"].fn(spark, sf).collect()}
    assert got[1] == (3, 0.75) and got[9] == (1, 0.25)


def test_dtype_audit_covers_entire_catalog():
    """r10 (VERDICT r9 item 3, third round of off-by-latecomer): the
    committed dtype-audit report must cover EVERY catalog entry with
    zero mismatches. An entry added after the last full audit run turns
    this red until `python scripts/dtype_audit.py` is re-run — the
    audit is now a post-last-entry gate by construction, not a
    mid-round snapshot."""
    import json
    import os

    from potoos_spark.catalog import CATALOG

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "dtype_audit_report.json",
    )
    with open(path) as f:
        rep = json.load(f)
    assert rep["n_checked"] == len(CATALOG), (
        f"dtype audit covered {rep['n_checked']} of {len(CATALOG)} catalog "
        "entries — re-run scripts/dtype_audit.py after the last entry lands"
    )
    assert rep["mismatches"] == {}, rep["mismatches"]
    assert rep["errors"] == {}, rep["errors"]
