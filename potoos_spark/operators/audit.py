"""Data-quality constraint audit: the dbt-test-style gate every
large-scale pipeline runs before publishing a table version (extension
tier — no reference file:line; SURVEY.md §2.6 north star).

Each check reduces to ONE bigint violation count; ``audit`` unions the
named counts into a single (constraint, n_violations) relation, so the
whole gate is one Spark job whose subtrees are scalar aggregates —
map-side-combinable counts, anti joins for referential integrity
(broadcast when the parent is a dim, shuffle when fact-to-fact), no
windows, no collects. At 100 TB the audit costs one scan per audited
table plus the FK join shuffles; everything else is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _count1(df: DataFrame, name: str) -> DataFrame:
    return df.agg(
        F.lit(name).alias("constraint"),
        F.count("*").cast("bigint").alias("n_violations"),
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, name: str
) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` (NULL
    keys count as violations — an FK must resolve)."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return _count1(child.select(child_key).join(p, child_key, "left_anti"), name)


def pk_duplicates(df: DataFrame, key: str, name: str) -> DataFrame:
    """Excess rows beyond one per key value: COUNT(*) − COUNT(DISTINCT
    key), as one aggregate (no self-join)."""
    return df.agg(
        F.lit(name).alias("constraint"),
        (F.count("*") - F.count_distinct(F.col(key))).cast("bigint").alias(
            "n_violations"
        ),
    )


def predicate_violations(df: DataFrame, ok: Column, name: str) -> DataFrame:
    """Rows where ``ok`` is not TRUE (NULL counts as a violation —
    constraints are three-valued-logic strict, like SQL CHECK with
    NOT ... IS TRUE)."""
    return _count1(df.filter(~ok.eqNullSafe(F.lit(True))), name)


def predicate_violations_multi(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """ALL of a table's CHECK constraints in ONE scan: each predicate
    becomes a conditional count in a single aggregate, then the wide
    row unpivots to (constraint, n_violations). At 100 TB this is the
    difference between one fact-table pass and one per rule."""
    aggs = [
        F.sum((~ok.eqNullSafe(F.lit(True))).cast("bigint")).alias(name)
        for name, ok in checks.items()
    ]
    wide = df.agg(*aggs)
    stacked = F.explode(
        F.array(*[
            F.struct(
                F.lit(name).alias("constraint"),
                F.coalesce(F.col(name), F.lit(0)).cast("bigint").alias(
                    "n_violations"
                ),
            )
            for name in checks
        ])
    )
    return wide.select(stacked.alias("__c")).select("__c.constraint", "__c.n_violations")


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union the named 1-row counts into one (constraint,
    n_violations) relation. Deterministic order by constraint name."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("constraint")
