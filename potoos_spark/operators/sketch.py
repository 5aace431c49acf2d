"""Approximate mergeable sketches (extension tier; no reference
file:line — SURVEY.md §2.6 gap list).

At 100 TB an exact ``COUNT(DISTINCT)`` over a high-cardinality key
shuffles every distinct value at least once. A sketch is an *algebraic
partial*: each task folds its partition into a fixed-size summary
(~KBs), the shuffle moves sketches instead of rows, and the final
merge is associative — the same partial→final shape Spark's
HashAggregate already uses, but with O(1)-size state per group. The
sketches below are Apache DataSketches HLL via the built-in
``hll_sketch_agg`` / ``hll_union_agg`` functions (JVM-side, codegen
friendly; no Python in the hot path), so sketches built per
partition / per day / per table are re-mergeable later — the rollup
store (operators/rollup.py) pattern applied to distinct counts.

Error envelope: HLL with lgConfigK=12 ⇒ ~1.6% relative standard
error; tests/test_sketch.py pins |approx − exact| / exact against a
generous 3σ bound at sf0.01.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

DEFAULT_LGK = 12


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group: one HLL sketch per
    group, estimated to a BIGINT ``approx_distinct`` column."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).alias("approx_distinct")
    )


def hll_union_distinct(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Two-level distinct count demonstrating mergeability: build one
    sketch per fine group (e.g. per (flag, status) — in production per
    partition/day), then union the *sketches* up to the coarse group
    and estimate. The fine sketches are reusable for any coarser
    grouping — distinct counts become a rollup, not a rescan."""
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sk")
    )
    return fine.groupBy(*coarse_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct")
    )


def kll_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Approximate quantiles per group via a KLL sketch (DataSketches):
    fixed-size mergeable state per group, so percentiles over 100 TB
    are one partial→final pass — and per-partition/day sketches can be
    merged later (``kll_merge_agg_double``) like the HLL rollup."""
    sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"))
    qs = F.kll_sketch_get_quantile_double(
        sk, F.array(*[F.lit(float(p)) for p in probs])
    )
    out = df.groupBy(*group_cols).agg(qs.alias("__qs"))
    cols = [F.col("__qs").getItem(i).alias(f"p{int(p * 100)}") for i, p in enumerate(probs)]
    return out.select(*group_cols, *cols)


def theta_overlap(
    df: DataFrame,
    part_col: str,
    key_col: str,
    part_a,
    part_b,
) -> DataFrame:
    """Set algebra on sketches: estimate |A|, |B|, |A∩B|, |A\\B| of the
    distinct ``key_col`` sets of two partitions without materializing
    either set — theta sketches support intersection/difference, which
    HLL cannot. The audience-overlap / leakage-check primitive: at
    100 TB each side reduces to a KB-scale sketch before they meet."""
    sk = df.groupBy(part_col).agg(F.theta_sketch_agg(key_col).alias("sk"))
    a = sk.filter(F.col(part_col) == part_a).select(F.col("sk").alias("sk_a"))
    b = sk.filter(F.col(part_col) == part_b).select(F.col("sk").alias("sk_b"))
    j = a.crossJoin(b)
    return j.select(
        F.theta_sketch_estimate("sk_a").cast("bigint").alias("n_a"),
        F.theta_sketch_estimate("sk_b").cast("bigint").alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).cast("bigint").alias("n_intersection"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_a", "sk_b")
        ).cast("bigint").alias("n_only_a"),
    )


def approx_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """HLL++ variant (``approx_count_distinct``) — the one-shot form
    when no sketch reuse is needed."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )
