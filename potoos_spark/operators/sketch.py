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


def approx_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """HLL++ variant (``approx_count_distinct``) — the one-shot form
    when no sketch reuse is needed."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )
