"""Catalog: sketch tier (rows-only — approximate by design, so there
is no hash-matchable SQL oracle; tests/test_sketch.py pins the error
envelope against exact counts instead)."""

from __future__ import annotations

from ..operators.sketch import hll_distinct, hll_union_distinct
from .common import QuerySpec, table


def _hll_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_distinct(li, ["l_returnflag"], "l_partkey")


def _hll_union_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_union_distinct(
        li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_partkey"
    )


QUERIES: dict[str, QuerySpec] = {
    "sketch_distinct_hll": QuerySpec(_hll_fn, None),
    "sketch_hll_union": QuerySpec(_hll_union_fn, None),
}
