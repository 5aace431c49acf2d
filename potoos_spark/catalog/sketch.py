"""Catalog: sketch tier (rows-only — approximate by design, so there
is no hash-matchable SQL oracle; tests/test_sketch.py pins the error
envelope against exact counts instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import (
    hll_distinct,
    hll_union_distinct,
    kll_quantiles,
    theta_overlap,
)
from .common import QuerySpec, events_frame, table


def _hll_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_distinct(li, ["l_returnflag"], "l_partkey")


def _hll_union_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_union_distinct(
        li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_partkey"
    )


def _kll_fn(spark, sf_dir):
    ev = events_frame(spark, sf_dir)
    return kll_quantiles(ev, ["series_key"], "value")


def _theta_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    )
    return theta_overlap(li, "yr", "l_partkey", 1996, 1997)


QUERIES: dict[str, QuerySpec] = {
    "sketch_distinct_hll": QuerySpec(_hll_fn, None),
    "sketch_hll_union": QuerySpec(_hll_union_fn, None),
    "sketch_kll_quantiles": QuerySpec(_kll_fn, None),
    "sketch_theta_overlap": QuerySpec(_theta_fn, None),
}
