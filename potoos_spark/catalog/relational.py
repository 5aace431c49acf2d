"""Oracle-checked catalog: the relational operator corpus.

The reference has no joins/set-ops/grouping-sets/window-rank/scalar
functions (SURVEY.md §2.6) — Spark provides them natively; this module
pins their semantics against DuckDB on the TPC-H-shaped driver tables.
Money math accumulates in narrow DECIMALs (qty dec(8,2), price
dec(12,2), disc/tax dec(4,2)) so products stay inside both engines'
38-digit limit and sums are exact → bit-identical doubles after the
final cast. Dates are emitted as formatted strings (timezone-proof);
keys are cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F, Window as W

from ..operators.asof import asof_join
from .common import EVENTS_SQL, QuerySpec, table


def _qty(c):
    return F.col(c).cast("decimal(8,2)")


def _price(c):
    return F.col(c).cast("decimal(12,2)")


def _pct(c):  # discount / tax
    return F.col(c).cast("decimal(4,2)")


_ONE = "CAST(1 AS DECIMAL(4,2))"


# --- Q1: pricing summary (full classic shape) -----------------------------

def _q1_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    disc_price = _price("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _pct("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + _pct("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_qty("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_price("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_qty("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_price("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_pct("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(4,2))) * ({_ONE} + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_REV = f"CAST(l_extendedprice AS DECIMAL(12,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(4,2)))"


# --- Q3: shipping priority (adapted: o_orderpriority for shippriority) ----

def _q3_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    rev = _price("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _pct("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


# --- Q5: local supplier volume (ASIA) --------------------------------------

def _q5_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _price("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _pct("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_Q5_SQL = f"""
SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --- Q6: forecast revenue change -------------------------------------------

def _q6_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_price("l_extendedprice") * _pct("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- top-N, windows, grouping sets, set-ops, scalars -----------------------

def _top_customers_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_price("o_totalprice")).cast("double").alias("total_spend"),
             F.count("*").alias("n_orders"))
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(10)
    )


_TOP_CUST_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey LIMIT 10
"""


def _window_rank_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


_WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3
"""


def _running_total_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_price("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def _rollup_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_qty("l_quantity")).cast("double").alias("sum_qty"),
             F.count("*").alias("n"))
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def _cube_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum(_price("o_totalprice")).cast("double").alias("total"),
             F.count("*").alias("n"))
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def _semi_join_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def _anti_join_fn(spark, sf_dir):
    # customers with no pending ('P') order — discriminative at sf0.01
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def _distinct_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_mktsegment", F.col("c_nationkey").cast("bigint").alias("c_nationkey")
    ).distinct()


_DISTINCT_SQL = (
    "SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer"
)


def _pivot_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", _qty("l_quantity")))
        .cast("double")
        .alias("qty_o"),
        F.sum(F.when(F.col("l_linestatus") == "F", _qty("l_quantity")))
        .cast("double")
        .alias("qty_f"),
    )


_PIVOT_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(8,2)) END) AS DOUBLE) AS qty_o,
  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(8,2)) END) AS DOUBLE) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


def _percentile_fn(spark, sf_dir):
    # discrete percentiles via ranked windows — no interpolation, so both
    # engines pick the identical stored double
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("o_orderpriority")).alias("n"),
    )
    return (
        ranked.filter(
            (F.col("rn") == F.ceil(F.col("n") * 0.5))
            | (F.col("rn") == F.ceil(F.col("n") * 0.9))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("o_totalprice"))).alias("p50"),
            F.min(F.when(F.col("rn") == F.ceil(F.col("n") * 0.9), F.col("o_totalprice"))).alias("p90"),
        )
    )


_PERCENTILE_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders)
SELECT o_orderpriority,
  MIN(CASE WHEN rn = CEIL(n * 0.5) THEN o_totalprice END) AS p50,
  MIN(CASE WHEN rn = CEIL(n * 0.9) THEN o_totalprice END) AS p90
FROM ranked WHERE rn = CEIL(n * 0.5) OR rn = CEIL(n * 0.9)
GROUP BY o_orderpriority
"""


def _asof_events_fn(spark, sf_dir):
    from .common import events_frame

    ev = events_frame(spark, sf_dir)
    clicks = ev.filter(F.col("series_key") == "click").select(
        F.lit("x").alias("k"), "ts_ms", F.col("value").alias("click_value")
    )
    errors = ev.filter(F.col("series_key") == "error").select(
        F.lit("x").alias("k"), "ts_ms", F.col("value").alias("error_value")
    )
    out = asof_join(clicks, errors, on="k", left_ts="ts_ms", right_ts="ts_ms")
    return out.select("ts_ms", "click_value", "error_value")


_ASOF_EVENTS_SQL = f"""
WITH series AS ({EVENTS_SQL}),
c AS (SELECT ts_ms, value AS click_value FROM series WHERE series_key = 'click'),
e AS (SELECT ts_ms AS e_ts, value AS error_value FROM series WHERE series_key = 'error')
SELECT c.ts_ms, c.click_value, e.error_value
FROM c ASOF LEFT JOIN e ON c.ts_ms >= e.e_ts
"""


def _asof_forward_fn(spark, sf_dir):
    """Forward as-of: each click matched to the next error at-or-after
    it (same union+window composition, descending carry)."""
    from .common import events_frame

    ev = events_frame(spark, sf_dir)
    clicks = ev.filter(F.col("series_key") == "click").select(
        F.lit("x").alias("k"), "ts_ms", F.col("value").alias("click_value")
    )
    errors = ev.filter(F.col("series_key") == "error").select(
        F.lit("x").alias("k"), "ts_ms", F.col("value").alias("error_value")
    )
    out = asof_join(
        clicks, errors, on="k", left_ts="ts_ms", right_ts="ts_ms",
        direction="forward",
    )
    return out.select("ts_ms", "click_value", "error_value")


_ASOF_FORWARD_SQL = f"""
WITH series AS ({EVENTS_SQL}),
c AS (SELECT ts_ms, value AS click_value FROM series WHERE series_key = 'click'),
e AS (SELECT ts_ms AS e_ts, value AS error_value FROM series WHERE series_key = 'error')
SELECT c.ts_ms, c.click_value, e.error_value
FROM c ASOF LEFT JOIN e ON c.ts_ms <= e.e_ts
"""


def _lateral_topk_fn(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 customers by balance per
    nation) through the SQL front door — Catalyst decorrelates the
    per-row limit into a ranked window, so the physical plan is one
    shuffle, not nested execution."""
    table(spark, sf_dir, "nation").createOrReplaceTempView("pv_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("pv_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM pv_nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM pv_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        """
    )


_LATERAL_TOPK_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) t
"""


def _scalar_string_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
    )


_SCALAR_STRING_SQL = """
SELECT c_custkey, UPPER(c_mktsegment) AS seg_upper, SUBSTRING(c_name, 1, 8) AS name_prefix,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       c_mktsegment || '|' || c_name AS seg_name
FROM customer
"""


def _scalar_date_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
        )
        .agg(F.count("*").alias("n"))
    )


_SCALAR_DATE_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo, COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""




def _asof_nearest_fn(spark, sf_dir):
    """Nearest-direction as-of: each click takes the closer of the last
    error before it and the first error after it (ties to the past)."""
    from .common import events_frame
    from ..operators.asof import nearest_asof_join

    ev = events_frame(spark, sf_dir)
    clicks = ev.filter(F.col("series_key") == "click").select(
        F.lit("x").alias("k"), "seq", "ts_ms", F.col("value").alias("click_value")
    )
    errors = ev.filter(F.col("series_key") == "error").select(
        F.lit("x").alias("k"), "ts_ms", F.col("value").alias("error_value")
    )
    out = nearest_asof_join(
        clicks, errors, on="k", left_ts="ts_ms", right_ts="ts_ms"
    )
    return out.select("ts_ms", "click_value", "error_value")


_ASOF_NEAREST_SQL = f"""
WITH series AS ({EVENTS_SQL}),
c AS (SELECT seq, ts_ms, value AS click_value FROM series WHERE series_key = 'click'),
e AS (SELECT ts_ms AS e_ts, value AS error_value FROM series WHERE series_key = 'error'),
b AS (SELECT c.seq, c.ts_ms, c.click_value, e.e_ts AS b_ts, e.error_value AS b_val
      FROM c ASOF LEFT JOIN e ON c.ts_ms >= e.e_ts),
f AS (SELECT c.seq, e.e_ts AS f_ts, e.error_value AS f_val
      FROM c ASOF LEFT JOIN e ON c.ts_ms <= e.e_ts)
SELECT b.ts_ms, b.click_value,
       CASE WHEN b.b_ts IS NOT NULL
                 AND (f.f_ts IS NULL OR (b.ts_ms - b.b_ts) <= (f.f_ts - b.ts_ms))
            THEN b.b_val ELSE f.f_val END AS error_value
FROM b JOIN f USING (seq)
"""


QUERIES: dict[str, QuerySpec] = {
    "q1_pricing_summary": QuerySpec(_q1_fn, _Q1_SQL),
    "q3_shipping_priority": QuerySpec(_q3_fn, _Q3_SQL),
    "q5_region_volume": QuerySpec(_q5_fn, _Q5_SQL),
    "q6_revenue": QuerySpec(_q6_fn, _Q6_SQL),
    "q_top_customers": QuerySpec(_top_customers_fn, _TOP_CUST_SQL),
    "q_window_rank": QuerySpec(_window_rank_fn, _WINDOW_RANK_SQL),
    "q_running_total": QuerySpec(_running_total_fn, _RUNNING_SQL),
    "q_rollup": QuerySpec(_rollup_fn, _ROLLUP_SQL),
    "q_cube": QuerySpec(_cube_fn, _CUBE_SQL),
    "q_semi_join": QuerySpec(_semi_join_fn, _SEMI_SQL),
    "q_anti_join": QuerySpec(_anti_join_fn, _ANTI_SQL),
    "q_distinct": QuerySpec(_distinct_fn, _DISTINCT_SQL),
    "q_pivot": QuerySpec(_pivot_fn, _PIVOT_SQL),
    "q_percentile": QuerySpec(_percentile_fn, _PERCENTILE_SQL),
    "q_asof_events": QuerySpec(_asof_events_fn, _ASOF_EVENTS_SQL),
    "q_asof_forward": QuerySpec(_asof_forward_fn, _ASOF_FORWARD_SQL),
    "q_asof_nearest": QuerySpec(_asof_nearest_fn, _ASOF_NEAREST_SQL),
    "q_lateral_topk": QuerySpec(_lateral_topk_fn, _LATERAL_TOPK_SQL),
    "q_scalar_string": QuerySpec(_scalar_string_fn, _SCALAR_STRING_SQL),
    "q_scalar_date": QuerySpec(_scalar_date_fn, _SCALAR_DATE_SQL),
}
