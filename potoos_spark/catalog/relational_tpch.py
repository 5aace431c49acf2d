"""Oracle-checked catalog: deeper TPC-H-shaped coverage.

Second tranche of relational operators beyond ``relational.py`` /
``relational_ext.py`` (reference gap list, SURVEY.md §2.6): correlated
EXISTS (semi join with a non-equi conjunct), join + conditional-ratio
aggregation, HAVING over a grouped join, disjunctive multi-predicate
join pushdown, GROUPING SETS, lead/lag/ntile analytics, multi
COUNT(DISTINCT), an event-time range join, and batch session windows
(``session_window`` — the batch twin of the streaming session agg).

Same bit-exactness discipline as the rest of the catalog: money math
accumulates in DECIMAL, doubles are pass-through or derived with the
identical formula on both engines, dates become formatted strings, and
keys are BIGINT.

Scale notes (100 TB): q4/q18 group or semi-join on ``l_orderkey`` —
co-partitioned by the storage layout's bucketing (SCALE.md), so the
shuffle is avoidable; q14/q19 broadcast ``part`` (a dimension);
the range join is an equi-join on ``user_id`` with a bounded time
predicate, so rows co-locate by user and the window bound caps the
per-key fan-out; session windows shuffle once on the series key.
q13 left-joins on ``o_custkey`` (one shuffle, then a tiny
count-of-counts regroup); q17's per-part average and probe co-locate
on ``l_partkey``; q21's semi/anti self-joins all key on
``l_orderkey`` — one co-partitioning serves every stage (broadcast at
test SF, sort-merge reusing the same exchange at 100 TB); q22
broadcasts a 1-row scalar aggregate and anti-joins the recent-orders
projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F, Window as W

from .common import EVENTS_SQL, QuerySpec, dec, table


def _qty(c):
    return F.col(c).cast("decimal(8,2)")


def _price(c):
    return F.col(c).cast("decimal(12,2)")


def _pct(c):
    return F.col(c).cast("decimal(4,2)")


_ONE = "CAST(1 AS DECIMAL(4,2))"
_REV = f"CAST(l_extendedprice AS DECIMAL(12,2)) * ({_ONE} - CAST(l_discount AS DECIMAL(4,2)))"


def _rev():
    return _price("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _pct("l_discount"))


# --- Q4: order priority via EXISTS (semi join with non-equi conjunct) -----

def _q4_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > orders["o_orderdate"]
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


# --- Q14: promo revenue ratio (broadcast dim join + conditional agg) ------

def _q14_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    promo = F.when(F.col("p_type") == "PROMO", rev)
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.sum(promo).cast("double") * F.lit(100.0) / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


_Q14_SQL = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} END) AS DOUBLE) * 100.0
       / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""




# --- Q12: late-shipment priority distribution (big-big co-keyed join + ---
# --- conditional two-way counts; shipmode/commitdate adapted to fixture) --

def _q12_fn(spark, sf_dir):
    """TPC-H Q12 adapted to the fixture schema (no l_shipmode /
    l_commitdate / l_receiptdate): "late" = shipped more than 60 days
    after the order date, grouped by l_returnflag standing in for
    shipmode; the defining Q12 shape — lineitem⋈orders on the shared
    key with CASE-split counts — is preserved. Both sides key on
    l_orderkey/o_orderkey, so at 100 TB this is the co-partitioned
    sort-merge join (bucketed layout avoids the shuffle entirely);
    only (key, date, flag) columns flow, pruned at the scan."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            # o_orderdate is a TIMESTAMP: add a true 60-day interval
            # (date_add would truncate to midnight and misclassify any
            # intraday order time vs the INTERVAL-based oracle)
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""




# --- Q11: top value share per supplier (grouped value vs scalar-subquery ---
# --- global threshold; partsupp availqty/supplycost adapted to revenue) ----

def _q11_fn(spark, sf_dir):
    """TPC-H Q11 adapted to the fixture schema (no partsupp): supplier
    "value" = lineitem revenue instead of availqty*supplycost, nation
    filter on the supplier dim, HAVING value above the group mean
    via a broadcast 1-row scalar aggregate. The comparison stays in
    DECIMAL/BIGINT on both engines (value*n > total — no float
    threshold can flip a boundary). At 100 TB: lineitem⋈supplier broadcasts the
    dim, one partial→final agg on l_suppkey, and the scalar total is a
    second pass over the TINY per-supplier aggregate (not the fact
    table), broadcast back as one row."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 12
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("val_dec"))
    )
    total = val.agg(
        F.sum("val_dec").alias("total_dec"), F.count("*").alias("n_sup")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("val_dec") * F.col("n_sup") > F.col("total_dec"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("val_dec").cast("double").alias("value"),
        )
    )


_Q11_SQL = f"""
WITH v AS (
  SELECT l_suppkey AS suppkey, SUM({_REV}) AS val_dec
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey < 12
  GROUP BY l_suppkey
)
SELECT suppkey, CAST(val_dec AS DOUBLE) AS value
FROM v WHERE val_dec * (SELECT COUNT(*) FROM v) > (SELECT SUM(val_dec) FROM v)
"""


# --- Q20: suppliers shipping significant promo-part volume (semi-join ------
# --- chain; partsupp excess-availability adapted to shipped-quantity) ------

def _q20_fn(spark, sf_dir):
    """TPC-H Q20 adapted to the fixture schema (no partsupp): suppliers
    who shipped an above-average volume of PROMO-type parts during 1996
    (the correlated 0.5*shipped threshold of the original becomes a
    group-mean threshold, kept DECIMAL/BIGINT-exact: qty*n > total) — the
    defining shape survives: a dim-filtered part set prunes lineitem
    (broadcast semi join), a grouped HAVING derives qualifying
    suppliers, and the supplier dim is semi-joined against that set.
    At 100 TB the part filter broadcasts (tiny dim), lineitem scans
    once with the shipdate range pushed to parquet, and the final semi
    join keys on the small qualifying-supplier set."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    per_sup = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_qty("l_quantity")).alias("qty_dec"))
    )
    stats = per_sup.agg(
        F.sum("qty_dec").alias("tot_dec"), F.count("*").alias("n_sup")
    )
    shipped = (
        per_sup.join(F.broadcast(stats))
        .filter(F.col("qty_dec") * F.col("n_sup") > F.col("tot_dec"))
    )
    sup = table(spark, sf_dir, "supplier")
    return (
        sup.join(
            shipped, sup["s_suppkey"] == shipped["l_suppkey"], "left_semi"
        )
        .select("s_suppkey", "s_name")
    )


_Q20_SQL = """
WITH per_sup AS (
  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(8,2))) AS qty_dec
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_sup
  WHERE qty_dec * (SELECT COUNT(*) FROM per_sup) > (SELECT SUM(qty_dec) FROM per_sup)
)
"""


# --- Q18: large-volume orders (grouped HAVING feeding a join) -------------

def _q18_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_qty("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            "sum_qty",
        )
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(8,2))) > 250
)
SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
"""


# --- Q19: disjunctive multi-predicate join (OR-of-ANDs pushdown) ----------

def _q19_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    q = F.col("l_quantity")
    sz = F.col("p_size")
    pred = (
        ((F.col("p_brand") == "Brand#4") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & sz.between(10, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#19") & sz.between(20, 50) & q.between(20, 40))
    )
    return j.filter(pred).agg(F.sum(_rev()).cast("double").alias("revenue"))


_Q19_SQL = f"""
SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
"""


# --- Q10: returned-item revenue, deterministic top-20 ---------------------

def _q10_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# both engines sort identical doubles (exact decimal sums), custkey
# breaks ties → the top-20 set is deterministic across engines
_Q10_SQL = f"""
SELECT c_custkey, c_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# --- argmax/argmin (max_by/min_by at the grouped-query surface) -----------

def _argmax_fn(spark, sf_dir):
    supp = table(spark, sf_dir, "supplier")
    key = F.struct(F.col("s_acctbal"), F.col("s_suppkey"))  # unique → deterministic
    return supp.groupBy(F.col("s_nationkey").cast("bigint").alias("nation")).agg(
        F.max_by("s_name", key).alias("top_supplier"),
        F.min_by("s_name", key).alias("bottom_supplier"),
        F.max("s_acctbal").alias("max_bal"),
    )


# DuckDB's arg_max can't order by a composite, so the oracle spells the
# same (acctbal, suppkey) lexicographic argmax with ranked windows.
_ARGMAX_SQL = """
WITH r AS (
  SELECT s_nationkey, s_name, s_acctbal,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_suppkey DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal ASC, s_suppkey ASC) AS rmin
  FROM supplier
)
SELECT CAST(s_nationkey AS BIGINT) AS nation,
       MAX(CASE WHEN rmax = 1 THEN s_name END) AS top_supplier,
       MAX(CASE WHEN rmin = 1 THEN s_name END) AS bottom_supplier,
       MAX(s_acctbal) AS max_bal
FROM r GROUP BY s_nationkey
"""


# --- PIVOT (wide conditional aggregation) ----------------------------------

def _pivot_fn(spark, sf_dir):
    """PIVOT: per return flag, quantity totals spread across line-status
    columns. Spark's `pivot` with explicit value list compiles to ONE
    hash aggregation with conditional partials (no per-value scan, no
    value-discovery job since the values are given) — exactly the CASE
    aggregation the oracle spells out; at 100 TB it's the same single
    partial→final agg as any groupBy."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_qty("l_quantity")).cast("double"))
        .withColumnsRenamed({"F": "qty_f", "O": "qty_o"})
    )


_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(8,2)) END) AS DOUBLE) AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(8,2)) END) AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


# --- ROLLUP with GROUPING() disambiguation ---------------------------------

def _rollup_fn(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus): detail rows + per-flag
    subtotals + grand total in one pass — Spark expands each row once
    per grouping level, partial-aggregates map-side, and `grouping()`
    flags distinguish real NULLs from subtotal rows (bigint-stable
    across engines)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_qty("l_quantity")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- GROUPING SETS (beyond rollup/cube: explicit set list) ----------------

def _grouping_sets_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(_qty("l_quantity")).cast("double").alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# --- lead/lag/ntile/first_value analytics ---------------------------------

def _lead_lag_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.first("o_totalprice").over(w).alias("first_price"),
    )


_LEAD_LAG_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       FIRST_VALUE(o_totalprice) OVER w AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- multi COUNT(DISTINCT) (expand-based distinct aggregation) ------------

def _count_distinct_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


_COUNT_DISTINCT_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# --- event-time range join (equi key + bounded time predicate) ------------

_DAY_MS = 86_400_000


def _range_join_fn(spark, sf_dir):
    from ..operators.retrieval import events_ts_ms

    raw = table(spark, sf_dir, "events")
    ev = raw.select("event_id", "user_id", events_ts_ms(raw).alias("ms"), "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ms").alias("c_ms")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ms").alias("e_ms")
    )
    j = clicks.join(
        errors,
        (clicks["user_id"] == errors["e_user"])
        & errors["e_ms"].between(clicks["c_ms"] - _DAY_MS, clicks["c_ms"]),
    )
    return j.groupBy("click_id").agg(F.count("*").alias("n_errors"))


_RANGE_JOIN_SQL = f"""
WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type FROM events)
SELECT c.event_id AS click_id, COUNT(*) AS n_errors
FROM e c JOIN e r
  ON r.user_id = c.user_id AND r.ms BETWEEN c.ms - {_DAY_MS} AND c.ms
WHERE c.event_type = 'click' AND r.event_type = 'error'
GROUP BY c.event_id
"""


# --- batch session windows (session_window; gaps-and-islands oracle) ------

_GAP_MS = 1_800_000  # 30 minutes


def _session_window_fn(spark, sf_dir):
    from .common import events_frame

    ev = events_frame(spark, sf_dir)
    return (
        ev.groupBy(
            "series_key",
            F.session_window(F.timestamp_millis("ts_ms"), "30 minutes").alias("sw"),
        )
        .agg(
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select("series_key", "start_ms", "end_ms", "n_events", "sum_value")
    )


# Spark merges an event into the current session iff ts <= last_ts + gap
# (the boundary event extends the session — pinned by the property test
# tests/test_properties.py::test_session_window_islands_match_reference),
# so a new island starts exactly when ts - prev_ts > gap.
_SESSION_WINDOW_SQL = f"""
WITH series AS ({EVENTS_SQL}),
g AS (
  SELECT series_key, ts_ms, value, seq,
         CASE WHEN ts_ms - LAG(ts_ms) OVER (PARTITION BY series_key ORDER BY ts_ms, seq)
                   > {_GAP_MS} THEN 1 ELSE 0 END AS brk
  FROM series
),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY series_key ORDER BY ts_ms, seq
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT series_key, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY series_key, sid
"""


# --- Q15: top supplier by quarter revenue (scalar subquery over agg) ------

def _q15_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("rev_dec"))
        .select("l_suppkey", F.col("rev_dec").cast("double").alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev["total_revenue"] == top["mx"])
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# --- Q7: bilateral nation volume (one dim joined twice, aliased) ----------

def _q7_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(_rev()).cast("double").alias("volume"))
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(SUM({_REV}) AS DOUBLE) AS volume
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name
"""


# --- Q8: market share (conditional ratio inside grouped agg) --------------

def _q8_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _rev()
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    target = F.when(F.col("n_name") == "CHINA", rev)
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            (
                F.coalesce(F.sum(target), F.lit(0).cast("decimal(18,4)")).cast(
                    "double"
                )
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


_Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
       CAST(COALESCE(SUM(CASE WHEN n_name = 'CHINA' THEN {_REV} END),
                     CAST(0 AS DECIMAL(18,4))) AS DOUBLE)
         / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1
"""


# --- year-over-year growth (lag over an aggregate) ------------------------

def _yoy_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(F.sum(_rev()).cast("double").alias("revenue"))
    w = W.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("revenue_prior_year"),
        F.when(prev > 0, F.col("revenue") / prev - 1.0).alias("yoy_growth"),
    )


_YOY_SQL = f"""
WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(SUM({_REV}) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY 1
)
SELECT month, revenue,
       LAG(revenue, 12) OVER (ORDER BY month) AS revenue_prior_year,
       CASE WHEN LAG(revenue, 12) OVER (ORDER BY month) > 0
            THEN revenue / LAG(revenue, 12) OVER (ORDER BY month) - 1.0 END
         AS yoy_growth
FROM m
"""


# --- rank family: dense_rank / percent_rank / cume_dist -------------------
# rank functions are tie-stable: equal sort keys get equal outputs, so
# no extra tie-break column is needed for determinism.

def _rank_family_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


_RANK_FAMILY_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(DENSE_RANK()  OVER w AS BIGINT) AS drank,
       PERCENT_RANK() OVER w AS prank,
       CUME_DIST()    OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
"""


# --- NULL semantics: NULLIF/COALESCE, count(col) vs count(*) --------------

def _null_handling_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    d0 = F.when(F.col("l_discount") != 0, _pct("l_discount"))  # NULL at zero
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.count(d0).alias("n_nonzero"),
        (F.sum(d0).cast("double") / F.count(d0)).alias("avg_nonzero_disc"),
        F.sum(F.coalesce(d0, F.lit(0).cast("decimal(4,2)")))
        .cast("double")
        .alias("total_disc"),
    )


_NULL_HANDLING_SQL = """
SELECT l_returnflag, COUNT(*) AS n_rows,
       COUNT(NULLIF(CAST(l_discount AS DECIMAL(4,2)), 0)) AS n_nonzero,
       CAST(SUM(NULLIF(CAST(l_discount AS DECIMAL(4,2)), 0)) AS DOUBLE)
         / COUNT(NULLIF(CAST(l_discount AS DECIMAL(4,2)), 0)) AS avg_nonzero_disc,
       CAST(SUM(COALESCE(NULLIF(CAST(l_discount AS DECIMAL(4,2)), 0),
                         CAST(0 AS DECIMAL(4,2)))) AS DOUBLE) AS total_disc
FROM lineitem GROUP BY l_returnflag
"""


# --- correlation from exact decimal co-moments ----------------------------
# corr()/covar() builtins accumulate floats in partition order (not
# reproducible across engines); deriving from DECIMAL sums is exact and
# still one partial-aggregable pass — the same trick works at any scale.

def _corr_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    x, y = _qty("l_quantity"), _price("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select("l_returnflag", corr.alias("corr_qty_price"))


# Decimal sums leave DuckDB through a VARCHAR roundtrip: the direct
# DECIMAL→DOUBLE cast converts the INT128 payload to double FIRST and
# divides by 10^scale after — two roundings, not correctly rounded once
# the payload exceeds 2^53 (syy's raw units pass that at sf0.001
# already; measured 1-ulp high on the 'A' group, the same INT128 hazard
# catalog/timeseries.py documents). The string parse is correctly
# rounded (the flit() rationale), matching Spark's BigDecimal→double
# exactly for every value, at every scale factor.
_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
         AS corr_qty_price
FROM m
"""


# --- time-RANGE frame moving aggregate (windowed, not bucketed) -----------

_HOUR_MS = 3_600_000


def _moving_avg_fn(spark, sf_dir):
    """Trailing-hour moving average over the SHARDED window (time
    chunks + carry-in, operators/rolling.py): bit-identical to the
    one-partition-per-series form — the decimal window sum is exact,
    so the row set (identical by construction) determines the
    doubles — while the sort parallelism is (series × chunks), not
    (series). Oracle unchanged."""
    from ..operators import rolling
    from .common import events_frame

    ev = events_frame(spark, sf_dir)
    aug, w = rolling.sharded_trailing_window(ev, _HOUR_MS)
    return rolling.emit_owned(
        aug.select(
            "series_key",
            "ts_ms",
            "seq",
            F.count("*").over(w).alias("n_in_hour"),
            (
                F.sum(dec("value")).over(w).cast("double") / F.count("*").over(w)
            ).alias("avg_in_hour"),
            rolling.OWNED,
            rolling.CHUNK,
        )
    )


_MOVING_AVG_SQL = f"""
WITH series AS ({EVENTS_SQL})
SELECT series_key, ts_ms, seq,
       COUNT(*) OVER w AS n_in_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS avg_in_hour
FROM series
WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms
             RANGE BETWEEN {_HOUR_MS} PRECEDING AND CURRENT ROW)
"""


def _bollinger_fn(spark, sf_dir):
    """Bollinger bands + breakout flag — the rolling mean ± 2σ
    volatility envelope (Bollinger 1992; the breakout flag is the
    classic mean-reversion / regime-change trigger): per series, over
    the trailing 1-hour range window, population variance from EXACT
    integer window sums (values carry 2 fractional digits → v100 =
    100·value is an exact bigint; var·10⁴ = (n·Σv² − (Σv)²)/n², all
    bigint), so the only floats are one division + one sqrt + two
    IEEE additions — bit-stable across engines and partitionings.
    ONE window exchange serves all five aggregates.

    r8 (VERDICT r7 item 5): the window runs SHARDED by time chunk
    with carry-in (operators/rolling.py) — per-task sort is a chunk,
    not a whole series, so parallelism is (series × chunks) and the
    exp-0.62 fixed-series bottleneck goes away. All window
    accumulators are exact bigint, so the output is bit-identical to
    the unsharded form and the oracle is UNCHANGED.

    Output: (series_key, ts_ms, seq, value, n_in_hour, mean, std,
    upper, lower, breakout ∈ {-1, 0, 1})."""
    from ..operators import rolling
    from .common import events_frame

    ev = events_frame(spark, sf_dir)
    aug, w = rolling.sharded_trailing_window(ev, _HOUR_MS)
    v100 = (dec("value") * 100).cast("bigint")
    n = F.count("*").over(w)
    a = F.sum(v100).over(w)
    b = F.sum(v100 * v100).over(w)
    mean = a.cast("double") / (n * 100).cast("double")
    var4 = (n * b - a * a).cast("double") / (n * n * 10_000).cast("double")
    std = F.sqrt(var4)
    out = rolling.emit_owned(
        aug.select(
            "series_key",
            "ts_ms",
            "seq",
            "value",
            n.alias("n_in_hour"),
            mean.alias("mean"),
            std.alias("std"),
            (mean + F.lit(2.0) * std).alias("upper"),
            (mean - F.lit(2.0) * std).alias("lower"),
            rolling.OWNED,
            rolling.CHUNK,
        )
    )
    breakout = (
        F.when(F.col("value") > F.col("upper"), F.lit(1))
        .when(F.col("value") < F.col("lower"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return out.withColumn("breakout", breakout)


_BOLLINGER_SQL = f"""
WITH series AS ({EVENTS_SQL}),
s AS (SELECT series_key, ts_ms, seq, value,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100
      FROM series),
agg AS (SELECT series_key, ts_ms, seq, value,
        COUNT(*) OVER w AS n_in_hour,
        SUM(v100) OVER w AS a,
        SUM(v100 * v100) OVER w AS b
        FROM s
        WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms
                     RANGE BETWEEN {_HOUR_MS} PRECEDING AND CURRENT ROW)),
bands AS (SELECT series_key, ts_ms, seq, value, n_in_hour,
        CAST(a AS DOUBLE) / CAST(n_in_hour * 100 AS DOUBLE) AS mean,
        sqrt(CAST(n_in_hour * b - a * a AS DOUBLE)
             / CAST(n_in_hour * n_in_hour * 10000 AS DOUBLE)) AS std
        FROM agg)
SELECT series_key, ts_ms, seq, value, n_in_hour, mean, std,
       mean + 2.0 * std AS upper, mean - 2.0 * std AS lower,
       CAST(CASE WHEN value > mean + 2.0 * std THEN 1
                 WHEN value < mean - 2.0 * std THEN -1
                 ELSE 0 END AS BIGINT) AS breakout
FROM bands
"""


# --- fixed-width histogram ------------------------------------------------

_BIN = 25_000  # o_totalprice ∈ [1013, 499979] → 20 bins


def _histogram_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / _BIN), F.lit(19)).cast("bigint")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


_HISTOGRAM_SQL = f"""
SELECT CAST(LEAST(FLOOR(o_totalprice / {_BIN}), 19) AS BIGINT) AS bucket,
       COUNT(*) AS n
FROM orders GROUP BY 1
"""


# --- regex / split scalar functions ---------------------------------------

def _scalar_regex_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.split("c_name", "#").getItem(0).alias("prefix"),
        F.col("c_name").rlike("00$").cast("bigint").alias("ends_00"),
    )


_SCALAR_REGEX_SQL = """
SELECT c_custkey,
       COALESCE(regexp_extract(c_name, '[0-9]+'), '') AS digits,
       split_part(c_name, '#', 1) AS prefix,
       CAST(regexp_matches(c_name, '00$') AS BIGINT) AS ends_00
FROM customer
"""


# --- UNPIVOT (wide → long) ------------------------------------------------

def _unpivot_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(_qty("l_quantity")).cast("double").alias("qty"),
        F.sum(_price("l_extendedprice")).cast("double").alias("base_price"),
        F.sum(_pct("l_discount")).cast("double").alias("discount"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["qty", "base_price", "discount"], "measure", "amount"
    )


_UNPIVOT_SQL = """
WITH w AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS base_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS discount
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty' AS measure, qty AS amount FROM w
UNION ALL SELECT l_returnflag, 'base_price', base_price FROM w
UNION ALL SELECT l_returnflag, 'discount', discount FROM w
"""


# --- UNION DISTINCT -------------------------------------------------------

def _union_distinct_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.union(b).distinct()


_UNION_DISTINCT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


# --- Q13: customer order-count distribution (left outer + count-of-counts)

def _q13_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
"""


# --- Q17: small-quantity-order revenue (per-part avg threshold) -----------
# The 0.2*avg(qty) threshold is kept in exact integer/decimal space:
# qty < 0.2 * (sum/cnt)  ⟺  qty * 5 * cnt < sum  (all positive) — no
# float division on either engine, so the row set matches bit-for-bit.

def _q17_fn(spark, sf_dir):
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.sum(_qty("l_quantity")).alias("sum_qty"),
        F.count("l_quantity").alias("cnt_qty"),
    )
    j = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(per_part, li["l_partkey"] == F.col("ap_partkey"))
        .filter(
            _qty("l_quantity") * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty")
        )
    )
    total = j.agg(F.sum(_price("l_extendedprice")).alias("s"))
    return total.select(
        (F.col("s").cast("double") / F.lit(7.0)).alias("avg_yearly")
    )


_Q17_SQL = """
WITH ap AS (SELECT l_partkey AS ap_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(8,2))) AS sum_qty,
                   COUNT(l_quantity) AS cnt_qty
            FROM lineitem GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#1'
JOIN ap ON ap_partkey = l_partkey
WHERE CAST(l_quantity AS DECIMAL(8,2)) * 5 * cnt_qty < sum_qty
"""


# --- Q21: suppliers who kept multi-supplier orders waiting ----------------
# "Late" is adapted to this schema (no l_commitdate/l_receiptdate):
# shipped more than 60 days after the order date. Shape preserved from
# TPC-H Q21: finished orders where THIS supplier shipped late, at least
# one OTHER supplier participated (left-semi self-join), and no other
# supplier shipped late (left-anti self-join).

def _q21_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    others = (l1["l_orderkey"] == l2["x_orderkey"]) & (
        l1["l_suppkey"] != l2["x_suppkey"]
    )
    with_other = l1.join(l2, others, "left_semi")
    l3 = li.select(
        F.col("l_orderkey").alias("y_orderkey"),
        F.col("l_suppkey").alias("y_suppkey"),
        F.col("l_shipdate").alias("y_shipdate"),
    )
    other_late = (
        (with_other["l_orderkey"] == l3["y_orderkey"])
        & (with_other["l_suppkey"] != l3["y_suppkey"])
        & (l3["y_shipdate"] > with_other["o_orderdate"] + F.expr("INTERVAL 60 DAYS"))
    )
    sole_late = with_other.join(l3, other_late, "left_anti")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


# --- Q22: idle customers with above-average balance (scalar subquery +
# anti join, grouped by nation — c_phone country codes aren't in this
# schema, and every customer has SOME order, so "idle" means no order
# since 2001-05-01, the last quarter of the data). The avg-balance
# threshold reuses the exact-decimal trick:
# acctbal * cnt > sum  ⟺  acctbal > sum/cnt, no float division.

_Q22_CUTOFF = "2001-05-01"


def _q22_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).alias("bal_sum"),
        F.count("c_acctbal").alias("bal_cnt"),
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _Q22_CUTOFF)
        .select("o_custkey")
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("c_acctbal").cast("decimal(12,2)") * F.col("bal_cnt")
        > F.col("bal_sum")
    )
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return (
        idle.join(F.broadcast(nation), idle["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


_Q22_SQL = """
WITH pos AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum,
                    COUNT(c_acctbal) AS bal_cnt
             FROM customer WHERE c_acctbal > 0.0)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
JOIN nation ON n_nationkey = c_nationkey
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-05-01 00:00:00')
GROUP BY n_name
"""




# --- value-family window functions over explicit frames -------------------

def _value_family_fn(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    trail3 = wo.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.last("o_totalprice").over(full).alias("latest_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
        F.min("o_totalprice").over(trail3).alias("trail3_min"),
        F.max("o_totalprice").over(trail3).alias("trail3_max"),
    )


_VALUE_FAMILY_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAST_VALUE(o_totalprice) OVER wf AS latest_price,
       NTH_VALUE(o_totalprice, 2) OVER wf AS second_price,
       MIN(o_totalprice) OVER wt AS trail3_min,
       MAX(o_totalprice) OVER wt AS trail3_max
FROM orders
WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wt AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""




# --- quantified ALL subquery (decorrelated to a per-group max join) -------

def _quantified_all_fn(spark, sf_dir):
    """Customers whose balance beats EVERY supplier balance in their
    nation. The SQL front door is a correlated ``> ALL`` subquery; the
    Spark plan decorrelates it to a per-nation MAX + left join (empty
    nations pass vacuously, matching ALL-over-empty-set = TRUE)."""
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    smax = supp.groupBy("s_nationkey").agg(F.max("s_acctbal").alias("smax"))
    j = cust.join(
        F.broadcast(smax),
        cust["c_nationkey"] == smax["s_nationkey"],
        "left",
    )
    return j.filter(
        F.col("smax").isNull() | (F.col("c_acctbal") > F.col("smax"))
    ).select("c_custkey", "c_name", "c_acctbal")


_QUANTIFIED_ALL_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier
                       WHERE s_nationkey = c_nationkey)
"""




# --- Q9 family (adapted: no partsupp/supplycost in the fixture schema;
# profit proxy = discounted revenue of ECONOMY-type parts, cut by
# supplier nation x order year — the same 5-table join tree and
# dim-broadcast shape as TPC-H Q9) -----------------------------------------

def _q9_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q16 family (adapted: supplier-part relationships recovered from
# lineitem instead of partsupp; NOT IN excludes negative-balance
# suppliers — the "complaints" anti-join of Q16) ---------------------------

def _q16_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    pairs = (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""




# --- Q2 family (adapted: no partsupp/supplycost; the "min-cost supplier"
# correlated-aggregate shape recovered from lineitem offer prices) ---------

def _q2_fn(spark, sf_dir):
    """Cheapest supplier per LARGE part: avg offered unit price per
    (part, supplier) from lineitem, keep the supplier(s) attaining the
    per-part minimum — TPC-H Q2's correlated MIN subquery, decorrelated
    into one ranked window over the pre-aggregated offers."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    supp = table(spark, sf_dir, "supplier")
    offer = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
             / F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double"))
            .alias("unit_price")
        )
    )
    w = W.partitionBy("p_partkey")
    best = offer.withColumn("best_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("best_price")
    )
    return (
        best.join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "unit_price")
    )


_Q2_SQL = """
WITH offer AS (
  SELECT p_partkey, p_name, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) /
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS unit_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'LARGE'
  GROUP BY p_partkey, p_name, l_suppkey
)
SELECT o.p_partkey, o.p_name, s.s_name, o.unit_price
FROM offer o JOIN supplier s ON o.l_suppkey = s.s_suppkey
WHERE o.unit_price = (SELECT MIN(o2.unit_price) FROM offer o2
                      WHERE o2.p_partkey = o.p_partkey)
"""




# --- behavioral analytics over the events stream table --------------------

def _funnel_fn(spark, sf_dir):
    """Ordered 3-step funnel (view → click → purchase) per user: each
    later step must strictly follow the user's earliest completion of
    the previous one. ONE scan + ONE shuffle: events collect per user
    (per-user counts are small), the step chain folds in-row with array
    HOFs — the naive per-step aggregate-and-join-back shape scans the
    fact table once per step."""
    from ..operators.retrieval import events_ts_ms

    raw = table(spark, sf_dir, "events")
    e = raw.select(
        F.col("user_id"),
        F.col("event_type").alias("k"),
        events_ts_ms(raw).alias("ts_ms"),
    )
    per_user = e.groupBy("user_id").agg(
        F.collect_list(F.struct("ts_ms", "k")).alias("evs")
    )

    def step_min(kind, after=None):
        keep = lambda x: x["k"] == kind if after is None else (
            (x["k"] == kind) & (x["ts_ms"] > after)
        )
        return F.array_min(
            F.transform(F.filter("evs", keep), lambda x: x["ts_ms"])
        )

    staged = (
        per_user.withColumn("t1", step_min("view"))
        .withColumn("t2", step_min("click", F.col("t1")))
        .withColumn("t3", step_min("purchase", F.col("t2")))
    )
    return staged.agg(
        F.count("t1").alias("step1_view"),
        F.count("t2").alias("step2_click"),
        F.count("t3").alias("step3_purchase"),
    )


def _attribution_fn(spark, sf_dir):
    """First-touch channel attribution — the marketing-analytics
    rollup: each user's FIRST event (ts, then event_id tiebreak)
    defines their acquisition channel; every purchase the user ever
    makes attributes its value to that channel. Shape: the first-touch
    table is ONE map-side-combinable min_by struct agg (no window
    sort), purchases reduce per user in the same pass style, then one
    small channel-grain agg — two scans of events, one shuffle each,
    no fact-table join (both sides are already user-grain, ≤ |users|
    rows). Money sums accumulate as exact DECIMAL with one final
    double cast; users with zero purchases still count in n_users.

    Output: (first_touch, n_users, n_purchases, attributed_value).
    """
    from ..operators.retrieval import events_ts_ms

    raw = table(spark, sf_dir, "events")
    e = raw.select(
        F.col("user_id"),
        F.col("event_type").alias("k"),
        events_ts_ms(raw).alias("ts_ms"),
        F.col("event_id").cast("bigint").alias("seq"),
        F.col("value"),
    )
    key = F.struct(F.col("ts_ms"), F.col("seq"))
    ft = e.groupBy("user_id").agg(F.min_by("k", key).alias("first_touch"))
    purch = (
        e.filter(F.col("k") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("np"),
            F.sum(dec("value")).alias("pv"),
        )
    )
    j = ft.join(purch, "user_id", "left")
    return j.groupBy("first_touch").agg(
        F.count("*").alias("n_users"),
        F.sum(F.coalesce(F.col("np"), F.lit(0))).alias("n_purchases"),
        F.sum(F.coalesce(F.col("pv"), F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("attributed_value"),
    )


# DuckDB's arg_min can't order by a composite; the oracle spells the
# first-touch pick with a ranked window (same as _ARGMAX_SQL).
_ATTRIBUTION_SQL = """
WITH e AS (SELECT user_id, event_type AS k, epoch_ms(ts) AS ts_ms,
                  CAST(event_id AS BIGINT) AS seq, value FROM events),
ft AS (SELECT user_id, k AS first_touch FROM (
         SELECT user_id, k, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY ts_ms, seq) AS rn FROM e) WHERE rn = 1),
p AS (SELECT user_id, COUNT(*) AS np,
             SUM(CAST(value AS DECIMAL(18,2))) AS pv
      FROM e WHERE k = 'purchase' GROUP BY user_id)
SELECT ft.first_touch, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(COALESCE(p.np, 0)) AS BIGINT) AS n_purchases,
       CAST(SUM(COALESCE(p.pv, 0)) AS DOUBLE) AS attributed_value
FROM ft LEFT JOIN p USING (user_id) GROUP BY ft.first_touch
"""


_SESSION_GAP_MS = 30 * 60 * 1000


def _session_paths_fn(spark, sf_dir):
    """Top behavioral paths: sessionize each user's events (a new
    session opens after a 30-minute silence), concatenate the ordered
    event types into a path string, and report the 20 most frequent
    paths — the 'what do users actually do' rollup product analytics
    builds on. Shape: one per-user window sort (lag → break flag →
    running session id, one sort reused for both), one per-session
    hash agg building the path in-row from a sorted collect (the same
    reassembly as passage dedup — no second window), one path-count
    hash agg (map-side combined), and a TakeOrderedAndProject top-20.
    Ties rank (count desc, path asc) — deterministic at the cut."""
    from ..operators.retrieval import events_ts_ms

    raw = table(spark, sf_dir, "events")
    e = raw.select(
        "user_id",
        F.col("event_type").alias("k"),
        events_ts_ms(raw).alias("ts_ms"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    prev = F.lag("ts_ms").over(w)
    brk = F.when(
        prev.isNull() | (F.col("ts_ms") - prev > _SESSION_GAP_MS), 1
    ).otherwise(0)
    staged = e.withColumn("__brk", brk).withColumn(
        "__sid", F.sum("__brk").over(w)
    )
    path = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts_ms", "event_id", "k"))),
            lambda x: x["k"],
        ),
        ">",
    )
    sess = staged.groupBy("user_id", "__sid").agg(path.alias("path"))
    return (
        sess.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


_SESSION_PATHS_SQL = f"""
WITH e AS (SELECT user_id, event_type AS k, epoch_ms(ts) AS ts_ms, event_id FROM events),
x AS (SELECT *, CASE WHEN LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
      OR ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) > {_SESSION_GAP_MS}
      THEN 1 ELSE 0 END AS brk FROM e),
y AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS sid FROM x),
p AS (SELECT user_id, sid, string_agg(k, '>' ORDER BY ts_ms, event_id) AS path FROM y GROUP BY 1, 2)
SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1
ORDER BY n_sessions DESC, path LIMIT 20
"""


def _transitions_fn(spark, sf_dir):
    """Session-scoped event-transition matrix: P(next event type |
    current), transitions never crossing a session boundary (the
    Markov-chain companion to the path rollup — powers next-action
    prediction and funnel-leak diagnosis). Shape: the SAME single
    per-user window sort yields the session break, the running session
    id, and the lead event type; transition counts and the per-source
    totals are two stacked hash aggs (the second re-groups the first's
    output — no second scan); probability is one double division of
    exact counts. Deterministic: (ts, event_id) total order."""
    from ..operators.retrieval import events_ts_ms

    raw = table(spark, sf_dir, "events")
    e = raw.select(
        "user_id",
        F.col("event_type").alias("k"),
        events_ts_ms(raw).alias("ts_ms"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    prev = F.lag("ts_ms").over(w)
    brk = F.when(
        prev.isNull() | (F.col("ts_ms") - prev > _SESSION_GAP_MS), 1
    ).otherwise(0)
    staged = (
        e.withColumn("__brk", brk)
        .withColumn("__sid", F.sum("__brk").over(w))
        .withColumn("__next_k", F.lead("k").over(w))
        .withColumn("__next_sid", F.lead("__sid").over(w))
    )
    trans = (
        staged.filter(
            F.col("__next_k").isNotNull()
            & (F.col("__next_sid") == F.col("__sid"))
        )
        .groupBy(F.col("k").alias("src"), F.col("__next_k").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    w_src = W.partitionBy("src")
    return trans.select(
        "src",
        "dst",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(w_src).cast("double")
        ).alias("p"),
    )


_TRANSITIONS_SQL = f"""
WITH e AS (SELECT user_id, event_type AS k, epoch_ms(ts) AS ts_ms, event_id FROM events),
x AS (SELECT *, CASE WHEN LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
      OR ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) > {_SESSION_GAP_MS}
      THEN 1 ELSE 0 END AS brk FROM e),
y AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS sid,
      LEAD(k) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS next_k,
      LEAD(brk) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS next_brk FROM x),
t AS (SELECT k AS src, next_k AS dst, COUNT(*) AS n FROM y
      WHERE next_k IS NOT NULL AND next_brk = 0 GROUP BY 1, 2)
SELECT src, dst, n, CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE) AS p
FROM t
"""


_FUNNEL_SQL = f"""
WITH series AS ({EVENTS_SQL}),
e AS (SELECT ev.user_id, s.series_key, s.ts_ms
      FROM series s JOIN events ev ON ev.event_id = s.seq),
v AS (SELECT user_id, MIN(ts_ms) AS t1 FROM e WHERE series_key = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts_ms) AS t2 FROM e JOIN v USING (user_id)
      WHERE e.series_key = 'click' AND e.ts_ms > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts_ms) AS t3 FROM e JOIN c USING (user_id)
      WHERE e.series_key = 'purchase' AND e.ts_ms > c.t2 GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS step1_view,
       (SELECT COUNT(*) FROM c) AS step2_click,
       (SELECT COUNT(*) FROM p) AS step3_purchase
"""


def _retention_fn(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-seen week,
    counted distinct in each subsequent week offset. Two aggregations
    (first-seen, activity) joined on user — the classic cohort triangle,
    all map-side-combinable."""
    from ..operators.retrieval import events_ts_ms

    raw = table(spark, sf_dir, "events")
    week = F.floor(events_ts_ms(raw) / F.lit(604_800_000)).cast("bigint")
    e = raw.select("user_id", week.alias("week"))
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_RETENTION_SQL = f"""
WITH series AS ({EVENTS_SQL}),
e AS (SELECT ev.user_id, CAST(s.ts_ms // 604800000 AS BIGINT) AS week
      FROM series s JOIN events ev ON ev.event_id = s.seq),
f AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id)
SELECT f.cohort_week, e.week - f.cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM e JOIN f USING (user_id)
GROUP BY f.cohort_week, e.week - f.cohort_week
"""




def _topk_ties_fn(spark, sf_dir):
    """Top-3 WITH TIES per nation by customer balance: RANK (not
    ROW_NUMBER) keeps every row tying the third-place value — the SQL
    FETCH FIRST ... WITH TIES semantics."""
    cust = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        cust.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_name", "c_acctbal", "rnk")
    )


_TOPK_TIES_SQL = """
SELECT c_nationkey, c_name, c_acctbal, CAST(RANK() OVER w AS BIGINT) AS rnk
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
QUALIFY rnk <= 3
"""


QUERIES: dict[str, QuerySpec] = {
    "q4_order_priority": QuerySpec(_q4_fn, _Q4_SQL),
    "q12_late_shipments": QuerySpec(_q12_fn, _Q12_SQL),
    "q11_value_share": QuerySpec(_q11_fn, _Q11_SQL),
    "q20_promo_suppliers": QuerySpec(_q20_fn, _Q20_SQL),
    "q13_cust_distribution": QuerySpec(_q13_fn, _Q13_SQL),
    "q17_small_qty_revenue": QuerySpec(_q17_fn, _Q17_SQL),
    "q21_waiting_supplier": QuerySpec(_q21_fn, _Q21_SQL),
    "q22_idle_customers": QuerySpec(_q22_fn, _Q22_SQL),
    "q14_promo_revenue": QuerySpec(_q14_fn, _Q14_SQL),
    "q18_large_orders": QuerySpec(_q18_fn, _Q18_SQL),
    "q19_disjunctive_join": QuerySpec(_q19_fn, _Q19_SQL),
    "q10_returned_items": QuerySpec(_q10_fn, _Q10_SQL),
    "q15_top_supplier": QuerySpec(_q15_fn, _Q15_SQL),
    "q8_market_share": QuerySpec(_q8_fn, _Q8_SQL),
    "q_yoy_growth": QuerySpec(_yoy_fn, _YOY_SQL),
    "q_rank_family": QuerySpec(_rank_family_fn, _RANK_FAMILY_SQL),
    "q7_nation_volume": QuerySpec(_q7_fn, _Q7_SQL),
    "q_argmax": QuerySpec(_argmax_fn, _ARGMAX_SQL),
    "q_grouping_sets": QuerySpec(_grouping_sets_fn, _GROUPING_SETS_SQL),
    "q_pivot": QuerySpec(_pivot_fn, _PIVOT_SQL),
    "q_rollup_grouping": QuerySpec(_rollup_fn, _ROLLUP_SQL),
    "q_window_lead_lag": QuerySpec(_lead_lag_fn, _LEAD_LAG_SQL),
    "q_window_value_family": QuerySpec(_value_family_fn, _VALUE_FAMILY_SQL),
    "q_quantified_all": QuerySpec(_quantified_all_fn, _QUANTIFIED_ALL_SQL),
    "q9_nation_profit": QuerySpec(_q9_fn, _Q9_SQL),
    "q16_supplier_relation": QuerySpec(_q16_fn, _Q16_SQL),
    "q2_min_cost_supplier": QuerySpec(_q2_fn, _Q2_SQL),
    "q_funnel": QuerySpec(_funnel_fn, _FUNNEL_SQL),
    # r7: first-touch channel attribution (min_by first event + purchase rollup)
    "q_attribution": QuerySpec(_attribution_fn, _ATTRIBUTION_SQL),
    # extension: top behavioral session paths (30-min sessionization)
    "q_session_paths": QuerySpec(_session_paths_fn, _SESSION_PATHS_SQL),
    # extension: session-scoped event transition matrix (Markov chain)
    "q_event_transitions": QuerySpec(_transitions_fn, _TRANSITIONS_SQL),
    "q_retention_cohorts": QuerySpec(_retention_fn, _RETENTION_SQL),
    "q_topk_with_ties": QuerySpec(_topk_ties_fn, _TOPK_TIES_SQL),
    "q_count_distinct": QuerySpec(_count_distinct_fn, _COUNT_DISTINCT_SQL),
    "q_range_join": QuerySpec(_range_join_fn, _RANGE_JOIN_SQL),
    "ts_session_window": QuerySpec(_session_window_fn, _SESSION_WINDOW_SQL),
    "q_null_handling": QuerySpec(_null_handling_fn, _NULL_HANDLING_SQL),
    "q_corr_exact": QuerySpec(_corr_fn, _CORR_SQL),
    "ts_moving_avg_range": QuerySpec(_moving_avg_fn, _MOVING_AVG_SQL),
    # r7: rolling mean +/- 2 sigma envelope with breakout flag
    "ts_bollinger_bands": QuerySpec(_bollinger_fn, _BOLLINGER_SQL),
    "q_histogram": QuerySpec(_histogram_fn, _HISTOGRAM_SQL),
    "q_scalar_regex": QuerySpec(_scalar_regex_fn, _SCALAR_REGEX_SQL),
    "q_union_distinct": QuerySpec(_union_distinct_fn, _UNION_DISTINCT_SQL),
    "q_unpivot": QuerySpec(_unpivot_fn, _UNPIVOT_SQL),
}
