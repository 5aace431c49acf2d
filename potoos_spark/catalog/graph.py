"""Oracle-checked catalog: graph analytics over the part co-purchase
graph (extension tier — the reference engine has no graph operators;
these are the standard distributed-graph diagnostics a dup-graph /
basket-analysis pipeline needs).

Both entries are exact-integer computations end to end (the only
double is a final ratio built from identical operands on both
engines), so the DuckDB comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import QuerySpec, table

# Shared SQL base: the distinct (order, part) basket relation and the
# undirected co-purchase edge set (u < v).
_EDGES_BASE = (
    "b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
    "e AS (SELECT DISTINCT a.p AS u, c.p AS v "
    "FROM b a JOIN b c ON a.o = c.o AND a.p < c.p)"
)


def _triangle_fn(spark, sf_dir):
    """Global triangle census of the part co-purchase graph — the
    dup-graph diagnostic shape (clustering coefficient says whether
    near-dup candidates form tight cliques or loose chains). Edges are
    basket-bounded (C(items_per_order, 2) per order); triangles use the
    degree-ordered orientation whose out-degree is HARD-bounded by
    sqrt(2m), so the wedge self-join has no last-reducer hub pathology
    (see operators/graph.py module docstring for the bound's proof)."""
    from ..operators.graph import basket_edges, triangle_stats

    li = table(spark, sf_dir, "lineitem")
    edges = basket_edges(li, "l_orderkey", "l_partkey")
    return triangle_stats(edges)


_TRIANGLE_SQL = (
    f"WITH {_EDGES_BASE}, "
    "deg AS (SELECT node, COUNT(*) AS deg FROM "
    "(SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e) t "
    "GROUP BY node), "
    "o AS (SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v) "
    "THEN e.u ELSE e.v END AS src, "
    "CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v) "
    "THEN e.v ELSE e.u END AS dst "
    "FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v), "
    "tri AS (SELECT COUNT(*) AS n_triangles FROM o a JOIN o b "
    "ON a.src = b.src AND a.dst < b.dst "
    "JOIN e ON e.u = a.dst AND e.v = b.dst), "
    "s AS (SELECT COUNT(*) AS n_nodes, "
    "COALESCE(CAST(SUM(CAST((deg * (deg - 1)) // 2 AS DECIMAL(38,0))) "
    "AS BIGINT), 0) AS n_wedges FROM deg), "
    "ne AS (SELECT COUNT(*) AS n_edges FROM e) "
    "SELECT s.n_nodes, ne.n_edges, s.n_wedges, tri.n_triangles, "
    "CASE WHEN s.n_wedges > 0 THEN "
    "CAST(3 * tri.n_triangles AS DOUBLE) / CAST(s.n_wedges AS DOUBLE) "
    "ELSE 0.0 END AS gcc "
    "FROM s, ne, tri"
)


def _apriori_fn(spark, sf_dir):
    """Top-20 frequent part TRIPLES (A-priori, min support 2): item-level
    support pruning first (lossless by downward closure), then each
    surviving basket's sorted C(k,3) combinations explode IN-ROW
    (bounded by C(basket_cap,3) = 4960 structs) into one hash-count —
    no self-joins, cost linear in orders. Deterministic top-20 by
    (support DESC, part keys) — a TakeOrderedAndProject cut."""
    from ..operators.graph import frequent_triples

    li = table(spark, sf_dir, "lineitem")
    t = frequent_triples(li, "l_orderkey", "l_partkey", min_support=2)
    return t.orderBy(
        F.col("support").desc(), "part_a", "part_b", "part_c"
    ).limit(20)


_APRIORI_SQL = (
    "WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
    "fi AS (SELECT p FROM b GROUP BY p HAVING COUNT(*) >= 2), "
    "fb0 AS (SELECT o, p FROM b WHERE p IN (SELECT p FROM fi)), "
    # basket_cap=32, same rule as the Spark op: keep the lowest item ids
    "fb AS (SELECT o, p FROM (SELECT o, p, "
    "ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn FROM fb0) "
    "WHERE rn <= 32), "
    "t AS (SELECT a.p AS part_a, c.p AS part_b, d.p AS part_c "
    "FROM fb a JOIN fb c ON a.o = c.o AND a.p < c.p "
    "JOIN fb d ON c.o = d.o AND c.p < d.p) "
    "SELECT part_a, part_b, part_c, COUNT(*) AS support "
    "FROM t GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2 "
    "ORDER BY support DESC, part_a, part_b, part_c LIMIT 20"
)


QUERIES: dict[str, QuerySpec] = {
    # extension: exact triangle census via degree-ordered orientation
    "q_triangle_count": QuerySpec(_triangle_fn, _TRIANGLE_SQL),
    # extension: A-priori frequent 3-itemsets (basket-bounded explode)
    "q_apriori_triples": QuerySpec(_apriori_fn, _APRIORI_SQL),
}


def _assoc_rules_fn(spark, sf_dir):
    """Top-20 association rules by (lift, confidence) over the
    co-purchase baskets — the directional completion of
    ``q_apriori_triples``'s support counting. Deterministic cut:
    ORDER BY lift DESC, confidence DESC, antecedent, consequent."""
    from ..operators.graph import association_rules

    li = table(spark, sf_dir, "lineitem")
    r = association_rules(li, "l_orderkey", "l_partkey", min_support=2)
    return r.orderBy(
        F.col("lift").desc(), F.col("confidence").desc(),
        "antecedent", "consequent",
    ).limit(20)


_ASSOC_RULES_SQL = (
    "WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
    "nb AS (SELECT COUNT(DISTINCT o) AS N FROM b), "
    "item AS (SELECT p, COUNT(*) AS n_item FROM b GROUP BY 1), "
    "pairs AS (SELECT a.p AS u, c.p AS v, COUNT(*) AS n_joint "
    "FROM b a JOIN b c ON a.o = c.o AND a.p < c.p "
    "GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
    "dirs AS (SELECT u AS antecedent, v AS consequent, n_joint FROM pairs "
    "UNION ALL SELECT v, u, n_joint FROM pairs), "
    "j AS (SELECT t.antecedent, t.consequent, t.n_joint, "
    "ia.n_item AS n_ante, ic.n_item AS n_cons FROM dirs t "
    "JOIN item ia ON t.antecedent = ia.p JOIN item ic ON t.consequent = ic.p) "
    "SELECT antecedent, consequent, n_joint, n_ante, "
    "CAST(n_joint AS DOUBLE) / CAST(n_ante AS DOUBLE) AS confidence, "
    "CAST(CAST(n_joint AS DECIMAL(38,0)) * (SELECT N FROM nb) AS DOUBLE) / "
    "CAST(CAST(n_ante AS DECIMAL(38,0)) * n_cons AS DOUBLE) AS lift "
    "FROM j ORDER BY lift DESC, confidence DESC, antecedent, consequent LIMIT 20"
)

QUERIES["q_assoc_rules"] = QuerySpec(_assoc_rules_fn, _ASSOC_RULES_SQL)
