"""Graph analytics: triangle census and A-priori frequent triples
against hand-computed answers on synthetic graphs/baskets."""

from __future__ import annotations

from pyspark.sql import functions as F

from potoos_spark.operators.graph import (
    basket_edges,
    frequent_triples,
    orient_by_degree,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


def test_triangle_k4(spark):
    """K4: 4 nodes, 6 edges, C(4,3)=4 triangles, wedges=4·C(3,2)=12,
    gcc = 12/12 = 1."""
    k4 = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    row = triangle_stats(k4).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 6, 12, 4)
    assert row.gcc == 1.0


def test_triangle_path_has_none(spark):
    """Path 0-1-2-3: 2 wedges, 0 triangles, gcc 0."""
    p = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    row = triangle_stats(p).collect()[0]
    assert (row.n_wedges, row.n_triangles, row.gcc) == (2, 0, 0.0)


def test_triangle_star_hub(spark):
    """Star K1,5 plus one rim edge: exactly 1 triangle; the hub's
    oriented out-degree must stay small (orientation sends edges INTO
    the hub), so wedge fan-out never concentrates on the hub key."""
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    e = _edges(spark, star)
    row = triangle_stats(e).collect()[0]
    assert row.n_triangles == 1
    # orientation check: hub (node 0, degree 5) receives all its edges
    o = orient_by_degree(e)
    assert o.filter(F.col("src") == 0).count() == 0


def test_triangle_empty(spark):
    e = _edges(spark, []).filter("u > v")  # empty frame, right schema
    row = triangle_stats(e).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (0, 0, 0, 0)
    assert row.gcc == 0.0


def test_basket_edges_dedup(spark):
    b = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 20), (2, 10), (2, 20), (2, 30)],
        "o bigint, p bigint",
    )
    got = {(r.u, r.v) for r in basket_edges(b, "o", "p").collect()}
    assert got == {(10, 20), (10, 30), (20, 30)}


def test_frequent_triples_known(spark):
    """{1,2,3} (baskets a,b) and {2,3,4} (baskets b,c) have support 2;
    every other triple appears once. Item 9 has support 1 and is
    A-priori-pruned."""
    rows = [
        ("a", 1), ("a", 2), ("a", 3), ("a", 9),
        ("b", 1), ("b", 2), ("b", 3), ("b", 4),
        ("c", 2), ("c", 3), ("c", 4),
    ]
    b = spark.createDataFrame(rows, "o string, p bigint")
    out = frequent_triples(b, "o", "p", min_support=2).collect()
    got = sorted((r.part_a, r.part_b, r.part_c, r.support) for r in out)
    assert got == [(1, 2, 3, 2), (2, 3, 4, 2)]


def test_frequent_triples_basket_cap(spark):
    """A basket over the cap keeps its lowest item ids: with cap=4 the
    5-item basket {1..5}×2 yields triples only over {1,2,3,4}."""
    rows = [(o, p) for o in ("a", "b") for p in range(1, 6)]
    b = spark.createDataFrame(rows, "o string, p bigint")
    out = frequent_triples(b, "o", "p", min_support=2, basket_cap=4).collect()
    got = {(r.part_a, r.part_b, r.part_c) for r in out}
    assert got == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}
    assert all(r.support == 2 for r in out)


def test_association_rules_known(spark):
    """Hand-computed rules: baskets {1,2},{1,2},{1,3},{2} ->
    pair (1,2) joint 2; conf(1->2)=2/3, conf(2->1)=2/3, N=4,
    lift = 2*4/(3*3) = 8/9."""
    from potoos_spark.operators.graph import association_rules

    rows = [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1), ("c", 3), ("d", 2)]
    b = spark.createDataFrame(rows, "o string, p bigint")
    got = {
        (r.antecedent, r.consequent): (r.n_joint, r.n_ante, r.confidence, r.lift)
        for r in association_rules(b, "o", "p", min_support=2).collect()
    }
    assert set(got) == {(1, 2), (2, 1)}
    n_joint, n_ante, conf, lift = got[(1, 2)]
    assert (n_joint, n_ante) == (2, 3)
    assert conf == 2 / 3 and lift == (2 * 4) / (3 * 3)
