"""Distributed graph analytics over co-occurrence graphs (extension
tier — no reference file:line; the reference engine has no graph ops,
but a training-data pipeline needs them for dup-graph diagnostics and
basket/link analysis).

Design notes (100 TB shape):

* Edges come from *basket-bounded* co-occurrence (items sharing an
  order / a document): per-basket fan-out is C(basket, 2), bounded by
  the small basket size, so the edge list grows linearly with baskets
  — never an unbounded document-pair join.
* Triangle counting uses the canonical degree-ordered orientation
  (Cohen 2009 / Suri & Vassilvitskii 2011 "Counting triangles and the
  curse of the last reducer"): each undirected edge is directed from
  its lower-(degree, id) endpoint to the higher, every triangle is
  counted exactly once, and a node's oriented out-degree k implies m
  ≥ k²/2 (its k out-neighbors each have degree ≥ k), so out-degree is
  HARD-bounded by sqrt(2m) — the wedge self-join's per-key fan-out
  cannot blow up on a hub node, which is exactly the "last reducer"
  pathology the orientation exists to kill.
* Frequent-itemset mining is A-priori (Agrawal & Srikant 1994): prune
  items below min-support FIRST (downward closure makes this lossless
  for itemsets at the same support), then explode per-basket
  combinations in-row — bounded by C(basket_cap, 3) — and hash-count.
  One shuffle, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "association_rules",
    "basket_edges",
    "frequent_triples",
    "node_degrees",
    "orient_by_degree",
    "triangle_stats",
]


def basket_edges(baskets: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct undirected co-occurrence edges (u < v) from a
    (basket, item) relation. Per-basket pair fan-out is C(items, 2) —
    bounded by basket size, linear in baskets overall.

    r10 optimization round (guide §2.4 — remove shuffles outright):
    pairs are generated IN-ROW from each basket's sorted distinct-item
    array (the ``frequent_triples`` / ``lsh_candidate_pairs`` explode
    pattern) instead of a basket-keyed self-join. The old form
    evaluated the (basket, item) distinct subtree TWICE (both join
    sides — one full extra input scan + hash agg) and materialized the
    C(k, 2) pairs through a join; this form is ONE scan, one groupBy
    (collect_set dedups in-basket, replacing the pre-join distinct),
    and the same global distinct. The in-row pair array holds C(k, 2)
    structs of the SAME bounded basket the join form already expanded
    to rows — no new blowup mode. Output identical (x < y follows from
    the ascending array_sort)."""
    arrs = (
        baskets.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .groupBy("__b")
        .agg(F.array_sort(F.collect_set("__i")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        arrs.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ids, (x, i) -> transform("
                        "slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS u, y AS v)))"
                    )
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
    )


def node_degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) from an undirected edge list — one union + hash agg."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )


def orient_by_degree(edges: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """Direct each undirected edge (u < v) from the endpoint with the
    smaller (degree, id) to the larger. Degree is computed from the
    edge list itself (one union + hash agg) unless a precomputed
    ``deg`` relation is passed (callers that also need the degree
    sequence — e.g. the wedge census — compute it ONCE and share).
    The join back is keyed on the node — a plain shuffle join, no
    broadcast assumption, because the node set is NOT dim-sized in
    general (AQE broadcasts it at runtime when it fits)."""
    if deg is None:
        deg = node_degrees(edges)
    du = deg.withColumnsRenamed({"node": "u", "deg": "du"})
    dv = deg.withColumnsRenamed({"node": "v", "deg": "dv"})
    e = edges.join(du, "u").join(dv, "v")
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row graph summary: nodes, edges, wedges, triangles, global
    clustering coefficient (3·triangles / wedges).

    Triangles: orient edges by degree, build each node's OUT-adjacency
    array (bounded by sqrt(2m) per the orientation argument in the
    module docstring — max out-degree measured 97 on the sf0.1 fixture
    vs a 1547 bound), then for every oriented edge (u, v) count
    |out(u) ∩ out(v)| IN-ROW. A triangle {a,b,c} with apex a (the one
    vertex with two out-edges inside it) is counted exactly once, at
    edge (a, b) where b is a's out-neighbor with the oriented closing
    edge b→c. This is the GraphFrames/GraphX triangle shape: the same
    Σ-wedges work as the wedge self-join, but no wedge row ever
    materializes — the first cut (self-join + closing join) shuffled
    41 M wedge rows twice at sf0.1 and ran 18.6 s; the intersection
    form runs the identical exact count in ~1/4 the time.
    Wedges are counted on the UNDIRECTED degree sequence: Σ C(deg, 2).
    All counts are exact integers; the only double is the final ratio,
    computed from identical operands on both engines.

    Materialization discipline (r11 optimization round, guide §2.4/§5
    — the r10 form ran FOUR eager-fill jobs and three extra cache
    passes; interleaved A/B: 3.24 → 2.67 s at sf0.1):

    * ``edges`` is persisted but NOT separately filled — its only
      cold-cache reader is the degree aggregation inside ``deg``'s
      fill (the orientation probe runs strictly after the degree
      broadcasts, so it always reads the warm cache; no race).
    * ``deg`` comes from ONE in-row explode of the edge list
      (``array(u, v)``), not a union of two selects — one cache pass
      instead of two. It stays eager-filled: its three consumers (both
      orientation broadcasts and the summary aggregate) evaluate
      concurrently.
    * ``oriented`` is fused into ``adj`` (its only remaining
      consumer): the intersection probe re-derives each oriented edge
      by EXPLODING the adjacency arrays — (src, nbrs) expands to one
      (src, nu, dst) row per out-edge, which is exactly the row the
      r10 plan built by joining ``oriented`` back to ``au``. One
      relation, one fill, one broadcast join instead of two.
    * ``n_edges`` = Σ deg DIV 2 (every edge contributes exactly two
      endpoint occurrences — exact integers), folded into the summary
      aggregate: the separate edge-count pass and its broadcast join
      are gone.
    """
    from .cache import eager_fill

    edges = edges.persist()
    deg = eager_fill(
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    adj = eager_fill(
        orient_by_degree(edges, deg)
        .groupBy("src")
        .agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
        .persist()
    )
    av = adj.withColumnsRenamed({"src": "v_", "nbrs": "nv"})
    # inner join: an edge whose dst has no out-neighbors closes no
    # triangle, so dropping it changes nothing — and keeps the arrays
    # type-generic (no typed empty-array literal needed)
    tri = (
        adj.select(F.col("nbrs").alias("nu"), F.explode("nbrs").alias("dst"))
        .join(av, F.col("dst") == av.v_)
        .select(F.size(F.array_intersect("nu", "nv")).alias("c"))
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )
    # C(deg, 2) per node as exact INTEGER division (even numerator),
    # summed in decimal — no float path anywhere in the counts
    summary = deg.agg(
        F.count("*").alias("n_nodes"),
        F.coalesce(
            F.expr("sum(deg) div 2").cast("bigint"), F.lit(0).cast("bigint")
        ).alias("n_edges"),
        F.coalesce(
            F.sum(
                F.expr("(deg * (deg - 1)) div 2").cast("decimal(38,0)")
            ).cast("bigint"),
            F.lit(0).cast("bigint"),
        ).alias("n_wedges"),
    )
    return (
        summary.join(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("gcc"),
        )
    )


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    basket_cap: int = 32,
) -> DataFrame:
    """Frequent 3-itemsets by A-priori: drop items below
    ``min_support`` (lossless for triples at the same support, by
    downward closure), cap surviving baskets at ``basket_cap`` items
    (over-cap baskets deterministically keep their lowest item ids — a
    guardrail against degenerate mega-baskets; C(32,3) = 4960 structs
    max per row), then explode each basket's sorted-item C(k,3)
    combinations IN-ROW and hash-count. One item-support agg + one
    triple agg — no self-joins; cost is linear in baskets.

    Output: (part_a < part_b < part_c, support ≥ min_support)."""
    # persisted: b feeds the item-support aggregate AND the prune
    # join. Filled by its first consumer — both branches sit above b's
    # OWN distinct exchange, which AQE reuses, so even a cold cache is
    # computed once (r11: the r10 dedicated eager-fill job re-measured
    # on a quiet host as pure overhead — wall 1.76 s without vs 1.87 s
    # with, executor CPU 14.6 vs 15.7)
    b = (
        baskets.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .persist()
    )
    freq_items = (
        b.groupBy("__i")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= int(min_support))
        .select("__i")
    )
    # plain equi-join: the frequent-item relation is vocabulary-sized
    # (≪ corpus, Heaps' law) and derives from an agg whose runtime size
    # AQE sees — it picks the broadcast itself when the side fits
    pruned = b.join(freq_items, "__i")
    arrs = (
        pruned.groupBy("__b")
        .agg(F.slice(F.array_sort(F.collect_set("__i")), 1, int(basket_cap)).alias("ids"))
        .filter(F.size("ids") >= 3)
    )
    triples = arrs.select(
        F.explode(
            F.flatten(
                F.flatten(
                    F.expr(
                        "transform(ids, (x, i) -> "
                        "transform(slice(ids, i + 2, size(ids)), (y, j) -> "
                        "transform(slice(ids, i + j + 3, size(ids)), "
                        "z -> struct(x AS part_a, y AS part_b, z AS part_c))))"
                    )
                )
            )
        ).alias("t")
    ).select("t.part_a", "t.part_b", "t.part_c")
    return (
        triples.groupBy("part_a", "part_b", "part_c")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= int(min_support))
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Directional association rules a→b from frequent co-occurrence
    pairs (the step after A-priori support counting):

        confidence(a→b) = n_ab / n_a
        lift(a→b)       = n_ab · N / (n_a · n_b)

    One basket-bounded pair explode (C(basket,2) per basket, linear in
    baskets), one item-support agg, then each undirected pair emits
    BOTH directions. Counts are exact; confidence/lift are double
    divisions of exact decimal products (identical operands on both
    engines). Rules below ``min_support`` joint occurrences are cut.

    Output: (antecedent, consequent, n_joint, n_ante, confidence, lift).
    """
    b = baskets.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    n_baskets = b.select("__b").distinct().agg(F.count("*").alias("N"))
    item = b.groupBy("__i").agg(F.count("*").alias("n_item"))
    a = b.withColumnRenamed("__i", "u")
    c = b.withColumnRenamed("__i", "v")
    pairs = (
        a.join(c, "__b")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n_joint"))
        .filter(F.col("n_joint") >= int(min_support))
    )
    both = pairs.select(
        F.col("u").alias("antecedent"), F.col("v").alias("consequent"), "n_joint"
    ).unionAll(
        pairs.select(
            F.col("v").alias("antecedent"), F.col("u").alias("consequent"), "n_joint"
        )
    )
    ia = item.withColumnsRenamed({"__i": "antecedent", "n_item": "n_ante"})
    ic = item.withColumnsRenamed({"__i": "consequent", "n_item": "n_cons"})
    D38 = "decimal(38,0)"
    j = both.join(ia, "antecedent").join(ic, "consequent").crossJoin(
        F.broadcast(n_baskets)
    )
    return j.select(
        "antecedent",
        "consequent",
        "n_joint",
        "n_ante",
        (F.col("n_joint").cast("double") / F.col("n_ante").cast("double")).alias(
            "confidence"
        ),
        (
            (F.col("n_joint").cast(D38) * F.col("N").cast(D38)).cast("double")
            / (F.col("n_ante").cast(D38) * F.col("n_cons").cast(D38)).cast("double")
        ).alias("lift"),
    )
