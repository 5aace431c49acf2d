"""ANN quality: the pruned similarity paths must actually find
neighbors — recall@k against the brute-force exact answer, measured on
the real embeddings table. (Recall bounds are data-dependent; these
thresholds pin today's behavior so a regression in bucketing or probing
is caught, while documenting the recall/cost trade the scale paths
make.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potoos_spark.operators.similarity import cosine_topk, ivf_topk, lsh_bucket_topk
from tests.conftest import SF_ORACLE_DIR

K = 10
N_QUERIES = 20


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    rows = cosine_topk(q, embeddings, k=K).collect()
    return {
        (r["query_id"], r["match_id"]) for r in rows
    }


def _recall(approx_rows, exact_pairs):
    hit = sum(1 for r in approx_rows if (r["query_id"], r["match_id"]) in exact_pairs)
    return hit / len(exact_pairs)


def test_ivf_recall(spark, embeddings, exact):
    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    rows = ivf_topk(q, embeddings, k=K, n_cells=8, n_probe=4).collect()
    r = _recall(rows, exact)
    assert r >= 0.5, f"IVF recall@{K} collapsed to {r:.2f}"


def test_lsh_multi_table_recall(spark, embeddings, exact):
    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    rows = lsh_bucket_topk(q, embeddings, k=K, n_bits=4, n_tables=8).collect()
    r = _recall(rows, exact)
    assert r >= 0.5, f"multi-table LSH recall@{K} collapsed to {r:.2f}"


@pytest.mark.parametrize("n_bits", [4, 8])
def test_lsh_recall_sweep_monotone_in_tables(spark, embeddings, exact, n_bits):
    """The documented geometric-miss-shrink claim (similarity.py
    ``lsh_bucket_topk`` docstring) as a parameterized recall table:
    table t reads a fixed dimension slice, so candidates at n_tables=t1
    are a SUBSET of candidates at t2 > t1; with exact re-ranking,
    recall vs the exact top-k is then deterministically non-decreasing
    in n_tables — and the residual miss rate at 8 tables must have
    shrunk materially from 1 table (each added table can only remove
    misses, never add them)."""
    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    recalls = [
        _recall(
            lsh_bucket_topk(
                q, embeddings, k=K, n_bits=n_bits, n_tables=t
            ).collect(),
            exact,
        )
        for t in (1, 2, 4, 8)
    ]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), (n_bits, recalls)
    # the shrink-per-table depends on the per-table collision rate:
    # wide buckets (4 bits -> 16 buckets) collide often, so 8 tables
    # must cut the miss rate hard; narrow buckets (8 bits -> 256
    # buckets over ~1k vectors) collide rarely, so require strict
    # improvement at the ~miss^t independent-tables rate instead
    miss_1, miss_8 = 1 - recalls[0], 1 - recalls[-1]
    shrink = {4: 0.6, 8: 0.92}[n_bits]
    assert miss_8 <= shrink * miss_1 or recalls[-1] >= 0.95, (n_bits, recalls)


def test_lsh_tables_raise_recall(spark, embeddings, exact):
    # the documented recall lever must actually lever
    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    one = _recall(lsh_bucket_topk(q, embeddings, k=K, n_bits=4, n_tables=1).collect(), exact)
    many = _recall(lsh_bucket_topk(q, embeddings, k=K, n_bits=4, n_tables=8).collect(), exact)
    assert many > one


def test_matryoshka_full_width_degenerates_to_exact(spark, embeddings, exact):
    """dims = the full embedding width must reproduce the brute-force
    ranking exactly (the truncation is then the identity); a real
    truncation still returns a full top-k per query with valid
    cosines."""
    from potoos_spark.operators.similarity import matryoshka_topk

    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    full = matryoshka_topk(q, embeddings, dims=64, k=K).collect()
    assert {(r["query_id"], r["match_id"]) for r in full} == exact

    trunc = matryoshka_topk(q, embeddings, dims=16, k=K).collect()
    per_q = {}
    for r in trunc:
        per_q.setdefault(r["query_id"], []).append(r)
        assert -1.0001 <= r["cosine"] <= 1.0001
    assert all(len(v) == K for v in per_q.values())
    assert len(per_q) == N_QUERIES


def test_centroid_drift_identical_is_one_orthogonal_is_zero(spark):
    """Identical class vectors in both md5 halves → drift exactly 1.0
    (integer-sum cosine of proportional vectors); orthogonal halves →
    0.0. ids 6/9 hash to half 'a', 0/1 to half 'b'."""
    from potoos_spark.operators.similarity import centroid_drift

    rows = [
        # label 0: the same vector everywhere
        (6, [1.0, 2.0], 0), (9, [1.0, 2.0], 0),
        (0, [1.0, 2.0], 0), (1, [1.0, 2.0], 0),
        # label 1: half a on x-axis, half b on y-axis
        (11, [1.0, 0.0], 1), (2, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = {r["label"]: r for r in centroid_drift(df).collect()}
    assert got[0]["drift_cosine"] == 1.0
    assert (got[0]["n_a"], got[0]["n_b"]) == (2, 2)
    assert got[1]["drift_cosine"] == 0.0


def test_brute_force_is_self_consistent(spark, embeddings, exact):
    # every query returns exactly K neighbors, none of them itself
    assert len(exact) == N_QUERIES * K
    assert all(q != m for q, m in exact)


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from potoos_spark.operators.similarity import quantize_embeddings

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # all-zero vector
        (3, [-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert got[1]["qvec"] == [127, -63, 32, 0]  # floor(x*127/1 + .5)
    assert got[1]["scale"] == 1.0 / 127.0
    assert got[2]["qvec"] == [0, 0, 0, 0] and got[2]["scale"] == 0.0
    # dequantized error bounded by scale/2 per element
    q, s = got[3]["qvec"], got[3]["scale"]
    for orig, qi in zip([-2.0, 2.0, 1.0, -1.0], q):
        assert abs(qi * s - orig) <= s / 2 + 1e-12
    assert all(-127 <= v <= 127 for v in q)


def test_quantized_topk_recall_vs_exact(spark):
    """int8 search must track full-precision search closely: recall@10
    over the sf0.01 embeddings ≥ 0.8 (quantization error only)."""
    from potoos_spark.operators.similarity import cosine_topk, quantized_topk

    e = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    exact = {}
    for r in cosine_topk(q, e, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["match_id"])
    quant = {}
    for r in quantized_topk(q, e, k=10).collect():
        quant.setdefault(r["query_id"], set()).add(r["match_id"])
    recalls = [
        len(exact[qid] & quant.get(qid, set())) / len(exact[qid]) for qid in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_rerank_recall_at_least_quantized(spark):
    """The two-stage funnel's recall@10 vs exact must be ≥ the
    quantized-only recall (re-ranking candidates with exact cosines
    can only fix stage-1 ordering mistakes, never add new ones), and
    its reported cosines must EQUAL the exact cosines for every
    returned pair (final scores are full-precision)."""
    from potoos_spark.operators.similarity import (
        cosine_topk,
        quantized_topk,
        rerank_topk,
    )

    e = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["match_id"])
        return out

    exact_df = cosine_topk(q, e, k=10)
    exact = topk_sets(exact_df)
    quant = topk_sets(quantized_topk(q, e, k=10))
    rr_df = rerank_topk(q, e, k=10, expand=4)
    rr = topk_sets(rr_df)

    def recall(got):
        return sum(
            len(exact[qid] & got.get(qid, set())) / len(exact[qid])
            for qid in exact
        ) / len(exact)

    assert recall(rr) >= recall(quant), (recall(rr), recall(quant))
    assert recall(rr) >= 0.9, recall(rr)
    exact_cos = {
        (r["query_id"], r["match_id"]): r["cosine"] for r in exact_df.collect()
    }
    for r in rr_df.collect():
        key = (r["query_id"], r["match_id"])
        if key in exact_cos:
            assert r["cosine"] == exact_cos[key], key


def test_range_search_matches_bruteforce_filter_and_plan(spark):
    """r6: radius search must equal the unranked brute-force score set
    filtered at the bar, and its plan must contain NO window and NO
    shuffle exchange — the map-only shape is the operator's point."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.similarity import cosine_topk, range_search
    from tests.conftest import SF_DIR

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    n_corpus = e.count()
    rs = range_search(q, e, threshold=0.25)
    got = {(r["query_id"], r["match_id"]): r["cosine"] for r in rs.collect()}
    assert got and all(v >= 0.25 for v in got.values())
    # brute top-k with k = corpus size is the full scored relation
    full = cosine_topk(q, e, k=n_corpus).filter(F.col("cosine") >= 0.25)
    want = {(r["query_id"], r["match_id"]): r["cosine"] for r in full.collect()}
    assert got == want
    plan = rs._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "ShuffleExchange" not in plan.replace("Exchange hashpartitioning", "ShuffleExchange"), plan


def test_semantic_dedup_cells_planted_duplicates_and_precision(spark):
    """r6: SemDeDup cell blocking. (1) PRECISION: every emitted pair is
    a true pair with the exact integer-scaled cosine — the blocked
    output must be a subset of the brute-force scored relation with
    equal scores. (2) RECALL on TRUE near-duplicates: plant a lightly
    perturbed copy of each of 50 corpus vectors (cosine ≈ 1); a
    duplicate shares its source's nearest cell by construction, so the
    planted pairs must be recovered at a high-threshold bar."""
    from potoos_spark.operators.similarity import (
        cosine_topk,
        semantic_dedup_cells,
    )

    e = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")

    # (1) precision / exactness on the raw corpus at the loose bar
    got = semantic_dedup_cells(e, threshold=0.4)
    n_corpus = e.count()
    full = cosine_topk(
        e.limit(0).unionByName(e), e, k=n_corpus
    )  # full scored relation (query side = whole corpus)
    exact = {
        (min(r["query_id"], r["match_id"]), max(r["query_id"], r["match_id"])): r[
            "cosine"
        ]
        for r in full.filter(F.col("cosine") >= 0.4).collect()
    }
    for r in got.collect():
        key = (r["id_a"], r["id_b"])
        assert key in exact, key
        assert r["cosine"] == exact[key], key

    # (2) planted-duplicate recall: copy of vec v with one element
    # nudged -> cosine just under 1, same nearest cell as v
    src = e.filter(F.col("vec_id") < 50)
    planted = src.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.lit(0.01)).otherwise(x),
        ).alias("embedding"),
    )
    corpus = e.select("vec_id", "embedding").unionByName(planted)
    pairs = semantic_dedup_cells(corpus, threshold=0.9)
    found = {
        (r["id_a"], r["id_b"]) for r in pairs.collect()
    }
    want = {(i, i + 100000) for i in range(50)}
    recall = len(want & found) / len(want)
    assert recall >= 0.9, f"planted-duplicate recall collapsed to {recall:.2f}"


def test_semantic_dedup_cells_plan_is_blocked(spark):
    """r8 vectorized shape: a MAP-ONLY Arrow assignment kernel (the
    codebook rides as a Python closure, no join at all) feeding ONE
    per-cell FlatMapGroupsInPandas — exactly one shuffle (the groupBy
    cell), never a cartesian product or a corpus-wide pair join."""
    from potoos_spark.operators.similarity import semantic_dedup_cells

    e = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    plan = (
        semantic_dedup_cells(e)._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected ONE shuffle, saw {n_exchanges}:\n{plan}"


def test_whiten_dims_standardizes_each_dimension(spark):
    """r6: per-dim z-scores must have (population) mean 0 and sd 1 up
    to float tolerance, and be invariant to input partitioning."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.similarity import whiten_dims
    from tests.conftest import SF_DIR

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    z = whiten_dims(e)
    stats = (
        z.groupBy("dim")
        .agg(F.avg("z").alias("m"), F.avg(F.col("z") * F.col("z")).alias("ms"))
        .collect()
    )
    assert stats
    for r in stats:
        assert abs(r["m"]) < 1e-9, r
        assert abs(r["ms"] - 1.0) < 1e-9, r
    a = sorted(map(tuple, z.collect()))
    b = sorted(map(tuple, whiten_dims(e.repartition(7)).collect()))
    assert a == b  # exact-integer moments -> partitioning-invariant


def test_binary_hamming_packing_and_exactness(spark):
    """r6: sign-bit packing must be exact and deterministic — a known
    4-dim vector packs to the expected single word, and the Hamming
    distance of complementary vectors equals the dimension."""
    from potoos_spark.operators.similarity import (
        binary_hamming_topk,
        binary_sign_words,
    )

    rows = [
        (1, [1.0, -1.0, 2.0, -0.5]),   # bits 0,2 -> word 0b0101 = 5
        (2, [-1.0, 1.0, -2.0, 0.5]),   # complement -> 0b1010 = 10
        (3, [1.0, -1.0, 2.0, -0.5]),   # identical to 1
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    words = {
        r["vec_id"]: r["w"]
        for r in df.select(
            "vec_id", binary_sign_words(F.col("embedding")).alias("w")
        ).collect()
    }
    assert words[1] == [5] and words[2] == [10] and words[3] == [5]
    got = {
        (r["query_id"], r["match_id"]): r["hamming"]
        for r in binary_hamming_topk(df.filter(F.col("vec_id") == 1), df, k=2).collect()
    }
    assert got[(1, 3)] == 0 and got[(1, 2)] == 4


def test_binary_sign_words_empty_vector_packs_to_empty(spark):
    """ADVICE r6: an empty embedding must pack to [] (matching DuckDB's
    range(0)), not the [0, -1]-driven phantom zero words Spark's
    step-defaulting sequence(0, -1) would produce — otherwise empty
    vectors silently sit at Hamming 0 from each other."""
    from potoos_spark.operators.similarity import binary_sign_words

    rows = [(1, []), (2, [1.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    words = {
        r["vec_id"]: r["w"]
        for r in df.select(
            "vec_id", binary_sign_words(F.col("embedding")).alias("w")
        ).collect()
    }
    assert words[1] == [] and words[2] == [1]


def test_binary_rerank_recall_monotone_in_expand(spark, embeddings, exact):
    """The Hamming-rank candidate set at expand e1 is a PREFIX of the
    set at e2 > e1, so funnel recall vs exact is deterministically
    non-decreasing in expand — and must be high once the pool is wide
    (64-dim fixture = only a 64-bit signature; real 768-dim embeddings
    reach the same recall at far smaller expand)."""
    from potoos_spark.operators.similarity import binary_rerank_topk

    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    recalls = [
        _recall(
            binary_rerank_topk(q, embeddings, k=K, expand=ex).collect(), exact
        )
        for ex in (4, 8, 16)
    ]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] >= 0.85, recalls


def test_binary_rerank_cosines_are_exact(spark, embeddings, exact):
    """Funnel output scores must EQUAL the brute-force cosines for
    every returned pair (stage 2 is full precision)."""
    from potoos_spark.operators.similarity import binary_rerank_topk, cosine_topk

    q = embeddings.filter(F.col("vec_id") < N_QUERIES)
    exact_cos = {
        (r["query_id"], r["match_id"]): r["cosine"]
        for r in cosine_topk(q, embeddings, k=embeddings.count()).collect()
    }
    for r in binary_rerank_topk(q, embeddings, k=K, expand=8).collect():
        assert r["cosine"] == exact_cos[(r["query_id"], r["match_id"])]


@pytest.fixture(scope="module")
def clustered(spark):
    """Mixture-of-Gaussians fixture (VERDICT r6 item 3): the real
    embeddings table is near-random — the worst case for coarse
    quantizers — so tier-choice guidance needs a fixture with the
    cluster structure trained embeddings actually have. Same generator
    and seed as scripts/ann_recall_sweep.py."""
    import sys as _sys

    _sys.path.insert(0, "scripts")
    from ann_recall_sweep import make_clustered

    e = make_clustered(spark).persist()
    e.count()
    return e


@pytest.fixture(scope="module")
def clustered_exact(spark, clustered):
    q = clustered.filter(F.col("vec_id") < N_QUERIES)
    rows = cosine_topk(q, clustered, k=K).collect()
    return {(r["query_id"], r["match_id"]) for r in rows}


def test_ivf_recall_gate_on_clustered_fixture(spark, clustered, clustered_exact):
    """r7 gate: on cluster-structured embeddings, IVF at the documented
    default (16 cells, probe 2) must reach recall ≥ 0.8 — the setting
    production tier choice is based on (the near-random real fixture
    floors it at 0.29, documented in SCALE.md)."""
    from potoos_spark.operators.similarity import ivf_topk_md5

    q = clustered.filter(F.col("vec_id") < N_QUERIES)
    got = ivf_topk_md5(q, clustered, k=K, n_cells=16, n_probe=2).collect()
    assert _recall(got, clustered_exact) >= 0.8


def test_pq_recall_gate_on_clustered_fixture(spark, clustered, clustered_exact):
    """r7 gate: the tuned PQ funnel (16 subspaces, expand 8) must reach
    recall ≥ 0.8 on cluster-structured embeddings (measured 0.955 at
    landing; the default nsub=8/expand=4 sits at 0.51 — the sweep
    table documents both)."""
    from potoos_spark.operators.similarity import pq_rerank_topk

    q = clustered.filter(F.col("vec_id") < N_QUERIES)
    got = pq_rerank_topk(q, clustered, k=K, expand=8, n_sub=16).collect()
    assert _recall(got, clustered_exact) >= 0.8


def test_ivf_recall_gate_holds_with_auto_cells_at_two_sizes(spark):
    """VERDICT r7 item 3 done-criterion: with ``n_cells=None`` the
    quantizer derives ``auto_n_cells(count)`` — ceil(N/256) clamped —
    and the clustered-fixture recall gate must hold at TWO corpus
    sizes (1000 → 4 cells, 4000 → 16 cells), so the auto schedule is
    recall-safe across a 4× size step, not tuned to one fixture."""
    import sys as _sys

    _sys.path.insert(0, "scripts")
    from ann_recall_sweep import make_clustered

    from potoos_spark.operators.similarity import (
        auto_n_cells,
        cosine_topk,
        ivf_topk_md5,
    )

    assert auto_n_cells(1000) == 4
    assert auto_n_cells(4000) == 16
    for n in (1000, 4000):
        e = make_clustered(spark, n=n).persist()
        try:
            q = e.filter(F.col("vec_id") < N_QUERIES)
            exact = {
                (r["query_id"], r["match_id"])
                for r in cosine_topk(q, e, k=K).collect()
            }
            got = ivf_topk_md5(q, e, k=K).collect()  # auto cells
            r = _recall(got, exact)
            assert r >= 0.8, f"n={n}: auto-cell recall {r:.2f}"
        finally:
            e.unpersist()


def test_auto_n_cells_schedule_properties():
    """The lever itself: constant expected membership, clamped ends,
    monotone in N — pure arithmetic, no session."""
    from potoos_spark.operators.similarity import AUTO_CELL_TARGET, auto_n_cells

    assert auto_n_cells(0) == 4  # lower clamp
    assert auto_n_cells(10**12) == 65536  # upper clamp
    prev = 0
    for n in (10_000, 100_000, 1_000_000, 10_000_000):
        cells = auto_n_cells(n)
        assert cells >= prev, "schedule must be monotone"
        prev = cells
        # expected membership stays within 2x of the target
        assert n / cells <= 2 * AUTO_CELL_TARGET


def test_mutual_neighbors_keeps_only_reciprocal_edges(spark):
    """r7 mutual-kNN: an edge survives iff BOTH directions are in the
    top-k edge list — hand-built edges where (1,2) is mutual and the
    hub 3 appears in 1's list without reciprocating."""
    from potoos_spark.operators.similarity import mutual_neighbors

    edges = spark.createDataFrame(
        [
            (1, 2, 0.9, 1), (2, 1, 0.9, 1),   # mutual
            (1, 3, 0.8, 2),                    # 3 never lists 1
            (3, 2, 0.7, 1), (2, 3, 0.7, 2),   # mutual
        ],
        "query_id bigint, match_id bigint, cosine double, rank bigint",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["rank_ab"], r["rank_ba"])
        for r in mutual_neighbors(edges).collect()
    }
    assert got == {(1, 2): (1, 1), (2, 3): (2, 1)}


def test_knn_classify_majority_vote_and_tiebreak(spark):
    """r7 kNN label probe: 3-vs-2 majority wins; an exact vote tie
    breaks to the smaller label; correct compares to the query's own
    label."""
    from potoos_spark.operators.similarity import knn_classify

    # query 0; neighbors interleave by distance: labels 1,2,1,2,1 so
    # k=5 gives a 3-2 majority and k=4 an exact 2-2 tie
    rows = [(0, [1.0, 0.0], 1)]
    rows += [(i, [1.0, 0.01 * i], 1) for i in (1, 3, 5)]
    rows += [(i, [1.0, 0.01 * i], 2) for i in (2, 4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    got = {r["query_id"]: r for r in knn_classify(df.filter("vec_id = 0"), df, k=5).collect()}
    r = got[0]
    assert r["pred_label"] == 1 and r["votes"] == 3 and bool(r["correct"])
    # tie: 2 votes each -> smaller label wins
    got4 = knn_classify(df.filter("vec_id = 0"), df, k=4).collect()[0]
    assert got4["votes"] == 2 and got4["pred_label"] == 1


def test_kmeans_lloyd_separated_clusters_and_partitioning_invariance(spark):
    """r7 Lloyd k-means: on two well-separated blobs with k=2 the final
    cells hold exactly the blobs and inertia is the exact integer
    within-cluster spread; the whole trajectory is integer arithmetic,
    so repartitioning cannot change ANY output bit."""
    from potoos_spark.operators.similarity import kmeans_lloyd

    rows = [(i, [10.0 + 0.001 * i, 0.0]) for i in range(6)]
    rows += [(10 + i, [-10.0 - 0.001 * i, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = sorted(tuple(r) for r in kmeans_lloyd(df, k=2, n_iters=2).collect())
    assert [r[1] for r in got] == [6, 6]  # each blob intact
    again = sorted(
        tuple(r) for r in kmeans_lloyd(df.repartition(7), k=2, n_iters=2).collect()
    )
    assert got == again


def test_kcenter_coreset_greedy_properties(spark):
    """r7 greedy k-center: covering radius is non-increasing over
    rounds (the chosen max-min distance can only shrink as the set
    grows), centers are distinct, k = N selects everything, and the
    selection SEQUENCE is repartition-invariant (exact integer
    arithmetic end to end)."""
    from potoos_spark.operators.similarity import kcenter_coreset

    rows = [(i, [float(i % 7) * 3.0, float(i // 7)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = sorted(
        (r["round"], r["center_id"], r["radius_sq"])
        for r in kcenter_coreset(df, k=5).collect()
    )
    assert [r[0] for r in got] == list(range(5))
    assert len({r[1] for r in got}) == 5
    radii = [r[2] for r in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii
    again = sorted(
        (r["round"], r["center_id"], r["radius_sq"])
        for r in kcenter_coreset(df.repartition(5), k=5).collect()
    )
    assert got == again
    full = kcenter_coreset(df, k=12).collect()
    assert {r["center_id"] for r in full} == set(range(12))


def test_cluster_balanced_sample_caps_and_balance(spark):
    """Two blobs, one 5x the other: per_cell=4 keeps exactly 4 from the
    big blob and all 3 of the small one — rare modes keep representation
    — and the md5 ranking is partitioning-invariant."""
    from potoos_spark.operators.similarity import cluster_balanced_sample

    rows = [(i, [10.0 + 0.001 * i, 0.0]) for i in range(15)]
    rows += [(100 + i, [-10.0 - 0.001 * i, 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = cluster_balanced_sample(df, per_cell=4, k=2, n_iters=2).collect()
    by_cell = {}
    for r in got:
        by_cell.setdefault(r.cell, set()).add(r.vec_id)
    sizes = sorted(len(v) for v in by_cell.values())
    assert sizes == [3, 4]
    small = [v for v in by_cell.values() if len(v) == 3][0]
    assert small == {100, 101, 102}
    again = cluster_balanced_sample(
        df.repartition(5), per_cell=4, k=2, n_iters=2
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_pca_power_recovers_stretched_axis(spark):
    """Data stretched along dim 0 with tiny dim-1 noise: the top
    direction is (±1000, ~0) and the whole integer trajectory is
    partitioning-invariant."""
    from potoos_spark.operators.similarity import pca_top_direction

    rows = [(i, [float(i - 50), float((i % 3) - 1) * 0.01]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = sorted((r.dim, r.component) for r in pca_top_direction(df).collect())
    assert got == [(0, 1000), (1, 0)]
    again = sorted(
        (r.dim, r.component)
        for r in pca_top_direction(df.repartition(7)).collect()
    )
    assert got == again


def test_pca_power_rotation_mix(spark):
    """45-degree stretched data: both components share the dominant
    axis sign pattern (equal magnitude up to integer rescale)."""
    from potoos_spark.operators.similarity import pca_top_direction

    rows = [(i, [float(i - 50) + 0.01 * (i % 5), float(i - 50)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.dim: r.component for r in pca_top_direction(df).collect()}
    assert abs(out[0] - out[1]) <= 10  # ~equal loadings on the diagonal
    assert abs(out[0]) >= 900


def test_pca_project_orders_along_axis(spark):
    """Projection scores are monotone along the dominant axis and
    centered (sum ~ 0 up to floor-mean truncation)."""
    from potoos_spark.operators.similarity import pca_project

    rows = [(i, [float(i), 0.001 * (i % 7)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {r.vec_id: r.proj for r in pca_project(df).collect()}
    vals = [got[i] for i in range(60)]
    assert vals == sorted(vals) or vals == sorted(vals, reverse=True)
    assert abs(sum(vals)) <= 60 * 1000  # centered up to per-dim floor error


def test_ann_recall_eval_perfect_on_sign_separable(spark):
    """Axis-aligned clusters (+1 / -1 patterns): the binary tier ranks
    exactly like cosine, so recall@k is 1.0 for every query."""
    from potoos_spark.operators.similarity import ann_recall_eval

    rows = [(i, [1.0 + 0.001 * i, 1.0, -1.0]) for i in range(8)]
    rows += [(100 + i, [-1.0 - 0.001 * i, -1.0, 1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = ann_recall_eval(df.filter("vec_id < 8"), df, k=7).collect()
    assert len(out) == 8
    assert all(r.recall == 1.0 and r.n_overlap == 7 for r in out)


def test_two_level_ivf_recall_gate_on_clustered_fixture(
    spark, clustered, clustered_exact
):
    """r8: below IVF2_HIER_MIN_CELLS the funnel must degenerate to
    EXACTLY flat assignment (a handful of random-medoid supers routes
    poorly — measured 0.48-0.72 vs flat 0.89-0.94 before the
    self-gating rule), so the small-fixture gate is the flat gate."""
    from potoos_spark.operators.similarity import (
        _ivf2_n_super,
        auto_n_cells,
        ivf_topk_two_level,
    )

    assert _ivf2_n_super(auto_n_cells(2000)) == auto_n_cells(2000)  # flat
    q = clustered.filter(F.col("vec_id") < N_QUERIES)
    got = ivf_topk_two_level(q, clustered, k=K).collect()
    assert _recall(got, clustered_exact) >= 0.8


def test_two_level_ivf_engaged_regime_equal_budget_recall(spark):
    """The hierarchy's actual regime: a corpus big enough that
    C >= IVF2_HIER_MIN_CELLS (24k vectors -> C = 94, S = 10). The
    funnel cuts per-vector assignment from C to S + nsa*C/S ~ 29
    distances (3.2x); the honest recall comparison is EQUAL TOTAL
    BUDGET: granting the two-level funnel ONE extra probe costs
    Q*(N/C) extra candidate scores (query-scale) while the assignment
    saving is N*(C - 29) distances (corpus-scale, ~2500x larger at
    N = 24k, Q = 20) — so two_level(np+1) must reach at least
    flat(np)'s recall. Measured 0.775 vs 0.760 at landing (and
    recall PARITY at equal np once C ~ 157: 0.535 vs 0.540)."""
    import sys as _sys

    _sys.path.insert(0, "scripts")
    from ann_recall_sweep import make_clustered

    from potoos_spark.operators.similarity import (
        _ivf2_n_super,
        auto_n_cells,
        cosine_topk,
        ivf_topk_md5,
        ivf_topk_two_level,
    )

    C = auto_n_cells(24_000)
    assert _ivf2_n_super(C) < C  # hierarchy actually engaged
    e = make_clustered(spark, n=24_000).persist()
    try:
        q = e.filter(F.col("vec_id") < N_QUERIES)
        exact = {
            (r["query_id"], r["match_id"])
            for r in cosine_topk(q, e, k=K).collect()
        }
        flat = _recall(ivf_topk_md5(q, e, k=K, n_probe=3).collect(), exact)
        two = _recall(
            ivf_topk_two_level(q, e, k=K, n_probe=4).collect(), exact
        )
        assert two >= flat, (two, flat)
    finally:
        e.unpersist()


def test_two_level_ivf_partitioning_invariant(spark):
    """Bit-determinism across partitionings — the md5 draws, integer
    argmins, and id ties must make the full funnel layout-independent."""
    from potoos_spark.operators.similarity import ivf_topk_two_level
    from tests.conftest import SF_ORACLE_DIR

    e = spark.read.parquet(f"{SF_ORACLE_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk_two_level(q, e, k=5).collect()))
    b = sorted(
        map(
            tuple,
            ivf_topk_two_level(
                q.repartition(7), e.repartition(13), k=5
            ).collect(),
        )
    )
    assert a == b and a
