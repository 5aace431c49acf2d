"""Scale-shape regressions for the dedup funnel (VERDICT r2 items 1-2):

* no *forced* broadcast hints anywhere in the near-dup pipelines — the
  canonicals/candidate sides are corpus-proportional on dup-heavy data,
  so the plans must leave broadcast-vs-shuffle to AQE;
* the banded Hamming join is an equality hash join (never a cartesian)
  and its pigeonhole recall is exact: every pair within Hamming <= k is
  found, verified against an in-driver brute-force over the same
  fingerprints.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from potoos_spark.operators.dedup import (
    levenshtein_pairs,
    minhash_dedup_pairs,
    simhash,
    simhash_dup_groups,
    simhash_hamming_pairs,
)
from tests.conftest import SF_DIR
from tests.test_plans import _plan


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bottomk_containment_exact_for_small_docs_and_directional(spark):
    """A contained doc with ≤ k shingles gets an EXACT containment
    (the bottom-k sample is the full set): est 1.0 toward its host,
    with the pair oriented (contained, host). The reverse direction
    scores the host's overlap fraction, strictly below 1."""
    from potoos_spark.operators.dedup import (
        bottomk_containment_pairs,
        shingle_frame,
    )

    host = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    df = spark.createDataFrame(
        [(1, host), (2, "gamma delta epsilon zeta eta")],
        "doc_id bigint, text string",
    )
    rows = {
        (r["id_a"], r["id_b"]): r
        for r in bottomk_containment_pairs(shingle_frame(df), k=8).collect()
    }
    fwd = rows[(2, 1)]  # doc 2 (3 shingles) contained in doc 1
    assert fwd["k_used"] == 3 and fwd["m"] == 3
    assert fwd["est_containment"] == 1.0
    rev = rows[(1, 2)]  # host direction: 8-sample of doc 1, 3 hits max
    assert rev["k_used"] == 8 and rev["m"] <= 3
    assert rev["est_containment"] < 1.0


def test_df_cap_drops_boilerplate_keeps_discriminative(spark):
    """A shingle present in every doc (boilerplate) must vanish at
    df_cap below the corpus size, while rare shingles survive — and the
    capped containment still scores the embedded pair via the
    discriminative shingles alone."""
    from potoos_spark.operators.dedup import (
        containment_pairs,
        df_capped_shingles,
        shingle_frame,
    )

    boiler = "click here to subscribe now"
    df = spark.createDataFrame(
        [
            (1, f"{boiler} alpha beta gamma delta epsilon"),
            (2, f"{boiler} alpha beta gamma"),
            (3, f"{boiler} totally different content here"),
            (4, f"{boiler} yet more unrelated words everywhere"),
        ],
        "doc_id bigint, text string",
    )
    sh = shingle_frame(df)
    capped = df_capped_shingles(sh, df_cap=2)
    surviving = {r["s"] for r in capped.select("s").distinct().collect()}
    assert "click_here_to" not in surviving  # df=4 > cap
    assert any("alpha" in s for s in surviving)  # df=2 shingles survive
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(capped).collect()
    }
    assert cont[(1, 2)] == 1.0  # doc 2's capped shingles all inside doc 1


def test_capped_posting_operators_match_joinback_shapes(spark):
    """The r4 posting-array operators (one corpus explode, in-row pair
    generation from cap-bounded arrays) must be row-identical to the
    join-back compositions they replace, for containment, Jaccard, and
    bottom-k containment alike."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.dedup import (
        bottomk_containment_pairs,
        capped_bottomk_containment_pairs,
        capped_containment_pairs,
        capped_jaccard_pairs,
        containment_pairs,
        df_capped_shingles,
        jaccard_pairs,
        shingle_frame,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{base} variant {i % 7} tail {i % 3}") for i in range(40)] + [
        (100 + i, f"totally unique document number {i} with its own words only")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingle_frame(df)
    capped = df_capped_shingles(sh, df_cap=10)

    want = sorted(map(tuple, containment_pairs(capped).collect()))
    got = sorted(map(tuple, capped_containment_pairs(sh, 10).collect()))
    assert got == want

    want = sorted(map(tuple, jaccard_pairs(capped).collect()))
    got = sorted(map(tuple, capped_jaccard_pairs(sh, 10).collect()))
    assert got == want

    want = sorted(
        map(tuple, bottomk_containment_pairs(capped, k=4).collect())
    )
    got = sorted(
        map(tuple, capped_bottomk_containment_pairs(sh, 10, k=4).collect())
    )
    assert got == want
    spark.catalog.clearCache()


def test_topk_containment_bounds_emission_per_doc(spark):
    """r9 (VERDICT r8 item 3): the emission-bounded containment form —
    per doc at most k partners, ranked (containment DESC, other_id),
    and each emitted row must agree exactly with the unbounded capped
    relation it was cut from."""
    from potoos_spark.operators.dedup import (
        capped_containment_pairs,
        shingle_frame,
        topk_containment_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{base} variant {i % 7} tail {i % 3}") for i in range(40)] + [
        (100 + i, f"totally unique document number {i} with its own words only")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingle_frame(df)
    k = 3
    got = topk_containment_pairs(sh, 10, k_per_doc=k).collect()
    spark.catalog.clearCache()
    full = capped_containment_pairs(sh, 10).collect()
    spark.catalog.clearCache()

    # bounded: at most k rows per doc, ranks 1..k without gaps
    per_doc = {}
    for r in got:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in per_doc.items():
        assert len(rs) <= k
        assert sorted(x["rnk"] for x in rs) == list(range(1, len(rs) + 1))

    # faithful: the kept rows are EXACTLY the per-doc top-k of the
    # symmetrized unbounded relation (ties on partner id)
    sym = {}
    for r in full:
        sym.setdefault(r["id_a"], []).append((r["id_b"], r))
        sym.setdefault(r["id_b"], []).append((r["id_a"], r))
    for d, partners in sym.items():
        want = sorted(
            partners, key=lambda p: (-p[1]["containment"], p[0])
        )[:k]
        have = sorted(per_doc.get(d, []), key=lambda x: x["rnk"])
        assert [h["other_id"] for h in have] == [w[0] for w in want]
        for h, (oid, w) in zip(have, want):
            assert h["shared"] == w["shared"]
            assert h["containment"] == w["containment"]


def test_capped_posting_pair_plan_has_no_selfjoin_or_window(spark):
    """Plan pin for the posting-array scorers: candidate pairs must come
    from the in-row double explode (Generate nodes), never a shingle
    self-join (the quadratic shuffle) or a per-doc row_number window."""
    from potoos_spark.operators.dedup import (
        capped_bottomk_containment_pairs,
        capped_containment_pairs,
        shingle_frame,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c x y")], "doc_id bigint, text string"
    )
    sh = shingle_frame(df)
    plan = capped_containment_pairs(sh, 5)._jdf.queryExecution().executedPlan().toString()
    # the only joins are the two thin doc-keyed size joins
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 2
    assert "Window" not in plan
    bkplan = (
        capped_bottomk_containment_pairs(sh, 5, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in bkplan  # bottom-k is an agg, not a ranked window
    spark.catalog.clearCache()


def test_keep_longest_policy_and_aggregate_plan(spark):
    """Raw variants of one normalized content: the keeper is the longest
    raw text, ties break to the min id, and the plan is an aggregation
    (map-side combinable), not a ranked window."""
    from potoos_spark.operators.dedup import exact_dedup_keep_longest

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "Hello, World!!!"),   # same normalized text, longer raw
            (3, "HELLO world"),
            (9, "something else"),
        ],
        "doc_id bigint, text string",
    )
    out = exact_dedup_keep_longest(df)
    rows = {r["keep_id"]: r for r in out.collect()}
    assert rows[2]["n_docs"] == 3 and rows[2]["keep_chars"] == 15
    assert rows[9]["n_docs"] == 1
    assert "Window" not in _plan(out)


def test_minhash_estimate_exact_on_identical_docs(spark):
    """Identical documents agree on every signature component → the
    estimator reads exactly 1.0 with zero error against exact Jaccard;
    every estimate is a k-quantized value in [0, 1] and the error
    column is |est - exact| by construction."""
    from potoos_spark.operators.dedup import minhash_estimate_pairs

    df = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight"),
            (2, "one two three four five six seven eight"),
            (3, "one two three four nine ten eleven twelve"),
        ],
        "doc_id bigint, text string",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in minhash_estimate_pairs(df, k=8).collect()}
    dup = rows[(1, 2)]
    assert dup["est_jaccard"] == 1.0 and dup["jaccard"] == 1.0
    assert dup["abs_err"] == 0.0
    for r in rows.values():
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert r["abs_err"] == abs(r["est_jaccard"] - r["jaccard"])


def test_levenshtein_canon_join_not_forced_broadcast(spark):
    df = levenshtein_pairs(_docs(spark))
    # no broadcast hint survives analysis: AQE decides at runtime
    assert "ResolvedHint" not in _analyzed(df)
    # the blocking join is keyed on the 32-bit fingerprint
    assert "simhash" in _plan(df)


def test_minhash_pipeline_not_forced_broadcast(spark):
    df = minhash_dedup_pairs(_docs(spark))
    assert "ResolvedHint" not in _analyzed(df)


def test_simhash_hamming_is_equality_join(spark):
    df = simhash_hamming_pairs(_docs(spark), max_hamming=3)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_val" in plan  # candidate join keyed on the band value


def test_simhash_hamming_exact_recall_vs_bruteforce(spark):
    docs = _docs(spark).limit(400)
    k = 3
    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs).collect()
    }
    want = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= k
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_hamming_pairs(docs, max_hamming=k).collect()
    }
    # pigeonhole banding has NO false negatives (and verify removes all
    # false positives) so the result is exactly the brute-force set
    assert got == want


def test_simhash_hamming_zero_contains_dup_groups(spark):
    docs = _docs(spark)
    groups = simhash_dup_groups(docs)
    n_grouped = groups.agg(
        F.sum(F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("bigint").alias("p")
    ).collect()[0]["p"]
    pairs0 = simhash_hamming_pairs(docs, max_hamming=0).count()
    assert pairs0 == (n_grouped or 0)


def test_simhash_keep_best_picks_lowest_score(spark):
    """The keeper of every group is the member with the minimum
    (score, id); keep_score is that member's score; singletons are
    dropped; the plan has no Window (min_by hash agg only)."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.dedup import simhash_keep_best

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # same fingerprint as 1
            (3, "alpha beta gamma delta"),   # same fingerprint as 1
            (4, "completely different words entirely"),
        ],
        "doc_id int, text string",
    )
    scores = spark.createDataFrame(
        [(1, 5.0), (2, 3.5), (3, 3.5), (4, 1.0)],
        "doc_id int, avg_nll double",
    )
    got = simhash_keep_best(docs, scores).collect()
    assert len(got) == 1
    (g,) = got
    assert g["n_docs"] == 3
    assert g["keep_id"] == 2       # min score 3.5, tie -> min id
    assert g["keep_score"] == 3.5
    plan = (
        simhash_keep_best(docs, scores)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


# --- skewed-corpus stress (VERDICT r4 item 5): one boilerplate text
# owns 50% of the corpus — the viral-dup shape a crawl develops --------


def _skewed_corpus(spark, n_hot=10_000, n_cold=10_000):
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "breaking update subscribe to our newsletter terms of service "
            "apply contact the editors for syndication rights today"
        ).alias("text"),
    )
    cold = spark.range(n_cold).select(
        (F.col("id") + n_hot).alias("doc_id"),
        F.concat(
            F.lit("unique report segment "),
            F.col("id").cast("string"),
            F.lit(" covering district "),
            (F.col("id") % 997).cast("string"),
            F.lit(" with independent findings and measurement "),
            (F.col("id") * 7919).cast("string"),
        ).alias("text"),
    )
    return hot.unionAll(cold)


def test_chunk_dedup_on_boilerplate_dominated_corpus(spark):
    """50% of docs are the SAME passage set: the first doc keeps every
    passage, the other 9,999 hot docs keep nothing, and the plan stays
    the map-side-combinable min-struct agg (no Window anywhere — a
    ranked window over the passage-hash partition would funnel the
    10k-occurrence hash through one sort task). Wall-time bounded."""
    import time

    from potoos_spark.operators.dedup import chunk_dedup

    docs = _skewed_corpus(spark)
    out = chunk_dedup(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

    t0 = time.perf_counter()
    rows = {r["doc_id"]: r for r in out.collect()}
    elapsed = time.perf_counter() - t0
    assert elapsed < 90, f"skewed chunk_dedup took {elapsed:.0f}s"

    assert len(rows) == 20_000
    first = rows[0]
    assert first["n_kept"] == first["n_chunks"] > 0
    # every other hot doc: all passages seen at doc 0
    for did in (1, 5_000, 9_999):
        assert rows[did]["n_kept"] == 0 and rows[did]["text_dedup"] == ""
    # cold docs survive with most of their text
    assert rows[15_000]["n_kept"] > 0


def test_simhash_keep_best_on_boilerplate_dominated_corpus(spark):
    """The 10k-member fingerprint group must collapse through the
    min_by hash agg (windowless plan) to the single lowest-score
    member, ties to the min id."""
    import time

    from potoos_spark.operators.dedup import simhash_keep_best

    docs = _skewed_corpus(spark)
    # synthetic fluency scores: minimum 0.0 at every doc_id % 100 == 7,
    # so the hot group has many tied best scores -> keeper = min id (7)
    scores = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 100 == 7, 0.0)
        .otherwise(((F.col("doc_id") % 100) + 1).cast("double"))
        .alias("avg_nll"),
    )
    out = simhash_keep_best(docs, scores)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

    t0 = time.perf_counter()
    groups = out.collect()
    elapsed = time.perf_counter() - t0
    assert elapsed < 90, f"skewed simhash_keep_best took {elapsed:.0f}s"

    hot = max(groups, key=lambda r: r["n_docs"])
    assert hot["n_docs"] == 10_000
    assert hot["keep_id"] == 7 and hot["keep_score"] == 0.0


def test_duplicated_ngram_spans_catches_offset_straddling_copy(spark):
    """r6: a span copied at a DIFFERENT word offset must be caught by
    the rolling 8-gram detector even when fixed non-overlapping
    chunking assigns it to different chunk boundaries."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.dedup import chunk_dedup, duplicated_ngram_spans

    span = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    docs = spark.createDataFrame(
        [
            (1, f"one two three {span} end of first document here"),
            (2, f"{span} completely different tail for the second one"),
            (3, "unrelated text with no shared span at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    spans = duplicated_ngram_spans(docs, n=8, min_docs=2).collect()
    assert any(r["n_docs"] == 2 and r["keep_id"] == 1 for r in spans), spans
    # fixed 8-word chunks: doc 1 has the span split across chunks
    # (offset 3), so no chunk hash is shared -> chunk dedup keeps all
    # passages and cannot see the copy
    kept = chunk_dedup(docs, chunk_words=8)
    rows = {r["doc_id"]: r for r in kept.collect()}
    assert len(rows) == 3
    # every chunk survives (n_kept == n_chunks): the straddling copy is
    # invisible at fixed-chunk grain
    assert all(r["n_kept"] == r["n_chunks"] for r in rows.values()), rows


def test_remove_duplicated_spans_keeper_and_grain(spark):
    """r6 removal step (Lee et al. '22): the keeper document keeps the
    duplicated span, every non-keeper loses exactly the covered tokens
    (at any offset), unique prose around the cut survives, short docs
    pass through verbatim, and doc grain is preserved — a fully-covered
    document emits an empty rewrite rather than vanishing."""
    from potoos_spark.operators.dedup import remove_duplicated_spans

    span = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (1, f"{span} keeper unique tail"),
        (2, f"alpha beta {span} gamma delta"),  # loser, mid-offset
        (3, span),                              # loser, fully covered
        (4, "short doc"),                       # < n tokens
        (5, ""),                                # token-less
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in remove_duplicated_spans(docs).collect()}
    assert len(got) == 5  # doc grain preserved
    assert got[1]["n_removed"] == 0
    assert got[1]["text_dedup"] == f"{span} keeper unique tail"
    assert got[2]["n_removed"] == 8
    assert got[2]["text_dedup"] == "alpha beta gamma delta"
    assert got[3]["n_removed"] == 8 and got[3]["text_dedup"] == ""
    assert got[4]["n_removed"] == 0 and got[4]["text_dedup"] == "short doc"
    assert got[5]["n_tokens"] == 0 and got[5]["text_dedup"] == ""


def test_remove_duplicated_spans_overlapping_windows_union(spark):
    """Two overlapping duplicated 8-grams in a loser doc cover the
    UNION of their positions (9 tokens for a 9-token shared run), not
    double-count; removal count reflects distinct covered positions."""
    from potoos_spark.operators.dedup import remove_duplicated_spans

    run9 = "a b c d e f g h i"  # 9 tokens -> two rolling 8-grams
    rows = [
        (1, f"{run9} keeper"),
        (2, f"pre {run9} post"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in remove_duplicated_spans(docs).collect()}
    assert got[2]["n_removed"] == 9
    assert got[2]["text_dedup"] == "pre post"


def test_near_dup_centrality_exact_ranks_on_clique_plus_isolate(spark):
    """r6 integer-exact PageRank keeper rule: three identical docs form
    a hamming-0 clique (deg 2 each, regular graph -> rank is stationary
    at the uniform 1e9//4), the unrelated doc is isolated and keeps
    only the base term 15e9//400 after every iteration. Values are
    EXACT bigints — no tolerance — and partitioning-invariant."""
    from potoos_spark.operators.dedup import near_dup_centrality

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, text), (2, text), (3, text),
        (4, "completely different words nothing shared here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in near_dup_centrality(docs, n_iters=3).collect()}
    assert len(got) == 4
    for i in (1, 2, 3):
        assert got[i]["deg"] == 2
        assert got[i]["rank_e9"] == 250_000_000  # stationary uniform rank
    assert got[4]["deg"] == 0
    assert got[4]["rank_e9"] == 37_500_000  # base term only: 15e9 // 400
    # partitioning invariance (exact integer math end to end)
    b = {
        r["doc_id"]: r["rank_e9"]
        for r in near_dup_centrality(docs.repartition(7), n_iters=3).collect()
    }
    assert b == {k: v["rank_e9"] for k, v in got.items()}


def test_keep_central_picks_hub_and_preserves_singletons(spark):
    """r6 keeper-rule #4: within each transitive component, the
    max-centrality doc wins (ties on rank -> min id); singletons keep
    themselves with the base rank; n_members counts the component."""
    from potoos_spark.operators.dedup import keep_central

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, text), (2, text), (3, text),          # one 3-clique component
        (4, "totally different words here again"),  # singleton
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["component"]: r for r in keep_central(docs).collect()}
    assert set(got) == {1, 4}
    # regular clique -> equal ranks -> tie broken to min id
    assert got[1]["keep_id"] == 1 and got[1]["n_members"] == 3
    assert got[1]["keep_rank_e9"] == 250_000_000
    assert got[4]["keep_id"] == 4 and got[4]["n_members"] == 1
    assert got[4]["keep_rank_e9"] == 37_500_000


def test_keep_central_fingerprints_corpus_exactly_once(spark, monkeypatch):
    """r7 (VERDICT r6 item 2): keep_central must tokenize + fingerprint
    the corpus ONCE and thread the persisted frame into both halves —
    the old composition ran the simhash pipeline independently inside
    dup_components AND near_dup_centrality, doubling the cold constant."""
    from potoos_spark.operators import dedup as D

    calls = {"n": 0}
    real = D.simhash

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(D, "simhash", counting)
    rows = [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zz yy xx")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sorted(tuple(r) for r in D.keep_central(docs).collect())
    assert calls["n"] == 1
    # and the shared-fingerprint path is bit-identical to the
    # per-half internal computation
    monkeypatch.setattr(D, "simhash", real)
    comp = D.dup_components(docs)
    cent = D.near_dup_centrality(docs)
    comp_fp = D.dup_components(docs, fingerprints=real(docs))
    cent_fp = D.near_dup_centrality(docs, fingerprints=real(docs))
    assert sorted(map(tuple, comp.collect())) == sorted(map(tuple, comp_fp.collect()))
    assert sorted(map(tuple, cent.collect())) == sorted(map(tuple, cent_fp.collect()))


def test_edge_components_transitive_and_singletons(spark):
    """r8: components over an EXPLICIT verified-pair list — a chain
    (1-2, 2-3) merges transitively, disjoint pair (5-6) stays its own
    component, un-paired docs keep their own id (the anti-join path)."""
    from potoos_spark.operators.dedup import edge_components

    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a bigint, id_b bigint"
    )
    got = {r["doc_id"]: r["component"] for r in edge_components(ids, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_edge_components_empty_pairs_all_singletons(spark):
    from potoos_spark.operators.dedup import edge_components

    ids = spark.createDataFrame([(i,) for i in (3, 9)], "doc_id bigint")
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    got = {r["doc_id"]: r["component"] for r in edge_components(ids, pairs).collect()}
    assert got == {3: 3, 9: 9}


def test_fuzzy_dedup_e2e_groups_planted_near_dups(spark):
    """The composed pipeline must cluster planted MinHash near-dups
    (same text with one token changed) and keep exactly one doc per
    cluster, with full doc-count coverage."""
    from potoos_spark.operators.dedup import fuzzy_dedup_e2e

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    rows = [(1, base), (2, base.replace("lazy", "sleepy", 1)), (3, base)]
    rows += [(10 + i, f"document number {i} about entirely topic {i} " * 5)
             for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = fuzzy_dedup_e2e(docs).collect()
    by_comp = {r["component"]: r for r in out}
    # 1,2,3 collapse into one cluster of 3; the others are singletons
    assert len(out) == 1 + 4
    big = [r for r in out if r["n_members"] == 3]
    assert len(big) == 1 and big[0]["keep_id"] in (1, 2, 3)
    assert all(r["n_members"] == 1 for r in out if r is not big[0])
    # keeper ids + members cover the corpus
    assert sum(r["n_members"] for r in out) == len(rows)
