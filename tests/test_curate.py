"""Curation pipeline invariants beyond the oracle: partitioning
independence (the determinism claim — min-id keepers and md5 splits
cannot depend on cluster layout) and stage monotonicity."""

from __future__ import annotations

import pytest

from potoos_spark.catalog.common import table
from potoos_spark.operators.curate import curate_corpus
from tests.conftest import SF_DIR


def test_curate_invariant_under_repartition(spark):
    docs = table(spark, SF_DIR, "documents")
    base = sorted(map(tuple, curate_corpus(docs).collect()))
    shuffled = sorted(map(tuple, curate_corpus(docs.repartition(7)).collect()))
    assert base == shuffled
    assert len(base) > 0


def test_curate_output_is_subset_with_sane_split(spark):
    docs = table(spark, SF_DIR, "documents")
    out = curate_corpus(docs).collect()
    ids = {r["doc_id"] for r in out}
    assert len(ids) == len(out)  # one row per kept doc
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= all_ids
    n_train = sum(1 for r in out if r["split"] == "train")
    assert 0.8 <= n_train / len(out) <= 0.97  # ~90% by construction


def test_token_budget_sample_caps_per_group(spark):
    from potoos_spark.operators.curate import token_budget_sample

    rows = [
        (i, "one two three four five", "s1") for i in range(10)
    ] + [(100, "a b", "s2")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    kept = token_budget_sample(df, budget_tokens=12)
    agg = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # s1 docs are 5 tokens each → inclusive cumsum ≤ 12 keeps exactly 2
    assert agg["s1"] == 2
    assert agg["s2"] == 1  # under budget: all kept
    # determinism: same input → identical kept set
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in token_budget_sample(df, 12).collect())
    assert a == b


def test_dup_components_multi_hop_transitivity(spark):
    from potoos_spark.operators.dedup import dup_components

    rows = [
        (1, "alpha beta gamma delta epsilon"),   # simhash-links to 2 (same token set)
        (2, "beta gamma alpha epsilon delta"),   # exact-links to 3 (same text)
        (3, "beta gamma alpha epsilon delta"),
        (4, "completely unrelated words here now"),
        (5, "completely unrelated words here now"),  # exact dup of 4
        (6, "a lone singleton document entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["component"] for r in dup_components(df).collect()}
    # 1–2 share a SimHash fp (identical distinct-token set), 2–3 share
    # exact content: one component rooted at min id 1
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == got[5] == 4
    assert got[6] == 6


def test_temperature_mix_quota_shape(spark):
    """alpha=0.5 mixing: quotas ∝ sqrt(count) — the small source gets a
    RELATIVELY larger share than its raw proportion; fill is
    deterministic and capped by quota; total kept ≈ n_keep."""
    from potoos_spark.operators.curate import temperature_mix

    rows = [(i, "x", "big") for i in range(900)] + [
        (1000 + i, "x", "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    kept = temperature_mix(df, n_keep=100).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    n_big, n_small = len(by_src["big"]), len(by_src["small"])
    # raw shares are 90/10; sqrt shares are 75/25 — small is upsampled
    assert n_small >= 20 and n_big <= 80
    assert n_big + n_small >= 100  # ceil rounding may keep a couple extra
    assert n_big + n_small <= 102
    # deterministic across partitionings
    again = sorted(
        map(tuple, temperature_mix(df.repartition(7), n_keep=100).collect())
    )
    assert again == sorted(map(tuple, kept))


def test_containment_decontaminate_flags_embedded_eval(spark):
    """A long doc embedding a full eval item verbatim must clear the
    containment threshold even though its absolute hit count is modest;
    an unrelated doc stays at 0.0."""
    from potoos_spark.operators.curate import containment_decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over the lazy dog suffix"),
            (2, "completely different content about sparkly databases engines"),
            (3, "ab"),  # < n tokens: no shingles
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in containment_decontaminate(train, eval_df, threshold=0.5).collect()
    }
    assert got[1]["contaminated"] == 1 and got[1]["containment"] >= 0.5
    assert got[2]["contaminated"] == 0 and got[2]["containment"] == 0.0
    assert got[3]["n_shingles"] == 0 and got[3]["contaminated"] == 0


def test_ngram_novelty_first_owner_semantics(spark):
    """Doc 1 introduces all its shingles (novelty 1.0); an identical
    later doc introduces none (0.0); a partial overlap scores the exact
    new-shingle fraction. A sub-n-token doc has no shingles and is
    absent from the output."""
    from potoos_spark.operators.curate import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),
            (3, "c d e f g"),
            (4, "xy"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
    assert got[1]["novelty"] == 1.0 and got[1]["n_shingles"] == 3
    assert got[2]["novelty"] == 0.0
    assert got[3]["n_novel"] == 2 and got[3]["novelty"] == pytest.approx(2 / 3)
    assert 4 not in got


def test_ngram_novelty_joins_only_on_doc_id(spark):
    """Scale-shape pin: the novelty plan's only join is the thin
    doc-keyed merge of totals and owner counts — never a join on the
    shingle key (the corpus-sized string shuffle the rewrite removed)."""
    import re

    from potoos_spark.operators.curate import ngram_novelty
    from tests.test_plans import _plan

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "c d e f g")], "doc_id bigint, text string"
    )
    p = _plan(ngram_novelty(df))
    keys = [ln for ln in p.splitlines() if re.search(r"(Left|Right) keys", ln)]
    assert keys, "expected the doc-keyed totals/owner join"
    assert all("doc_id" in ln for ln in keys)
    assert not any(re.search(r"\[s#\d+", ln) for ln in keys)


def test_containment_pairs_scores_embedded_doc_full(spark):
    """A short doc fully embedded in a longer host must score
    containment 1.0 while its Jaccard against the same host stays well
    below 1 — the asymmetric partial-dup case the operator exists for.
    An unrelated doc produces no pair row at all."""
    from potoos_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingle_frame,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "gamma delta epsilon zeta eta"),  # embedded in doc 1
            (3, "totally unrelated words about spark engines here"),
        ],
        "doc_id bigint, text string",
    )
    sh = shingle_frame(df)
    cont = {(r["id_a"], r["id_b"]): r for r in containment_pairs(sh).collect()}
    jac = {(r["id_a"], r["id_b"]): r for r in jaccard_pairs(sh).collect()}
    assert cont[(1, 2)]["containment"] == 1.0
    assert cont[(1, 2)]["shared"] == cont[(1, 2)]["sz_b"]
    assert jac[(1, 2)]["jaccard"] < 0.5
    assert all(3 not in pair for pair in cont)


def test_bm25_idf_ranks_rare_term_and_plan(spark):
    """BM25 semantics: for a query mixing a rare and a common term, the
    doc holding the rare term must outrank docs that only repeat the
    common term (IDF dominates raw tf); ranks are 1..k with
    non-increasing scores; and the query-term probe join must broadcast
    (the corpus side never shuffles for it).

    NB: the fixture corpus shares one ~30-word vocabulary, so every
    term's IDF is near zero there — rare-term semantics need this
    synthetic corpus; the fixture is exercised by the text_bm25 oracle
    entry instead."""
    from potoos_spark.operators.text import bm25_topk
    from tests.test_plans import _plan

    docs = spark.createDataFrame(
        [
            (1, "zyzzyva sightings in the canyon"),
            (2, "the the the the the common words only"),
            (3, "more common words about the canyon weather"),
            (4, "unrelated database engine text entirely"),
        ],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(0, "zyzzyva the")], "query_id bigint, qtext string"
    )
    out = bm25_topk(docs, queries, k=4)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert rows[0]["doc_id"] == 1  # rare term wins over repeated 'the'
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert "BroadcastHashJoin" in _plan(out)


def test_chunk_dedup_removes_repeated_passage(spark):
    from potoos_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),          # chunks: "a b c", "x y z"
            (2, "a b c q r s"),          # "a b c" repeats -> dropped
            (3, "q r s"),                # "q r s" repeats -> fully dropped
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in chunk_dedup(df, chunk_words=3).collect()}
    assert rows[1].text_dedup == "a b c x y z" and rows[1].n_kept == 2
    assert rows[2].text_dedup == "q r s" and rows[2].n_kept == 1
    assert rows[3].text_dedup == "" and rows[3].n_kept == 0
    assert rows[3].n_chunks == 1


def test_chunk_dedup_first_occurrence_is_doc_order(spark):
    from potoos_spark.operators.dedup import chunk_dedup

    # the same passage in two docs: the LOWER doc_id keeps it regardless
    # of input row order
    df = spark.createDataFrame(
        [(9, "p q r"), (2, "p q r")], ["doc_id", "text"]
    ).repartition(4)
    rows = {r.doc_id: r for r in chunk_dedup(df, chunk_words=3).collect()}
    assert rows[2].n_kept == 1 and rows[9].n_kept == 0


def test_stratified_sample_rates_and_determinism(spark):
    from potoos_spark.operators.curate import stratified_sample

    docs = table(spark, SF_DIR, "documents")
    out1 = stratified_sample(docs, rates={"en": 0.0}, default_rate=1.0)
    got = {r.lang for r in out1.collect()}
    assert "en" not in got and got  # en fully dropped, others all kept
    n_other = docs.filter("lang <> 'en'").count()
    assert out1.count() == n_other
    # determinism: same result under different partitioning
    out2 = stratified_sample(
        docs.repartition(7), rates={"en": 0.0}, default_rate=1.0
    )
    assert sorted(r.doc_id for r in out2.collect()) == sorted(
        r.doc_id for r in out1.collect()
    )


def test_random_projection_matches_numpy(spark):
    import hashlib

    import numpy as np

    from potoos_spark.operators.similarity import random_projection

    embs = table(spark, SF_DIR, "embeddings").limit(20)
    got = {
        (r.vec_id, r.j): r.y
        for r in random_projection(embs, in_dim=64, out_dim=4).collect()
    }
    for row in embs.collect():
        xi = np.floor(np.array(row.embedding, dtype=np.float64) * 1000 + 0.5)
        for j in range(4):
            signs = np.array([
                1 if hashlib.md5(f"{i}|{j}".encode()).hexdigest()[0] in "02468ace" else -1
                for i in range(64)
            ])
            assert got[(row.vec_id, j)] == int((xi * signs).sum())


def test_pack_bins_no_single_partition_global_window(spark):
    from potoos_spark.operators.curate import pack_bins

    docs = table(spark, SF_DIR, "documents")
    df = pack_bins(docs, capacity=4096)
    sc = spark.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # the big-side window must partition by __pid; only the tiny totals
    # window (<= n_parts rows) may run single-partition
    assert plan.count("SinglePartition") <= 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_pack_bins_invariant_to_split_count(spark):
    from potoos_spark.operators.curate import pack_bins

    docs = table(spark, SF_DIR, "documents")
    a = {r.doc_id: (r.bin_id, r.offset_in_bin) for r in pack_bins(docs, n_parts=2).collect()}
    b = {r.doc_id: (r.bin_id, r.offset_in_bin) for r in pack_bins(docs, n_parts=17).collect()}
    assert a == b  # prefix sum is invariant to where the range splits fall


def test_pack_bins_offsets_are_contiguous(spark):
    from potoos_spark.operators.curate import pack_bins

    docs = table(spark, SF_DIR, "documents")
    rows = sorted(pack_bins(docs, capacity=4096).collect(), key=lambda r: r.doc_id)
    cum = 0
    for r in rows:
        assert (r.bin_id, r.offset_in_bin) == (cum // 4096, cum % 4096)
        cum += r.size


class TestWeightedSample:
    def test_weight_proportional_and_deterministic(self, spark):
        """Heavier rows win the exponential race proportionally more
        often, the draw is partitioning-independent, and the plan is a
        TakeOrderedAndProject (no global sort)."""
        from pyspark.sql import functions as F

        from potoos_spark.operators.curate import weighted_sample

        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            # ids < 200 are 50x heavier than the rest
            F.when(F.col("id") < 200, 500).otherwise(10).alias("w"),
        )
        got = weighted_sample(df, 300, "w").collect()
        assert len(got) == 300
        heavy = sum(1 for r in got if r["doc_id"] < 200)
        # heavy ids hold 1/10 of rows but 10/28 of total weight; with
        # 50x weight each they must dominate the winners
        assert heavy > 120, heavy
        again = weighted_sample(df.repartition(13), 300, "w").collect()
        assert {r["doc_id"] for r in got} == {r["doc_id"] for r in again}
        plan = (
            weighted_sample(df, 300, "w")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan

    def test_nonpositive_weights_never_race(self, spark):
        from pyspark.sql import functions as F

        from potoos_spark.operators.curate import weighted_sample

        df = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, -5).otherwise(3).alias("w"),
        )
        got = weighted_sample(df, 100, "w").collect()
        assert len(got) == 25
        assert all(r["doc_id"] % 2 == 1 for r in got)

    def test_grouped_quota_and_weights(self, spark):
        """weighted_sample_grouped: ≤ k winners per group, weights
        bias within each group, deterministic across partitionings."""
        from pyspark.sql import functions as F

        from potoos_spark.operators.curate import weighted_sample_grouped

        df = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("source"),
            F.when(F.col("id") % 5 == 0, 1000).otherwise(1).alias("w"),
        )
        got = weighted_sample_grouped(df, 25, "w", group_col="source").collect()
        per = {}
        for r in got:
            per.setdefault(r["source"], []).append(r["doc_id"])
        assert set(per) == {"0", "1", "2", "3"}
        assert all(len(v) == 25 for v in per.values())
        # heavy ids (50 per group at 1000x weight, 25 slots) should
        # sweep nearly every slot in every group
        heavy = sum(1 for r in got if r["doc_id"] % 5 == 0)
        assert heavy > 85, heavy
        again = weighted_sample_grouped(
            df.repartition(17), 25, "w", group_col="source"
        ).collect()
        assert {r["doc_id"] for r in got} == {r["doc_id"] for r in again}


class TestChunkOverlap:
    def test_coverage_overlap_and_plan(self, spark):
        """Every word appears in >= 1 chunk; adjacent chunks share
        size-stride words; short docs emit exactly one window; the
        plan is map-only (no shuffle)."""
        from pyspark.sql import functions as F

        from potoos_spark.operators.curate import chunk_overlap

        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(20))),  # 20 words
                (2, "a b c"),                               # < size
                (3, " ".join(f"x{i}" for i in range(13))),  # size+1
            ],
            "doc_id int, text string",
        )
        got = chunk_overlap(docs, chunk_words=12, stride_words=8).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 1: windows at 0 and 8 (1 + ceil(8/8) = 2)
        assert [r["start_word"] for r in sorted(by_doc[1], key=lambda r: r["ci"])] == [0, 8]
        c0, c1 = [r["chunk"].split() for r in sorted(by_doc[1], key=lambda r: r["ci"])]
        assert c0 == [f"w{i}" for i in range(12)]
        assert c1 == [f"w{i}" for i in range(8, 20)]
        assert set(c0) & set(c1) == {f"w{i}" for i in range(8, 12)}
        # doc 2: one window holding the whole text
        assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk"] == "a b c"
        # doc 3: 13 words -> windows at 0 and 8; union covers all words
        words = set()
        for r in by_doc[3]:
            words.update(r["chunk"].split())
        assert words == {f"x{i}" for i in range(13)}
        plan = (
            chunk_overlap(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_rejects_bad_stride(self, spark):
        import pytest as _pytest

        from potoos_spark.operators.curate import chunk_overlap

        docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
        with _pytest.raises(ValueError):
            chunk_overlap(docs, chunk_words=4, stride_words=5)
        with _pytest.raises(ValueError):
            chunk_overlap(docs, chunk_words=4, stride_words=0)


class TestDSIR:
    """DSIR importance resampling (Xie et al. 2023): weights must tilt
    toward target-like documents, the selection must be a weight-
    proportional without-replacement draw, and the plan must broadcast
    the bucket-ratio table and take the top-k without a global sort."""

    def _corpus(self, spark):
        # target domain: "spark sql query" style; off-domain: "zebra
        # yak quokka" style. Raw mixes both plus one empty doc.
        target = spark.createDataFrame(
            [(1000 + i, "spark sql query plan optimizer join") for i in range(5)],
            "doc_id bigint, text string",
        )
        raw_rows = [
            (i, "spark sql query plan join shuffle") for i in range(10)
        ] + [
            (100 + i, "zebra yak quokka wombat lemur gnu") for i in range(10)
        ] + [(999, "")]
        raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
        return raw, target

    def test_weights_tilt_toward_target_domain(self, spark):
        from potoos_spark.operators.curate import dsir_weights

        raw, target = self._corpus(spark)
        got = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
        assert 999 not in got  # zero-feature doc never scores
        on = [got[i]["logw_e9"] for i in range(10)]
        off = [got[100 + i]["logw_e9"] for i in range(10)]
        assert min(on) > max(off), (min(on), max(off))
        # identical texts -> identical weights (content-determined)
        assert len(set(on)) == 1 and len(set(off)) == 1

    def test_select_is_without_replacement_and_favors_target(self, spark):
        from potoos_spark.operators.curate import dsir_select

        raw, target = self._corpus(spark)
        rows = dsir_select(raw, target, k=10).collect()
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids)) == 10
        n_on = sum(1 for i in ids if i < 100)
        # 10-of-20 drawn proportional to strongly separated weights:
        # the on-domain half must dominate the draw
        assert n_on >= 8, ids
        # keys sorted desc, ties impossible by construction
        keys = [r["key_e9"] for r in rows]
        assert keys == sorted(keys, reverse=True)

    def test_weights_partitioning_invariant(self, spark):
        from potoos_spark.operators.curate import dsir_weights

        raw, target = self._corpus(spark)
        a = sorted(map(tuple, dsir_weights(raw, target).collect()))
        b = sorted(
            map(tuple, dsir_weights(raw.repartition(7), target).collect())
        )
        assert a == b

    def test_plan_broadcasts_ratio_and_takes_ordered(self, spark):
        from pyspark.sql import functions as F

        from potoos_spark.operators.curate import dsir_select
        from tests.conftest import SF_DIR

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        raw = docs.filter(F.col("source") != "src0")
        target = docs.filter(F.col("source") == "src0")
        plan = (
            dsir_select(raw, target, k=50)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastExchange" in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_tokenize_pack_e2e_conserves_tokens_and_bins_contiguous(spark):
    """r10 e2e entry invariants: the per-bin token totals conserve the
    encode stage's symbol counts exactly, bin ids are contiguous from
    0, every bin starts at least one document, and spill is bounded by
    the largest single document (offset-partitioned packing only runs
    past a boundary by the tail of the doc that straddles it)."""
    from potoos_spark.catalog.pipeline import _tokenize_pack_fn
    from potoos_spark.operators.text import bpe_encode_stats
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bins = _tokenize_pack_fn(spark, SF_DIR).collect()
    enc = bpe_encode_stats(docs, n_merges=3).collect()
    assert sum(r["n_tokens"] for r in bins) == sum(r["n_syms"] for r in enc)
    ids = sorted(r["bin_id"] for r in bins)
    assert ids == list(range(len(ids)))
    assert all(r["n_docs"] >= 1 for r in bins)
    max_doc = max(r["n_syms"] for r in enc)
    assert all(0 <= r["spill"] < max_doc for r in bins)


def test_shard_manifest_totals_determinism_and_plan(spark):
    """r10 shard layout manifest invariants: shard totals conserve the
    corpus exactly (docs/chars), every shard id is in [0, n_shards)
    and populated at fixture scale, the layout is invariant to input
    partitioning (hash-derived, no rand/zipWithIndex), a different
    seed re-deals the within-shard order, and the plan is one
    map-side-combined aggregation — no window, no join, no sort."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.curate import shard_manifest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m = shard_manifest(docs, n_shards=16, seed=7)
    rows = sorted(m.collect(), key=lambda r: r["shard_id"])

    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["n_chars"] for r in rows) == (
        docs.agg(F.sum(F.length("text"))).first()[0]
    )
    assert [r["shard_id"] for r in rows] == list(range(16))
    assert all(r["first_key"] <= r["last_key"] for r in rows)

    again = sorted(
        shard_manifest(docs.repartition(7), n_shards=16, seed=7).collect(),
        key=lambda r: r["shard_id"],
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]

    reseeded = sorted(
        shard_manifest(docs, n_shards=16, seed=8).collect(),
        key=lambda r: r["shard_id"],
    )
    assert sum(r["n_docs"] for r in reseeded) == n_docs
    assert {r["first_key"] for r in reseeded} != {
        r["first_key"] for r in rows
    }

    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    # integer key endpoints keep the agg buffer fixed-width -> hash
    # aggregation with map-side partials; string MIN/MAX here would
    # demote the pass to a per-partition-sorting SortAggregate
    assert "HashAggregate" in plan, plan
    assert "SortAggregate" not in plan, plan
    assert "Sort" not in plan.replace("SortAggregate", ""), plan


def test_shard_manifest_streaming_twin_equals_batch(spark):
    """r10: the manifest operator is stream-batch agnostic — the SAME
    `shard_manifest` call applied to the document replay stream must
    drain to exactly the batch result (16 running-aggregate rows of
    state, complete-mode emission, no watermark)."""
    from potoos_spark.catalog.pipeline import (
        _shard_manifest_fn,
        _stream_shard_manifest_fn,
    )

    batch = {
        tuple(r)
        for r in _shard_manifest_fn(spark, SF_DIR).collect()
    }
    streamed = {
        tuple(r)
        for r in _stream_shard_manifest_fn(spark, SF_DIR).collect()
    }
    assert streamed == batch
    assert len(streamed) == 16
