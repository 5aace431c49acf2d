"""Physical-plan regression tests: the scale properties SCALE.md claims
must be visible in `.explain` output, not just asserted in prose.

These pin: predicate pushdown reaching the parquet scan, column
pruning, broadcast joins for small dims, partial (map-side)
aggregation, top-k compiling to TakeOrderedAndProject, and
whole-stage codegen coverage of the scan→agg pipeline.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potoos_spark.catalog import CATALOG
from tests.conftest import SF_DIR


def _plan(df, mode="formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_time_filter_pushed_to_scan(spark):
    df = CATALOG["ts_scan_range"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    # the ts bound must appear among the pushed filters, not only post-scan
    pushed = [l for l in plan.splitlines() if "PushedFilters:" in l]
    assert any("GreaterThanOrEqual(ts" in l or "LessThanOrEqual(ts" in l for l in pushed), pushed


def test_q6_pushes_all_three_predicates(spark):
    plan = _plan(CATALOG["q6_revenue"].fn(spark, SF_DIR))
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q1_prunes_columns(spark):
    plan = _plan(CATALOG["q1_pricing_summary"].fn(spark, SF_DIR))
    read = "".join(l for l in plan.splitlines() if "ReadSchema:" in l)
    # 7 of lineitem's 16 columns are needed; the rest must not be read
    assert "l_orderkey" not in read and "l_comment" not in read and "l_shipmode" not in read


def test_q5_broadcasts_small_dims(spark):
    plan = _plan(CATALOG["q5_region_volume"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "small dims should broadcast"


def test_q1_partial_aggregation(spark):
    plan = _plan(CATALOG["q1_pricing_summary"].fn(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2, "expected partial->final HashAggregate"
    assert "partial_sum" in plan


def test_top_k_is_take_ordered(spark):
    plan = _plan(CATALOG["q3_shipping_priority"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "orderBy+limit should compile to top-k"


def test_scan_agg_whole_stage_codegen(spark):
    df = CATALOG["q6_revenue"].fn(spark, SF_DIR)
    # AQE hides codegen spans until execution; codegen mode shows them up front
    plan = _plan(df, "codegen")
    assert "WholeStageCodegen" in plan


def test_latest_dedup_is_aggregate_not_window(spark):
    plan = _plan(CATALOG["ts_latest_dedup"].fn(spark, SF_DIR))
    assert "max_by" in plan or "HashAggregate" in plan
    assert "Window" not in plan, "latest dedup must combine map-side, not rank"


def test_knn_broadcasts_queries(spark):
    plan = _plan(CATALOG["knn_bruteforce"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_single_shuffle_bucket_agg(spark):
    from potoos_spark.config import TimeSeriesConfig
    from potoos_spark.operators.retrieval import apply_aggregation
    from potoos_spark.catalog.common import events_frame

    cfg = TimeSeriesConfig(aggregation_type="avg", bucket_size_msec=3_600_000)
    plan = _plan(apply_aggregation(events_frame(spark, SF_DIR), cfg), "simple")
    # one exchange: the partial->final agg shuffle; no extra sorts/shuffles
    assert plan.count("Exchange") == 1, plan


def test_q14_broadcasts_part_and_pushes_shipdate(spark):
    plan = _plan(CATALOG["q14_promo_revenue"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "part dim should broadcast"
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "l_shipdate" in pushed, f"shipdate not pushed: {pushed}"


def test_q19_pushes_disjunctive_predicate(spark):
    plan = _plan(CATALOG["q19_disjunctive_join"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the OR-of-ANDs must at least push the quantity envelope Or(...) down
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "l_quantity" in pushed or "Or(" in pushed, pushed


def test_range_join_is_hash_join_on_user(spark):
    plan = _plan(CATALOG["q_range_join"].fn(spark, SF_DIR))
    # equi key must drive a hash join; the band is a post-join condition,
    # never a cartesian/nested-loop over the full tables
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q4_semi_join_not_aggregate_dedup(spark):
    plan = _plan(CATALOG["q4_order_priority"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan, "EXISTS should compile to a semi join"


def test_grouping_sets_expand_once(spark):
    plan = _plan(CATALOG["q_grouping_sets"].fn(spark, SF_DIR), "simple")
    assert plan.count("Expand") == 1, "grouping sets = one map-side Expand"
    assert plan.count("HashAggregate") >= 2, "partial->final over the expand"


def test_moving_range_frame_single_sort(spark):
    plan = _plan(CATALOG["ts_moving_avg_range"].fn(spark, SF_DIR), "simple")
    # one shuffle to co-locate each series, one sort for the frame scan
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan


def test_hll_sketch_partial_aggregation(spark):
    # the DataSketches library op (the catalog slot wires the md5 twin
    # since r5 — its own plan pin is test_hll_md5_is_two_hash_aggregates)
    from potoos_spark.operators.sketch import hll_distinct

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plan = _plan(hll_distinct(li, ["l_returnflag"], "l_partkey"))
    assert "partial_hll_sketch_agg" in plan, "sketch must combine map-side"


def test_q21_self_joins_compile_to_semi_and_anti(spark):
    plan = _plan(CATALOG["q21_waiting_supplier"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan, "the other-supplier EXISTS should be a semi join"
    assert "LeftAnti" in plan, "the no-other-late NOT EXISTS should be an anti join"
    # order-status filter must reach the orders scan
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "o_orderstatus" in pushed, pushed


def test_q13_left_outer_preserved(spark):
    plan = _plan(CATALOG["q13_cust_distribution"].fn(spark, SF_DIR), "simple")
    assert "LeftOuter" in plan, "customers without orders must survive the join"


def test_q17_single_lineitem_shuffle_key(spark):
    # the per-part average and the probe co-locate on l_partkey; part is
    # a broadcast dim — no shuffle keyed on anything else
    plan = _plan(CATALOG["q17_small_qty_revenue"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "part dim should broadcast"
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "p_brand" in pushed, pushed


def test_q22_anti_join_with_pushed_cutoff(spark):
    plan = _plan(CATALOG["q22_idle_customers"].fn(spark, SF_DIR))
    assert "LeftAnti" in plan
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "o_orderdate" in pushed, "recent-order cutoff must reach the orders scan"


def _n_scans(plan: str) -> int:
    # formatted mode prints each node twice (tree + detail header);
    # count the numbered detail headers only
    import re

    return len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M))


def test_counter_rate_single_scan_partial_agg(spark):
    # window lag (1 shuffle by series) → bucket hash agg (1 shuffle);
    # one scan of events, partial aggregation before the agg exchange
    plan = _plan(CATALOG["ts_counter_rate"].fn(spark, SF_DIR))
    assert _n_scans(plan) == 1
    assert plan.count("HashAggregate") >= 2  # partial+final pair


def test_top_terms_single_document_scan(spark):
    # the df count-window reuses the (doc, term) pre-agg: the documents
    # file must be scanned exactly once (the agg-and-join-back shape
    # would scan and explode it twice)
    plan = _plan(CATALOG["text_top_terms"].fn(spark, SF_DIR))
    assert _n_scans(plan) == 1


def test_lttb_broadcasts_anchor_table(spark):
    # the per-bucket anchor table is tiny (rows = series × buckets);
    # joining it back against raw points must broadcast, not shuffle the
    # points a second time
    plan = _plan(CATALOG["ts_downsample_lttb"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_quantified_all_broadcasts_nation_max(spark):
    plan = _plan(CATALOG["q_quantified_all"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_clean_html_is_shuffle_free(spark):
    plan = _plan(CATALOG["text_clean_html"].fn(spark, SF_DIR))
    assert "Exchange" not in plan


def test_pii_mask_is_shuffle_free(spark):
    plan = _plan(CATALOG["text_pii_mask"].fn(spark, SF_DIR))
    assert "Exchange" not in plan


def test_quantize_is_shuffle_free(spark):
    from potoos_spark.operators.similarity import quantize_embeddings
    from potoos_spark.catalog.common import table

    plan = _plan(quantize_embeddings(table(spark, SF_DIR, "embeddings")))
    assert "Exchange" not in plan


def test_q9_broadcasts_all_three_dims(spark):
    # part (filtered), supplier, nation all ride broadcast joins; only
    # lineitem⋈orders shuffles
    plan = _plan(CATALOG["q9_nation_profit"].fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters:" in plan  # p_type filter reaches the part scan


def test_q16_not_in_compiles_to_anti_join(spark):
    plan = _plan(CATALOG["q16_supplier_relation"].fn(spark, SF_DIR))
    assert "LeftAnti" in plan


def test_funnel_single_scan(spark):
    # the in-row HOF funnel fold: one events scan, one user shuffle —
    # not one scan per funnel step
    plan = _plan(CATALOG["q_funnel"].fn(spark, SF_DIR))
    assert _n_scans(plan) == 1


def test_stratified_sample_is_shuffle_free(spark):
    plan = _plan(CATALOG["corpus_stratified_sample"].fn(spark, SF_DIR))
    assert "Exchange" not in plan
    # only the two output columns reach the scan
    assert "ReadSchema" in plan


def test_random_projection_is_shuffle_free(spark):
    plan = _plan(CATALOG["emb_random_projection"].fn(spark, SF_DIR))
    assert "Exchange" not in plan  # in-row fold + explode, map-only


def test_chunk_dedup_no_window_no_self_join(spark):
    # first-occurrence is a map-side-combinable min-struct agg joined
    # back on the hash key — NO Window over the hash partition (a viral
    # passage would funnel into one unsplittable sort task; AQE splits
    # skewed joins, not Window partitions) and no doc-doc self-join
    plan = _plan(CATALOG["dedup_chunks"].fn(spark, SF_DIR), "simple")
    assert "Window" not in plan, plan
    assert plan.count("Join") <= 2, plan  # occurrences⋈firsts only (AQE may stage it)


def test_q12_prunes_columns_and_partial_agg(spark):
    plan = _plan(CATALOG["q12_late_shipments"].fn(spark, SF_DIR))
    # partial aggregation before the final group exchange
    assert "partial_sum" in plan or "HashAggregate" in plan
    read = "".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" not in read  # unused measures pruned


def test_profile_stats_column_pruned_scans(spark):
    # one column-pruned scan per profiled column: same total bytes as a
    # single full-width scan, but no Expand and parallel branches
    plan = _plan(CATALOG["q_profile_stats"].fn(spark, SF_DIR))
    assert _n_scans(plan) == 6, plan
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert all(l.count(":") <= 3 and l.count(",") == 0 for l in reads), reads
    assert "Expand" not in plan, "multi-distinct Expand crept back in"


def test_q11_broadcasts_dim_and_scalar_total(spark):
    plan = _plan(CATALOG["q11_value_share"].fn(spark, SF_DIR))
    # supplier dim broadcast into the fact scan + 1-row total broadcast back
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin") >= 2, plan


def test_q20_pushes_shipdate_and_semi_joins(spark):
    plan = _plan(CATALOG["q20_promo_suppliers"].fn(spark, SF_DIR))
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "l_shipdate" in pushed, pushed
    assert "LeftSemi" in plan, plan


def test_winsorize_single_exchange(spark):
    # rank + lo/hi bound windows all reuse the series_key partition sort
    from potoos_spark.operators.rate import winsorize
    from potoos_spark.catalog.common import events_frame

    plan = _plan(winsorize(events_frame(spark, SF_DIR)), "simple")
    assert plan.count("Exchange") == 1, plan


def test_jaccard_topk_broadcasts_query_terms(spark):
    # the query-term join must broadcast (corpus pruned before shuffle)
    plan = _plan(CATALOG["text_jaccard_topk"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_hybrid_rrf_no_corpus_join(spark):
    # fusion unions two top-k lists; the only joins are the retrieval
    # sides' broadcast query joins — no doc-doc join anywhere
    plan = _plan(CATALOG["text_hybrid_rrf"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Union" in plan


def test_bigram_lm_single_bigram_explode_chain(spark):
    # bigrams built in-row: no Window over token positions, no self-join
    # of the token stream on pos+1
    plan = _plan(CATALOG["text_bigram_lm"].fn(spark, SF_DIR), "simple")
    assert "Window" not in plan, plan


def test_dedup_report_no_expand(spark):
    # two per-source aggs joined — never the multi-countDistinct Expand
    plan = _plan(CATALOG["corpus_dedup_report"].fn(spark, SF_DIR), "simple")
    assert "Expand" not in plan, plan


def test_event_transitions_reuse_one_user_exchange(spark):
    """The sessionize chain (lag -> break -> running sid -> leads) must
    reuse ONE hash exchange on user_id — the three per-user Window
    operators share a partitioning/sort; a regression that re-shuffles
    per window triples the dominant shuffle."""
    plan = _plan(CATALOG["q_event_transitions"].fn(spark, SF_DIR))
    user_exchanges = [
        ln for ln in plan.splitlines() if "hashpartitioning(user_id" in ln
    ]
    assert len(user_exchanges) == 1, plan


def test_session_paths_no_second_window_for_path(spark):
    """Path assembly is a sorted in-row collect inside the session agg,
    not a ranked window over session members: exactly the per-user
    window chain exists, and no Window partitioned by the session id."""
    plan = _plan(CATALOG["q_session_paths"].fn(spark, SF_DIR))
    user_exchanges = [
        ln for ln in plan.splitlines() if "hashpartitioning(user_id" in ln
    ]
    assert len(user_exchanges) == 1, plan
    # the (user, session) grouping is a hash AGG over the window output,
    # never a second Window partitioned on the session id: every window
    # spec in the plan is user-partitioned
    total = plan.count("windowspecdefinition(")
    user_partitioned = plan.count("windowspecdefinition(user_id")
    assert total > 0 and total == user_partitioned, plan


def test_weighted_sample_is_take_ordered_race(spark):
    """The Efraimidis-Spirakis race is a map + top-k: per-partition
    heaps merged at the driver (TakeOrderedAndProject), never a global
    sort (rangepartitioning exchange) and never a window or join."""
    plan = _plan(CATALOG["corpus_weighted_sample"].fn(spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan


def test_rerank_candidates_ride_broadcasts(spark):
    """Stage 2 touches only |Q|*expand*k candidate rows: the candidate
    set and the query vectors ride broadcast joins back to the corpus —
    no shuffle join of the corpus, no cartesian product."""
    plan = _plan(CATALOG["knn_rerank"].fn(spark, SF_DIR), "simple")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_keep_best_no_ranked_window(spark):
    """The quality keeper is ONE map-side-combinable min_by struct agg
    over the simhash groups — a ranked window here would shuffle every
    duplicate member to one task per viral group."""
    plan = _plan(CATALOG["dedup_keep_best"].fn(spark, SF_DIR), "simple")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bpe_pairs_explode_at_vocab_grain(spark):
    """Pair explosion must happen AFTER the word-count agg (vocabulary
    grain): two HashAggregate pairs (words, then pairs), a top-n
    TakeOrderedAndProject, and no window or join anywhere."""
    plan = _plan(CATALOG["text_bpe_pairs"].fn(spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan and "Join" not in plan, plan
    agg_idx = plan.find("HashAggregate")
    gen_idx = plan.rfind("Generate")
    assert agg_idx != -1 and gen_idx != -1, plan


def test_fertility_single_partial_agg(spark):
    """Both token counts are in-row expressions feeding ONE partial->
    final hash agg on lang: a single exchange, no window, no join."""
    plan = _plan(CATALOG["text_fertility_by_lang"].fn(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2 and "partial_sum" in plan, plan
    simple = _plan(CATALOG["text_fertility_by_lang"].fn(spark, SF_DIR), "simple")
    assert simple.count("Exchange") == 1, simple
    assert "Window" not in simple and "Join" not in simple, simple


def test_ivf_md5_centroid_draw_is_take_ordered(spark):
    """The md5-medoid centroid draw must compile to
    TakeOrderedAndProject (per-partition heaps), never a global sort or
    a partition-less window, and both assignment scans must consume the
    centroids via broadcast."""
    df = CATALOG["knn_ivf"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    # the only Window is the bounded per-query probe/rank
    assert all(
        "query_id" in l
        for l in plan.splitlines()
        if "Window" in l and "partitionBy" in l.lower()
    )


def test_pq_adc_broadcasts_lut_and_codebook(spark):
    """PQ-ADC must broadcast the KB-scale LUT/codebook sides; the
    corpus side is scanned once for codes and never self-joined."""
    df = CATALOG["knn_pq_adc"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_brp_md5_planes_are_codegen_literals(spark):
    """The ±1 projection lines are compile-time literals — no plane
    relation may appear as a join side (the only joins are the bucket
    equality join and the candidate re-join)."""
    df = CATALOG["knn_brp_lsh_mllib"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # bucket join is an equality hash join on (t, bucket)
    assert "bucket" in plan


def test_hll_md5_is_two_hash_aggregates(spark):
    """The deterministic HLL twin must stay window-free: distinct →
    (group, bucket) max → per-group sum, all hash aggregates with
    map-side partials."""
    df = CATALOG["sketch_distinct_hll"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per level


def test_psi_and_entropy_are_windowless_hash_aggs(spark):
    """The drift/entropy monitors must stay window-free (stats
    broadcast + hash aggs) — a per-series sort would make every
    hot series a single-task bottleneck."""
    for name in ("ts_psi_drift", "ts_value_entropy", "text_token_entropy"):
        plan = _plan(CATALOG[name].fn(spark, SF_DIR))
        assert "Window" not in plan, name
        assert "HashAggregate" in plan, name


def test_pcm_energy_projects_before_python_boundary(spark):
    """Only (id, payload) may cross into the Arrow exchange — the
    canonical Python-boundary projection rule."""
    df = CATALOG["multimodal_pcm_energy"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    # the scan reads only the two source columns feeding the payload
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and all("lang" not in l and "source" not in l for l in read), read


def test_gopher_rules_is_scan_local(spark):
    """The full Gopher rule set is a pure projection — the OPERATOR
    adds no exchange; at 100 TB its cost is the corpus scan. The only
    Exchange allowed in the catalog entry's plan is the deliberate
    input-spread repartition (`spread_input` — a no-op on any
    multi-file table) that parallelizes the fixture's single-row-group
    scan: no aggregation, join or window exchange may appear."""
    plan = _plan(CATALOG["text_gopher_rules"].fn(spark, SF_DIR))
    import re

    exchanges = re.findall(r"\(\d+\) Exchange\b", plan)
    assert len(exchanges) <= 1, plan
    assert not exchanges or "REPARTITION_BY_NUM" in plan, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "HashAggregate", "Window"):
        assert op not in plan, plan


def test_distinct_ngrams_no_joins(spark):
    """Distinct-n is two stacked hash aggregations over the exploded
    in-row n-grams — no join may appear (a positional self-join here
    would shuffle the corpus twice)."""
    plan = _plan(CATALOG["corpus_distinct_ngrams"].fn(spark, SF_DIR))
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2


def test_span_removal_no_cartesian_no_global_window(spark):
    """The removal rewrite joins windows to the duplicated-gram
    relation on the gram key and rebuilds per doc — never a cartesian
    product, never a partition-less window."""
    plan = _plan(CATALOG["dedup_span_removal"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan  # rebuild is an agg, not a window


def test_binary_hamming_broadcasts_queries(spark):
    """The packed query words must broadcast against the corpus scan;
    the only join is that broadcast (no shuffle join of the corpus)."""
    plan = _plan(CATALOG["knn_binary_hamming"].fn(spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_weights_single_wide_shuffle(spark):
    """DSIR's only corpus-wide exchange is the (doc, bucket) hash agg:
    the bucket-ratio relation and both totals ride broadcasts, so no
    sort-merge join may appear anywhere."""
    plan = _plan(CATALOG["corpus_dsir_weights"].fn(spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastExchange" in plan, plan


# ---- r8 compositions -------------------------------------------------------


def test_cell_knn_edges_plan_is_one_shuffle_arrow_funnel(spark):
    """The vectorized kNN-graph stage-1: map-only Arrow assignment
    (MapInPandas, codebook in the closure — no join), ONE shuffle into
    the fused per-cell cap+score+topk kernel (FlatMapGroupsInPandas),
    no pair join of any kind."""
    from potoos_spark.operators.similarity import cell_knn_edges

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(cell_knn_edges(e, k=5), mode="simple")
    assert "MapInPandas" in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_corpus_index_e2e_plan_reuses_persisted_chain(spark):
    """The RAG-index build must read the persisted chunk+embed chain
    (InMemoryTableScan), assign through the Arrow kernel, and never
    fall back to a cartesian product."""
    plan = _plan(CATALOG["corpus_index_e2e"].fn(spark, SF_DIR), mode="simple")
    assert "InMemoryTableScan" in plan, plan
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_fuzzy_dedup_e2e_final_plan_has_no_cartesian(spark):
    """The composed keeper join (components x centrality) and the
    window cut must compile to keyed joins — a cartesian anywhere
    would be quadratic in documents."""
    plan = _plan(
        CATALOG["corpus_fuzzy_dedup_e2e"].fn(spark, SF_DIR), mode="simple"
    )
    assert "CartesianProduct" not in plan, plan


# ---- r9 compositions -------------------------------------------------------


def test_topk_containment_plan_window_is_per_doc_not_global(spark):
    """The emission bound is ONE ranked window PARTITIONED BY doc_id —
    never a global (empty-partition) window, which would single-task
    the cut; and the pair generation stays the in-row double explode
    (no shingle self-join)."""
    from potoos_spark.operators.dedup import (
        shingle_frame,
        topk_containment_pairs,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c x y z")], "doc_id bigint, text string"
    )
    plan = _plan(topk_containment_pairs(shingle_frame(df), 5), mode="simple")
    assert "Window" in plan, plan
    assert "windowspecdefinition(doc_id" in plan, plan
    # the only joins are the thin doc-keyed size joins (2 per direction
    # of the symmetrized union resolves to the same 2 cached subtrees)
    assert "CartesianProduct" not in plan, plan
    spark.catalog.clearCache()


def test_two_level_assign_plan_is_map_only_in_engaged_regime(spark):
    """The hierarchical assignment must stay a MAP-ONLY Arrow kernel —
    codebook and super split live in the closure, so the plan has no
    join and no exchange between the scan and the kernel (same claim
    the flat kernel carries, now in the ENGAGED regime)."""
    import numpy as np
    import pandas as pd

    from potoos_spark.operators.dedup import scaled_vec, sqnorm_expr
    from potoos_spark.operators.similarity import (
        IVF2_HIER_MIN_CELLS,
        md5_medoid_centroids,
        two_level_assign,
    )

    rng = np.random.default_rng(5)
    n = 16_384
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(
                rng.normal(size=(n, 4)).astype("float64")
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    c = df.select(
        F.col("vec_id").alias("__id"), scaled_vec("embedding").alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, 64)
    assert 64 >= IVF2_HIER_MIN_CELLS
    assigned = two_level_assign(c, cent)
    plan = _plan(assigned, mode="simple")
    assert "MapInPandas" in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    assert "Exchange" not in plan, plan


def test_rag_recall_eval_plan_shape(spark):
    """r10 retrieval eval: the probe-restricted scan must stay keyed —
    candidates come from the (cell) join of the flat probe against the
    assignment and the (query_id) join of query vectors, never a
    cartesian; the final cut is a per-query ranked window (parallel
    across queries, ~n_probe/C of the corpus per query)."""
    df = CATALOG["corpus_rag_recall_eval"].fn(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan
    # both Arrow kernels (assignment + flat probe) ride mapInPandas
    assert plan.count("MapInPandas") >= 2, plan
