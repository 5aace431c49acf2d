#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set spans every tier: TPC-H-style relational aggregation/joins,
time-series bucket aggregation, sequential anomaly detectors
(applyInPandas), MinHash-LSH dedup, embedding similarity, and text
analysis. Queries materialize through the noop sink so the full plan
executes (no driver collect, no disk write skew).

Final-line size budget (VERDICT r7 item 1): the driver parses the JSON
line out of a 2000-char stdout TAIL, and the r7 92-query line (~2.5 KB,
default separators) overflowed it — BENCH_r07 recorded ``parsed: null``.
The 92 full query names alone exceed 2000 chars, so no serialization of
the complete map can ever fit. The emission is therefore split:

* stdout gets ONE compact line (≤ ``LINE_BUDGET`` bytes, asserted by
  ``tests/test_bench_line.py``) with the totals and as many per-query
  numbers as fit, MOST EXPENSIVE FIRST — the entries a perf grader
  needs — plus ``queries_omitted`` / ``queries_file`` so the truncation
  is explicit, never silent;
* the COMPLETE per-query map (plus run totals and load-average
  bracketing) is written to ``BENCH_QUERIES.json`` next to this script,
  where the judge reads it from the repo tree.
"""

from __future__ import annotations

import json
import os
import sys
import time

from potoos_spark.catalog import CATALOG
from potoos_spark.session import get_session

HEADLINE = [
    # relational tier (lineitem 600k @ sf0.1)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_volume",
    "q6_revenue",
    "q_correlated_avg",
    # time-series retrieval tier (events 100k)
    "ts_agg_avg",
    "ts_latest_dedup",
    "ts_mrange_reduce",
    "ts_sliding_window",
    # detector tier (sequential applyInPandas over bucketed series)
    "det_derivative",
    "det_ensemble",
    "det_windows",
    # sessionization + range join
    "ts_session_window",
    "q_range_join",
    # rate/downsample/changepoint tier (round-3 additions)
    "ts_counter_rate",
    "ts_downsample_lttb",
    "det_cusum",
    "text_top_terms",
    # behavioral analytics tier
    "q_funnel",
    "q_retention_cohorts",
    # round-3 additions: passage dedup, adapted Q12, profiler,
    # sequence packing, unigram LM scoring
    "dedup_chunks",
    "q12_late_shipments",
    "q_profile_stats",
    "corpus_pack_bins",
    "text_unigram_lm",
    # round-3-late additions (r9: the emission-bounded per-doc top-k is
    # now the production containment form; the unbounded-emission
    # df-capped entry joined the uncapped one as a named baseline and
    # stays out of the headline, like dedup_ngram_jaccard)
    "dedup_containment_topk",
    "dedup_containment_bottomk",
    "corpus_ngram_novelty",
    "knn_matryoshka",
    "text_readability",
    # LLM-pipeline tier (documents 5k, embeddings 2k)
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_hybrid_rrf",
    "knn_bruteforce",
    "text_quality",
    "text_langid",
    "corpus_curate_e2e",
    # round-4 additions: deterministic KMV sketch, perplexity-decile
    # mix (distributed global NTILE), exact global percentiles
    # (distributed rank selection)
    "sketch_kmv_distinct",
    "corpus_ppl_deciles",
    "q_global_percentiles",
    # round-4-late additions: two-stage quantized->exact retrieval
    # funnel, quality-keeper near-dup canonicalization, BPE merge-step
    # pair statistics (vocabulary-grain explosion)
    "knn_rerank",
    "dedup_keep_best",
    "text_bpe_pairs",
    # round-5 additions: deterministic md5-HLL twin, md5-medoid IVF,
    # PQ asymmetric-distance search, quantile-centroid distance scoring
    "sketch_distinct_hll",
    "knn_ivf",
    "knn_pq_adc",
    "det_kmeans_distance",
    # round-6 additions: map-only radius search, exact-integer diagonal
    # whitening, rolling exact-substring span detection (linear-floor
    # by contract), SemDeDup cell-blocked semantic near-dup pairs
    "knn_range_search",
    "emb_whiten",
    "dedup_ngram_spans",
    "dedup_semantic_cells",
    # round-6 additions: DSIR hashed-ngram importance resampling,
    # exact-substring span removal, Gopher rules, distinct-n diversity
    "corpus_dsir_select",
    "dedup_span_removal",
    "text_gopher_rules",
    "corpus_distinct_ngrams",
    "knn_binary_rerank",
    "q_constraint_audit",
    "ts_seasonal_anomaly",
    "ts_pattern_match",
    "dedup_centrality",
    "q_scd2_history",
    # round-7 additions: phrase detection, script composition,
    # cell-blocked mutual-kNN graph, kNN label probe, dHash banded
    # near-dup pairs, Bollinger envelope, first-touch attribution
    "text_collocations",
    "text_script_mix",
    "knn_mutual_neighbors",
    "emb_knn_classify",
    "multimodal_dhash_pairs",
    "ts_bollinger_bands",
    "q_attribution",
    "emb_kmeans_lloyd",
    "corpus_kcenter_coreset",
    "stream_bollinger_replay",
    # round-7-late additions: graph census + frequent itemsets, audit
    # family, robust trend, VAD segmentation, held-out backoff LM,
    # cluster-balanced selection, deployed streaming CUSUM
    "q_triangle_count",
    "q_apriori_triples",
    "q_gini",
    "q_benford",
    "ts_theil_sen",
    "multimodal_vad_segments",
    "text_backoff_lm",
    "emb_cluster_sample",
    "stream_cusum_replay",
    "ts_macd",
    "multimodal_phash",
    "emb_pca_power",
    "q_assoc_rules",
    "emb_pca_project",
    "stream_macd_replay",
    "q_running_distinct",
    "q_histogram_2d",
    "emb_ann_recall_eval",
    "ts_backtest_mae",
    "q_skew_report",
    "emb_ivf_recall_eval",
    # round-8 addition: the full Lee et al./RefinedWeb fuzzy-dedup
    # pipeline as one headline op (MinHash-LSH verify -> components
    # over verified pairs -> centrality keeper)
    "corpus_fuzzy_dedup_e2e",
    # round-8 addition: hierarchical (IMI-style) two-level IVF — the
    # sqrt(C) assignment funnel over the nested md5-medoid draw
    "knn_ivf_two_level",
    # round-8 addition: the RAG-indexing pipeline e2e (chunk ->
    # hashed embed -> auto-cell IVF layout -> per-cell summary)
    "corpus_index_e2e",
    # round-8 addition: dedup recall as a driver-gated eval (planted
    # near-dups through the unmodified MinHash-LSH pipeline)
    "dedup_minhash_recall_eval",
    # round-8 addition: char-entropy quality signal (gibberish /
    # encoding-noise / base64-blob detector)
    "text_char_entropy",
    # round-9 additions: emission-bounded containment (the new
    # production form), the streaming MinHash-LSH guard, and the real
    # BMP/PPM decode -> pixel-dHash path
    "dedup_minhash_streaming",
    "multimodal_decode_dhash",
    # round-9 late: in-engine learned quality filter (integer GD)
    "corpus_quality_perceptron",
    # round-10 additions: the real-pixel image near-dup pipeline
    # (rendered planted clusters -> file ingest -> BMP/PPM decode ->
    # pixel dHash -> banded Hamming) + its driver-gated recall twin,
    # the tokenize-and-pack training-batch materialization e2e, and
    # the planted-signal eval of the learned quality filter
    "multimodal_pixel_neardup_pairs",
    "multimodal_pixel_neardup_recall",
    "corpus_tokenize_pack_e2e",
    "corpus_quality_perceptron_eval",
    # round-10: IVFADC — the canonical FAISS IndexIVFPQ composition
    # (two-level cell probe restricts the scan, PQ-ADC makes it
    # codes-only)
    "knn_ivf_pq",
    # round-10 close-out: the deterministic training-shard layout
    # manifest (the last materialization step after packing) and the
    # retrieval eval over the RAG chunk index (hit@4, gold = source
    # doc — the eval twin corpus_index_e2e was missing)
    "corpus_shard_manifest",
    "corpus_rag_recall_eval",
]


def run_one(spark, name: str, sf_dir: str, repeats: int = 2) -> float:
    """Best of ``repeats`` runs: steady-state throughput (what a long-running
    cluster job sees), not first-run JVM/codegen JIT warmup."""
    fn = CATALOG[name].fn
    best = float("inf")
    for _ in range(repeats):
        # Entries that persist() intermediates (capped posting lists,
        # novelty, global prefix sums) must not hand their cache to the
        # next repeat/entry: CacheManager matches by logical plan, so a
        # warm cache would make repeat 2 measure cached reads (ADVICE
        # r4) and caches would accumulate across the whole HEADLINE run.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


# Hard byte ceiling for the final stdout line: the driver's tail window
# is 2000 chars and may clip a few trailing chars of earlier log lines,
# so leave real margin.
LINE_BUDGET = 1800


def build_summary_line(
    best: dict[str, float],
    sf: float,
    queries_file: str,
    prior_omitted: tuple[str, ...] | list[str] = (),
) -> str:
    """The single stdout JSON line, size-guarded to ``LINE_BUDGET``:
    compact separators, 2-decimal values, per-query entries added
    most-expensive-first until the serialized line would overflow.
    Deterministic (ties broken by name) and explicit about truncation
    (``queries_omitted`` count + pointer to the full map).

    Rotation (VERDICT r8 item 4): ranking purely by time drops the SAME
    cheap queries from the driver-parsed artifact every round. Queries
    named in ``prior_omitted`` (the previous run's dropped set, read
    from the full-map file) rank FIRST, so anything omitted in run k is
    guaranteed into run k+1's line — consecutive artifacts jointly
    cover every headline query; the remaining budget still goes
    most-expensive-first for the perf grader."""
    prior = set(prior_omitted)
    ranked = sorted(
        best.items(), key=lambda kv: (kv[0] not in prior, -kv[1], kv[0])
    )

    def serialize(n_keep: int) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(best.values()), 2),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(best),
                "queries_omitted": len(best) - n_keep,
                "queries_file": queries_file,
                "queries": {k: round(v, 2) for k, v in ranked[:n_keep]},
            },
            separators=(",", ":"),
        )

    keep = len(best)
    while keep > 0 and len(serialize(keep)) > LINE_BUDGET:
        keep -= 1
    return serialize(keep)


def compute_prior_omitted(
    best: dict[str, float], here: str, queries_file: str
) -> list[str]:
    """Rotation input (r10 fix): rank first every headline query ABSENT
    from the latest DRIVER artifact's parsed line (``BENCH_r{N}.json``),
    not merely the rolling file's last ``line_omitted`` — the builder's
    round-end run sits between driver artifacts, so chaining off the
    rolling file lets a query omitted by the driver in round N slip
    back out of the line in round N+1 (seen: BENCH_r08 ∪ BENCH_r09
    left 31 queries driver-invisible). Deriving the prior set from the
    artifact itself makes consecutive DRIVER artifacts jointly cover
    the whole headline set regardless of interleaved runs. Fallback:
    the rolling file's ``line_omitted`` (no parseable artifact yet)."""
    try:
        artifacts = sorted(
            f
            for f in os.listdir(here)
            if f.startswith("BENCH_r") and f.endswith(".json")
        )
    except OSError:
        artifacts = []
    for fname in reversed(artifacts):
        try:
            with open(os.path.join(here, fname)) as f:
                parsed = json.load(f).get("parsed") or {}
            seen = set(parsed.get("queries") or {})
            if seen:
                return sorted(set(best) - seen)
        except (OSError, ValueError, AttributeError):
            continue
    try:
        with open(os.path.join(here, queries_file)) as f:
            return json.load(f).get("line_omitted", [])
    except (OSError, ValueError):
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_session("potoos_bench")
    # Warm the JVM + parquet footers once so per-query times measure the
    # queries, not first-touch session costs.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    # VERDICT r6 item 4: the official artifact is the per-query MIN
    # across n_runs FULL harness passes (BASELINE.md's methodology,
    # moved into the harness) — a single loaded-host pass recorded a
    # 69.5s artifact that reproduced at 59.0s. Both pass totals and
    # the 1-min load average bracketing the run are recorded so the
    # judge can spot a noisy host without a reproduction run.
    load_before = os.getloadavg()[0]
    passes: list[dict[str, float]] = []
    for r in range(n_runs):
        times: dict[str, float] = {}
        for name in HEADLINE:
            times[name] = round(run_one(spark, name, sf_dir), 3)
            print(f"# run{r + 1} {name}: {times[name]:.3f}s", file=sys.stderr)
        passes.append(times)
    load_after = os.getloadavg()[0]

    best = {
        name: min(p[name] for p in passes) for name in HEADLINE
    }
    total = round(sum(best.values()), 3)
    here = os.path.dirname(os.path.abspath(__file__))
    queries_file = "BENCH_QUERIES.json"
    prior_omitted = compute_prior_omitted(best, here, queries_file)
    line = build_summary_line(best, sf, queries_file, prior_omitted)
    omitted_now = sorted(set(best) - set(json.loads(line)["queries"]))
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf,
        "run_totals": [round(sum(p.values()), 3) for p in passes],
        "load_avg_1m": [round(load_before, 2), round(load_after, 2)],
        "line_omitted": omitted_now,
    }
    with open(os.path.join(here, queries_file), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(line)


if __name__ == "__main__":
    main()
