#!/usr/bin/env python
"""sf0.1 → sf1 scaling probe (VERDICT r2 item 5): replicate the sf0.1
tables 10× into a scratch dir, run the top-5 bench queries at both
scales, and report per-query wall-clock ratios + scaling exponents
(log10 of the ratio; 1.0 = perfectly linear in rows).

Replication keeps the data *statistically* sf1-like rather than
literally duplicated where duplication would change the algorithmic
shape:

* documents: each replica r appends a replica token to the text and
  offsets doc_id — otherwise every doc becomes a 10-member exact-dup
  cluster and near-dup candidate volume scales quadratically, which is
  a different (adversarial) workload, not sf1;
* lineitem/orders: orderkeys offset per replica (join keys stay
  consistent, group cardinalities scale like real sf growth);
* events/embeddings: id offset per replica;
* dims (region/nation/customer/supplier/part): copied as-is — dims
  grow sublinearly in TPC-H-style schemas and the queries only read
  them as broadcast sides.

Usage: python scripts/scale_probe.py [--keep]
Writes nothing under /root/repo except stdout; scratch lives in
/tmp/potoos_sf1_probe (Spark scratch space).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potoos_spark.catalog import CATALOG  # noqa: E402
from potoos_spark.session import get_session  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/potoos_sf1_probe"
N_REP = 10
OFFSET = 100_000_000

QUERIES = [
    "corpus_curate_e2e",
    "text_top_terms",
    "q5_region_volume",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    # round-3 late additions: the two heaviest new entries
    "text_hybrid_rrf",
    "text_bigram_lm",
    # round-3 tail: the shingle-funnel entries (post single-file fix).
    # Uncapped containment is the quadratic exact baseline (kept here
    # deliberately so the probe re-measures its superlinear exponent);
    # the df-capped form is the ~linear production path.
    "dedup_containment_exact_baseline",
    "dedup_containment_capped_unbounded",
    "dedup_containment_bottomk",
    "corpus_ngram_novelty",
    # round-4 additions (VERDICT r3 item 5): the untested heavy tier
    "q_profile_stats",       # one-scan column profiler (union of aggs)
    "text_bm25",             # the BM25 sub-part of text_hybrid_rrf
    "corpus_pack_bins",      # two-phase prefix sum (skew-sensitive)
    "dedup_chunks",          # passage-hash dedup (hash skew-sensitive)
    # r4-late: entries swapped off single-task global windows onto the
    # two-phase prefix machinery (q_skyline excluded: its input is the
    # part dim, copied as-is — no growth axis to measure)
    "q_abc_classification",  # global_cumsum over per-part revenue
    "q_ltv_deciles",         # global_ntile over per-customer revenue
    "corpus_coverage_curve", # global_cumsum over the doc spine
    # r4-late additions
    "knn_rerank",            # quantized-candidates -> exact re-rank
    "dedup_keep_best",       # simhash groups + LM-score keeper
    "corpus_chunk_overlap",  # map-only sliding-window chunker
    "corpus_weighted_sample",  # map + TakeOrdered race
    # r5 (VERDICT r4 item 4): streaming replay entries — runnable on
    # the replicated scratch dir now that the sources are
    # layout-agnostic (the replicate() writes are Spark directory
    # tables, the production layout)
    "stream_debounce_replay",
    "stream_heartbeat_sla_replay",
    "dedup_exact_streaming",     # exact sibling of streaming_simhash_dedup
    "dedup_simhash_streaming",
    # r9: the emission-bounded containment production form and the
    # streaming MinHash-LSH guard (multimodal_decode_dhash is excluded
    # like q_skyline: its input is 32 fixed rendered images — no growth
    # axis to measure; the decade probe covers the containment family
    # under perturbed replication in scale_probe_decade.py)
    "dedup_containment_topk",
    "dedup_minhash_streaming",
    "corpus_quality_perceptron",
    # r10: the tokenize-and-pack e2e and the perceptron planted-signal
    # eval both grow with the documents spine. The real-pixel near-dup
    # pair/recall entries are excluded like q_skyline and
    # multimodal_decode_dhash: their input is a fixed 300-file rendered
    # corpus — no growth axis to measure.
    "corpus_tokenize_pack_e2e",
    "corpus_quality_perceptron_eval",
    "knn_ivf_pq",
    # r10 close-out: the shard-layout manifest (map + 16-row agg) and
    # the retrieval eval (index chain + query-scale probe/scan)
    "corpus_shard_manifest",
    "corpus_rag_recall_eval",
]

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]


def replicate(spark):
    if os.path.isdir(DST):
        shutil.rmtree(DST)
    os.makedirs(DST)
    for t in COPY_AS_IS:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    def write(df, name):
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    def reps(df, fn):
        out = None
        for r in range(N_REP):
            d = fn(df, r)
            out = d if out is None else out.unionAll(d)
        return out

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    write(
        reps(
            docs,
            lambda d, r: d.select(
                (F.col("doc_id") + r * OFFSET).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f" replica{r}"))).alias("n_chars"),
            ),
        ),
        "documents",
    )
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    write(
        reps(
            li,
            lambda d, r: d.withColumn(
                "l_orderkey", F.col("l_orderkey") + r * OFFSET
            ),
        ),
        "lineitem",
    )
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    write(
        reps(
            orders,
            lambda d, r: d.withColumn(
                "o_orderkey", F.col("o_orderkey") + r * OFFSET
            ),
        ),
        "orders",
    )
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    write(
        reps(ev, lambda d, r: d.withColumn("event_id", F.col("event_id") + r * OFFSET)),
        "events",
    )
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    write(
        reps(emb, lambda d, r: d.withColumn("vec_id", F.col("vec_id") + r * OFFSET)),
        "embeddings",
    )


def run_one(spark, name, sf_dir, repeats=2):
    fn = CATALOG[name].fn
    best = float("inf")
    for _ in range(repeats):
        # cold cache per repeat (same discipline as bench.run_one):
        # persisted intermediates must not turn repeat 2 into a read
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import math

    # Positional args (other than --keep) select a subset of QUERIES so a
    # newly added entry can be probed without re-timing the whole list.
    subset = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = subset or QUERIES
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        sys.exit(f"unknown catalog entries: {unknown}")

    spark = get_session("scale_probe")
    print("replicating sf0.1 x10 ->", DST, file=sys.stderr)
    replicate(spark)
    rows = []
    for name in names:
        t_small = run_one(spark, name, SRC)
        t_big = run_one(spark, name, DST)
        ratio = t_big / t_small
        rows.append((name, t_small, t_big, ratio, math.log10(ratio)))
        print(
            f"{name:22s} sf0.1={t_small:6.2f}s sf1={t_big:7.2f}s "
            f"ratio={ratio:5.2f} exp={math.log10(ratio):4.2f}",
            flush=True,
        )
    if "--keep" not in sys.argv:
        shutil.rmtree(DST, ignore_errors=True)
    print("| query | sf0.1 s | sf1 s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for n, a, b, r, e in rows:
        print(f"| {n} | {a:.2f} | {b:.2f} | {r:.2f}x | {e:.2f} |")


if __name__ == "__main__":
    main()
