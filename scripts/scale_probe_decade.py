#!/usr/bin/env python
"""sf1 → sf10 decade probe (VERDICT r8 item 2): one decade BEYOND the
standing sf0.1→sf1 probes for the scale-critical operator set. An
exponent fitted on a single decade can hide a quadratic term with a
small constant; this pushes the measured range to two decades
(sf0.1→sf10, 100× rows).

Two replication modes, both built on /tmp scratch:

* STANDARD (the scale_probe.py recipe at N_REP = 10 and 100): replica
  token appended to each doc's text, ids offset — replicas of one doc
  remain near-duplicates of each other, so pair-emitting operators see
  their TRUE answer grow with replication. Used for the operators whose
  cost model is supposed to absorb that (fuzzy dedup e2e, components,
  keeper, kNN graph, LM, index build).
* PERTURBED (this script, for the containment family): a
  replica-specific token is interleaved after every 2nd original token,
  so every 3-token shingle window contains it — cross-replica shingle
  overlap is exactly zero and the TRUE pair answer stays ~linear in the
  replication factor. The probe then measures the ALGORITHM's scaling,
  not the answer volume (the r8 adjudication for
  dedup_containment_capped's exp 1.04).

Timing is ONE cold pass per (query, scale) — the decade exponent needs
order-of-magnitude resolution, not min-of-2 precision — with
clearCache() before each run, same as bench.run_one.

Usage: python scripts/scale_probe_decade.py [names...] [--keep]
Writes only to /tmp/potoos_decade_*; prints a SCALE.md-ready table.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from potoos_spark.catalog import CATALOG  # noqa: E402
from potoos_spark.session import get_session  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 100_000_000
COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]

# (entry, mode): standard replication vs perturbed documents
STANDARD = [
    "corpus_fuzzy_dedup_e2e",
    "dedup_components",
    "dedup_keep_central",
    "knn_mutual_neighbors",
    "text_backoff_lm",
    "corpus_index_e2e",
    # r10 (VERDICT r9 items 4+7): second-decade evidence for the r9
    # additions — the learned filter's GD trainer, and the streaming
    # MinHash guard replayed at 100x state cardinality (the heavy
    # streaming twin probe) — plus the r10 tokenize-and-pack e2e
    "corpus_quality_perceptron",
    "dedup_minhash_streaming",
    "corpus_tokenize_pack_e2e",
    # r10 close-out: second-decade evidence for the two r10 additions
    # that landed with one decade (sf0.1->sf1) of probe coverage
    "corpus_quality_perceptron_eval",
    "knn_ivf_pq",
]
PERTURBED = [
    "dedup_containment_capped_unbounded",
    "dedup_containment_topk",
    "dedup_containment_bottomk",
]


def _docs_standard(docs, r):
    tag = f" replica{r}"
    return docs.select(
        (F.col("doc_id") + r * OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(tag)).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.lit(len(tag))).alias("n_chars"),
    )


def _docs_perturbed(docs, r):
    """Interleave a replica-specific token after every 2nd original
    token: every 3-token shingle window contains it, so replicas share
    ZERO shingles across r — the true containment/Jaccard pair answer
    stays linear in the replication factor."""
    marker = f"z{r}q"
    toks = F.split(F.col("text"), " ")
    marked = F.transform(
        toks,
        lambda t, i: F.when(
            i % 2 == 1, F.concat(t, F.lit(" " + marker))
        ).otherwise(t),
    )
    text = F.array_join(marked, " ")
    return docs.select(
        (F.col("doc_id") + r * OFFSET).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("bigint").alias("n_chars"),
    )


def build_dir(spark, dst, n_rep, docs_fn):
    """Replicated scratch dir: documents via ``docs_fn``, embeddings
    id-offset, dims copied as-is. Only the tables the probed entries
    read are replicated (events/lineitem/orders are not on any probed
    path — copied as-is so _docs_stream-style sources still resolve)."""
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for t in COPY_AS_IS + ["events", "lineitem", "orders"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = [docs_fn(docs, r) for r in range(n_rep)]
    out = reps[0]
    for d in reps[1:]:
        out = out.unionAll(d)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ereps = [
        emb.withColumn("vec_id", F.col("vec_id") + r * OFFSET)
        for r in range(n_rep)
    ]
    eout = ereps[0]
    for d in ereps[1:]:
        eout = eout.unionAll(d)
    eout.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


def run_one(spark, name, sf_dir):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    CATALOG[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    subset = [a for a in sys.argv[1:] if not a.startswith("--")]
    std = [n for n in (subset or STANDARD) if n in STANDARD]
    per = [n for n in (subset or PERTURBED) if n in PERTURBED]
    unknown = [n for n in subset if n not in STANDARD + PERTURBED]
    if unknown:
        sys.exit(f"not in the decade-probe set: {unknown}")

    spark = get_session("scale_probe_decade")
    rows = []
    for mode, names, docs_fn in (
        ("standard", std, _docs_standard),
        ("perturbed", per, _docs_perturbed),
    ):
        if not names:
            continue
        d10 = f"/tmp/potoos_decade_{mode}_10"
        d100 = f"/tmp/potoos_decade_{mode}_100"
        print(f"building {mode} 10x -> {d10}", file=sys.stderr, flush=True)
        build_dir(spark, d10, 10, docs_fn)
        print(f"building {mode} 100x -> {d100}", file=sys.stderr, flush=True)
        build_dir(spark, d100, 100, docs_fn)
        for name in names:
            t10 = run_one(spark, name, d10)
            t100 = run_one(spark, name, d100)
            ratio = t100 / t10
            rows.append((name, mode, t10, t100, ratio, math.log10(ratio)))
            print(
                f"{name:36s} [{mode}] sf1={t10:7.2f}s sf10={t100:8.2f}s "
                f"ratio={ratio:6.2f} exp={math.log10(ratio):5.2f}",
                flush=True,
            )
        if "--keep" not in sys.argv:
            shutil.rmtree(d10, ignore_errors=True)
            shutil.rmtree(d100, ignore_errors=True)

    print("| query | mode | sf1 s | sf10 s | ratio | exponent |")
    print("|---|---|---|---|---|---|")
    for n, m, a, b, r, e in rows:
        print(f"| {n} | {m} | {a:.2f} | {b:.2f} | {r:.2f}x | {e:.2f} |")


if __name__ == "__main__":
    main()
