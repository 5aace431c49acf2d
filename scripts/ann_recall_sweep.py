"""ANN tier comparison: recall@10 vs wall-clock for every retrieval
tier the engine ships, measured against the brute-force exact answer
on the real embeddings table — the 'measure, don't guess' artifact
behind the tier-selection advice in SCALE.md.

Usage: python scripts/ann_recall_sweep.py [sf_dir]   (default sf0.01)
Prints a markdown table; writes nothing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from potoos_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K, NQ = 10, 20


def main():
    from potoos_spark.operators import similarity as S

    spark = get_session("ann_sweep")
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < NQ)

    def run(name, fn):
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = time.perf_counter() - t0
        return name, {(r["query_id"], r["match_id"]) for r in rows}, dt

    tiers = [
        ("brute (exact)", lambda: S.cosine_topk(q, e, k=K)),
        ("matryoshka d=16", lambda: S.matryoshka_topk(q, e, dims=16, k=K)),
        ("int8 quantized", lambda: S.quantized_topk(q, e, k=K)),
        ("int8 -> exact rerank x4", lambda: S.rerank_topk(q, e, k=K, expand=4)),
        ("binary hamming", lambda: S.binary_hamming_topk(q, e, k=K)),
        ("binary -> exact rerank x8", lambda: S.binary_rerank_topk(q, e, k=K, expand=8)),
        ("LSH 4b x 8 tables", lambda: S.lsh_bucket_topk(q, e, k=K, n_bits=4, n_tables=8)),
        ("IVF md5 16c probe2", lambda: S.ivf_topk_md5(q, e, k=K, n_cells=16, n_probe=2)),
        ("PQ ADC", lambda: S.pq_adc_topk(q, e, k=K)),
        ("PQ -> exact rerank", lambda: S.pq_rerank_topk(q, e, k=K)),
    ]
    name0, exact, t0 = run(*tiers[0])
    # binary_hamming ranks by hamming, not cosine — its pair set is
    # still comparable for recall (match ids vs exact top-k)
    print("| tier | recall@10 | wall s (sf0.01, warm JVM) |")
    print("|---|---|---|")
    print(f"| {name0} | 1.000 | {t0:.2f} |")
    for name, fn in tiers[1:]:
        n, got, dt = run(name, fn)
        rec = len(got & exact) / len(exact)
        print(f"| {n} | {rec:.3f} | {dt:.2f} |")


if __name__ == "__main__":
    main()
