"""ANN tier comparison: recall@10 vs wall-clock for every retrieval
tier the engine ships, measured against the brute-force exact answer —
the 'measure, don't guess' artifact behind the tier-selection advice
in SCALE.md.

Two fixtures (VERDICT r6 item 3):

* **real** — the driver's embeddings table. Its 64-dim vectors are
  near-random (no cluster structure): the WORST case for every coarse
  quantizer, so stage-1 recalls are floors, not typical values.
* **clustered** — a deterministic mixture-of-Gaussians (the standard
  public method for synthesizing ANN benchmarks): unit-norm cluster
  centers, per-point Gaussian noise, re-normalized. Trained text/image
  embeddings concentrate variance like this, so this fixture is the
  one that can guide production tier choice.

Usage: python scripts/ann_recall_sweep.py [sf_dir] [fixture]
  fixture: real | clustered | both (default both)
Prints markdown tables; writes nothing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from potoos_spark.session import get_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIXTURE = sys.argv[2] if len(sys.argv) > 2 else "both"
K, NQ = 10, 20


def make_clustered(spark, n=2000, dim=64, n_clusters=16, sigma=0.15, seed=7):
    """Mixture-of-Gaussians synthetic embeddings: unit-norm centers,
    N(0, sigma²) within-cluster noise, re-normalized — deterministic
    under the fixed seed."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, n)
    pts = centers[assign] + sigma * rng.randn(n, dim)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    rows = [
        (int(i), [float(x) for x in pts[i]], int(assign[i]))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def tiers(S, q, e):
    return [
        ("brute (exact)", lambda: S.cosine_topk(q, e, k=K)),
        ("matryoshka d=16", lambda: S.matryoshka_topk(q, e, dims=16, k=K)),
        ("int8 quantized", lambda: S.quantized_topk(q, e, k=K)),
        ("int8 -> exact rerank x4", lambda: S.rerank_topk(q, e, k=K, expand=4)),
        ("binary hamming", lambda: S.binary_hamming_topk(q, e, k=K)),
        ("binary -> exact rerank x8", lambda: S.binary_rerank_topk(q, e, k=K, expand=8)),
        ("LSH 4b x 8 tables", lambda: S.lsh_bucket_topk(q, e, k=K, n_bits=4, n_tables=8)),
        ("IVF md5 16c probe2", lambda: S.ivf_topk_md5(q, e, k=K, n_cells=16, n_probe=2)),
        ("IVF md5 16c probe4", lambda: S.ivf_topk_md5(q, e, k=K, n_cells=16, n_probe=4)),
        ("PQ ADC", lambda: S.pq_adc_topk(q, e, k=K)),
        ("PQ -> exact rerank", lambda: S.pq_rerank_topk(q, e, k=K)),
        # tuned PQ (r7): finer subspaces + wider funnel — the settings
        # the clustered-fixture gate pins (recall ≥ 0.8)
        ("PQ nsub=16 -> rerank x8", lambda: S.pq_rerank_topk(q, e, k=K, expand=8, n_sub=16)),
    ]


def sweep(S, q, e, label):
    def run(fn):
        t0 = time.perf_counter()
        rows = fn().collect()
        return {(r["query_id"], r["match_id"]) for r in rows}, time.perf_counter() - t0

    ts = tiers(S, q, e)
    exact, t0 = run(ts[0][1])
    print(f"\n### fixture: {label}\n")
    print("| tier | recall@10 | wall s (warm JVM) |")
    print("|---|---|---|")
    print(f"| {ts[0][0]} | 1.000 | {t0:.2f} |")
    for name, fn in ts[1:]:
        got, dt = run(fn)
        rec = len(got & exact) / len(exact)
        print(f"| {name} | {rec:.3f} | {dt:.2f} |")


def main():
    from potoos_spark.operators import similarity as S

    spark = get_session("ann_sweep")
    if FIXTURE in ("real", "both"):
        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = e.filter(F.col("vec_id") < NQ)
        sweep(S, q, e, f"real ({SF})")
    if FIXTURE in ("clustered", "both"):
        e = make_clustered(spark).persist()
        e.count()
        q = e.filter(F.col("vec_id") < NQ)
        sweep(S, q, e, "clustered (MoG n=2000 d=64 c=16 sigma=0.15 seed=7)")


if __name__ == "__main__":
    main()
