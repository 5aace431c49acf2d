"""The MLlib operators (operators/ml.py) keep pytest coverage now that
their catalog slots are wired to deterministic twins (r5), and the
twins are checked for the properties that make them faithful stand-ins:
exactness of the verification stage, recall against brute force, and
agreement with the model-based form's semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potoos_spark.catalog.common import hourly_avg_frame, table
from tests.conftest import SF_ORACLE_DIR

SF_SMALL = "/root/testdata/sf0.001"


# --- MLlib library API (seeded; smoke + shape, not SQL-checkable) ----------


def test_mllib_minhash_lsh_runs_and_orders_pairs(spark):
    from potoos_spark.operators.ml import minhash_lsh_dedup

    rows = minhash_lsh_dedup(
        table(spark, SF_SMALL, "documents"), jaccard_distance=0.9
    ).collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(0.0 <= r["jaccard_dist"] <= 0.9 for r in rows)


def test_mllib_brp_lsh_runs_and_bounds_distance(spark):
    from potoos_spark.operators.ml import brp_lsh_neighbors

    e = table(spark, SF_SMALL, "embeddings")
    rows = brp_lsh_neighbors(e.filter(F.col("vec_id") < 3), e).collect()
    assert rows, "approx join found nothing"
    assert all(0.0 <= r["euclidean_dist"] <= 2.0 for r in rows)
    assert all(r["query_id"] != r["match_id"] for r in rows)


def test_mllib_kmeans_scores_shape_and_nonnegative(spark):
    from potoos_spark.operators.ml import kmeans_distance_scores

    df = hourly_avg_frame(spark, SF_SMALL)
    rows = kmeans_distance_scores(df, k=4).collect()
    assert len(rows) == df.count()
    assert all(r["score"] >= 0.0 for r in rows)


# --- deterministic twins (the catalog-wired, oracle-checked forms) ---------


def test_brp_md5_no_false_positives_and_recall(spark):
    """Every reported pair must TRULY be within the threshold (the
    verify stage is exact, so false positives are impossible by
    construction — this guards the integer gate), and the bucket
    pruning must keep most of the true within-threshold pairs."""
    from potoos_spark.operators.similarity import brp_lsh_neighbors_md5

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    got = brp_lsh_neighbors_md5(q, e, threshold=2.0).collect()
    assert got

    # exact within-threshold pairs by brute force
    qe = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    ce = e.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("cv"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("qv").cast("array<double>"),
                F.col("cv").cast("array<double>"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    exact = {
        (r["query_id"], r["match_id"])
        for r in qe.crossJoin(ce)
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("d", dist)
        .filter(F.col("d") <= 2.0)
        .collect()
    }
    got_pairs = {(r["query_id"], r["match_id"]) for r in got}
    # quantization moves distances by <~1e-3, so compare against the
    # exact set with a tiny tolerance: no reported pair may be beyond
    # threshold by more than the quantization slack
    assert all(r["euclidean_dist"] <= 2.0 + 1e-3 for r in got)
    recall = len(got_pairs & exact) / len(exact)
    assert recall >= 0.5, f"BRP-LSH recall collapsed to {recall:.2f}"


def test_ivf_md5_recall_vs_exact(spark):
    from potoos_spark.operators.similarity import cosine_topk, ivf_topk_md5

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["match_id"])
        for r in cosine_topk(q, e, k=5).collect()
    }
    got = ivf_topk_md5(q, e, k=5, n_cells=8, n_probe=4).collect()
    hit = sum(1 for r in got if (r["query_id"], r["match_id"]) in exact)
    assert hit / len(exact) >= 0.5, f"md5-IVF recall {hit / len(exact):.2f}"


def test_ivf_md5_partitioning_independent(spark):
    from potoos_spark.operators.similarity import ivf_topk_md5

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk_md5(q, e, k=5).collect()))
    b = sorted(map(tuple, ivf_topk_md5(q.repartition(7), e.repartition(13), k=5).collect()))
    assert a == b


def test_quantile_centroid_scores_semantics(spark):
    """Hand fixture: values cluster at 0 and 100; with k=2 the rank
    centroids land inside each cluster, so in-cluster points score
    near 0 and a point midway scores its distance to the nearer
    centroid."""
    from potoos_spark.operators.ml import quantile_centroid_scores

    rows = (
        [("a", i * 1000, 0.0 + i) for i in range(8)]  # 0..7
        + [("b", i * 1000, 100.0 + i) for i in range(8)]  # 100..107
        + [("a", 99_000, 50.0)]
    )
    df = spark.createDataFrame(rows, "series_key string, ts_ms long, value double")
    got = {(r["series_key"], r["ts_ms"]): r["score"] for r in
           quantile_centroid_scores(df, k=2).collect()}
    assert len(got) == 17
    # centroids = values at ranks ceil(17/4)=5 and ceil(51/4)=13 of the
    # sorted values (0..7, 50, 100..107) -> 4.0 and 103.0
    assert got[("a", 4000)] == 0.0  # value 4.0 IS a centroid
    assert got[("b", 3000)] == 0.0  # value 103.0 IS a centroid
    assert got[("a", 99_000)] == 46.0  # |50 - 4|
    assert all(v >= 0.0 for v in got.values())


def test_quantile_centroid_scores_flags_outlier(spark):
    """On the real hourly series, the max-score point must score far
    above the median score (the anomaly-signal property the KMeans
    form is used for)."""
    from potoos_spark.operators.ml import quantile_centroid_scores

    df = hourly_avg_frame(spark, SF_ORACLE_DIR)
    scores = sorted(
        r["score"] for r in quantile_centroid_scores(df, k=8).collect()
    )
    med = scores[len(scores) // 2]
    assert scores[-1] > 5 * max(med, 1e-9)


# --- product quantization (r5) ---------------------------------------------


def test_pq_codes_medoids_quantize_to_zero_error(spark):
    """Every md5-medoid vector's own subvectors ARE codebook entries,
    so its quantization error must be exactly 0 in every subspace."""
    import hashlib

    from potoos_spark.operators.similarity import pq_codes

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    ids = [r["vec_id"] for r in e.select("vec_id").collect()]
    medoids = set(sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:16])
    rows = pq_codes(e).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], []).append(r)
    for m in medoids:
        assert all(r["sub_sqdist"] == 0 for r in by_vec[m]), m
    # every vector has one code per subspace, codes drawn from medoids
    assert all(len(v) == 8 for v in by_vec.values())
    assert all(r["code"] in medoids for r in rows)


def test_pq_reconstruction_error_monotone_in_codebook(spark):
    """The 16-medoid codebook is a PREFIX of the 64-medoid codebook
    (same md5 order), so per-(vector, subspace) quantization error is
    deterministically non-increasing — a bug in assignment or the
    codebook draw breaks this exactly."""
    from potoos_spark.operators.similarity import pq_codes

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    r16 = {(r["vec_id"], r["s"]): r["sub_sqdist"] for r in pq_codes(e, n_centroids=16).collect()}
    r64 = {(r["vec_id"], r["s"]): r["sub_sqdist"] for r in pq_codes(e, n_centroids=64).collect()}
    assert set(r16) == set(r64)
    assert all(r64[k] <= r16[k] for k in r16)
    assert sum(r64.values()) < sum(r16.values())  # strictly better overall


def test_pq_adc_candidate_recall_and_funnel_shape(spark):
    """ADC is the candidate GENERATOR of the PQ funnel: its top-80 pool
    must hold most of the exact euclidean top-10 (measured 0.62 at the
    16-centroid operating point on this fixture — gate at 0.5), and the
    reported distances must be non-decreasing with rank."""
    from pyspark.sql import Window as W

    from potoos_spark.operators.similarity import pq_adc_topk

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    qe = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    ce = e.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("cv"))
    d = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("qv").cast("array<double>"),
                F.col("cv").cast("array<double>"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("d"), F.col("match_id"))
    exact = {
        (r["query_id"], r["match_id"])
        for r in qe.crossJoin(ce)
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("d", d)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    got = pq_adc_topk(q, e, k=80).collect()
    hit = sum(1 for r in got if (r["query_id"], r["match_id"]) in exact)
    assert hit / len(exact) >= 0.5, f"ADC pool recall {hit / len(exact):.2f}"
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r["rank"])
        dists = [r["adc_dist"] for r in rows]
        assert dists == sorted(dists)


def test_pq_rerank_recall_at_least_adc_and_exact_distances(spark):
    """The ADC->exact funnel's recall@10 vs the exact euclidean top-10
    must be >= the ADC-only recall (exact re-ranking of the candidate
    pool can only fix stage-1 ordering), and every reported distance
    must EQUAL the exact distance for that pair."""
    from pyspark.sql import Window as W

    from potoos_spark.operators.similarity import pq_adc_topk, pq_rerank_topk

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    qe = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    ce = e.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("cv"))
    d = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("qv").cast("array<double>"),
                F.col("cv").cast("array<double>"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("d"), F.col("match_id"))
    exact_rows = (
        qe.crossJoin(ce)
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("d", d)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    )
    exact = {(r["query_id"], r["match_id"]) for r in exact_rows}
    exact_d = {(r["query_id"], r["match_id"]): r["d"] for r in exact_rows}

    adc = {(r["query_id"], r["match_id"]) for r in pq_adc_topk(q, e, k=10).collect()}
    rr_rows = pq_rerank_topk(q, e, k=10, expand=8).collect()
    rr = {(r["query_id"], r["match_id"]) for r in rr_rows}
    assert len(rr & exact) >= len(adc & exact)
    for r in rr_rows:
        key = (r["query_id"], r["match_id"])
        if key in exact_d:
            # same integer-scaled arithmetic -> ~quantization-level agreement
            assert abs(r["euclidean_dist"] - exact_d[key]) < 2e-3, key


def test_pq_blocked_no_false_positives_and_fixture_recall(spark):
    """Banded PQ blocking: every returned pair is truly >= threshold
    (exact verify), and the measured fixture recall vs the all-pairs
    exact baseline holds at the documented 0.8 gate (weak fixture dups,
    cosine 0.4-0.51 — see operator docstring)."""
    from potoos_spark.operators.dedup import embedding_dup_pairs
    from potoos_spark.operators.similarity import pq_blocked_dup_pairs

    e = table(spark, SF_ORACLE_DIR, "embeddings")
    exact = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(e, threshold=0.4).collect()}
    got_rows = pq_blocked_dup_pairs(e, threshold=0.4).collect()
    got = {(r["id_a"], r["id_b"]) for r in got_rows}
    assert got <= exact  # exact verify: no false positives possible
    assert all(r["cosine"] >= 0.4 for r in got_rows)
    assert len(got) / len(exact) >= 0.8, f"recall {len(got) / len(exact):.2f}"
