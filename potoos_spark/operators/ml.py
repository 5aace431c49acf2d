"""MLlib-backed operators (SURVEY.md §7 Phase 4 — north-star
extensions; no reference file:line).

These are the model-based complements to the deterministic operators in
``dedup.py`` / ``similarity.py``: MLlib's MinHashLSH and
BucketedRandomProjectionLSH run the hash-family fitting and the
approx-join planning JVM-side, and KMeans provides a model-distance
anomaly score. All are seeded for within-Spark determinism, but their
hash families are not reproducible in set-oriented SQL → rows-only
correctness checks (the deterministic md5-based variants carry the
bit-exact oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import shingles, tokens


def _doc_vectors(df: DataFrame, text_col: str, id_col: str, n_features: int):
    """doc → sparse term-frequency vector over word 3-gram shingles
    (same shingling as the deterministic dedup path, text.shingles)."""
    from pyspark.ml.feature import HashingTF

    # pre-filter on token count (shingles nonempty ⟺ ≥3 tokens): a
    # size filter above the projection would re-inline the whole
    # shingle builder into the pushed-down predicate (r9 HOF lesson);
    # duplicating only tokens() in the predicate is the cheap half
    shingled = df.filter(F.size(tokens(text_col)) >= 3).select(
        F.col(id_col), shingles(tokens(text_col)).alias("shingles")
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=n_features)
    return tf.transform(shingled)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_distance: float = 0.8,
    num_hash_tables: int = 8,
    n_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MLlib MinHashLSH near-dup pairs: hashingTF shingle vectors →
    fitted hash family → ``approxSimilarityJoin`` (the JVM plans the
    band-bucket join). Returns (id_a, id_b, jaccard_dist)."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _doc_vectors(df, text_col, id_col, n_features)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    ).fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, jaccard_distance, distCol="jaccard_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            "jaccard_dist",
        )
    )


def brp_lsh_neighbors(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 2.0,
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH euclidean approx-join:
    (query_id, match_id, euclidean_dist) for pairs within
    ``threshold``. The random-hyperplane buckets prune the pair space
    exactly like similarity.lsh_bucket_topk's sign buckets, but with a
    fitted, seeded hash family."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def prep(d, out_id):
        return d.select(
            F.col(id_col).alias(out_id),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )

    q = prep(queries, "query_id")
    c = prep(corpus, "match_id")
    model = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(c)
    joined = model.approxSimilarityJoin(q, c, threshold, distCol="euclidean_dist")
    return (
        joined.filter(F.col("datasetA.query_id") != F.col("datasetB.match_id"))
        .select(
            F.col("datasetA.query_id").alias("query_id"),
            F.col("datasetB.match_id").alias("match_id"),
            "euclidean_dist",
        )
    )


def quantile_centroid_scores(
    df: DataFrame, k: int = 8, value_col: str = "value"
) -> DataFrame:
    """Deterministic twin of ``kmeans_distance_scores`` for 1-D
    features — the hash-oracle-checked catalog form (seeded MLlib
    KMeans centroids aren't SQL-reproducible). Centroids are the k
    exact LOW quantiles of ``value_col`` at the odd mid-fractions
    (2i+1)/(2k) — the classic 1-D k-means seeding — selected by RANK
    (order statistics, not float means, so no summation-order
    dependence anywhere); score = distance to the nearest centroid,
    exactly the model-distance anomaly signal of the KMeans form.

    Physical shape: the total order comes from ``skew.global_rank``
    (range repartition + per-slice row_number + broadcast offsets —
    never a partition-less window); the ≤ k selected centroid values
    collapse to a 1-row array that broadcasts back, and scoring is one
    in-row array fold. Rank boundaries use the integer-fraction
    arithmetic of ``sampled_quantiles_md5`` (ceil(n*(2i+1)/(2k)) via
    correctly-rounded IEEE ops), so both engines select identical
    centroids.

    Output: (series_key, ts_ms, value, score) — same as the MLlib form.
    """
    from .skew import global_rank

    base = df.select("series_key", "ts_ms", F.col(value_col).alias("value"))
    ranked = global_rank(
        base, ["value", "series_key", "ts_ms"], rank_col="__rk"
    )
    n = ranked.agg(F.count("*").alias("__n"))
    spec = df.sparkSession.createDataFrame(
        [(2 * i + 1, 2 * k) for i in range(k)], "num int, den int"
    )
    target = F.ceil(
        (F.col("__n") * F.col("num")).cast("double") / F.col("den").cast("double")
    ).cast("bigint")
    cents = (
        ranked.join(F.broadcast(n))
        .join(F.broadcast(spec))
        .filter(F.col("__rk") == target)
        .select(F.col("value").alias("c"))
        .distinct()
        .agg(F.sort_array(F.collect_list("c")).alias("__cs"))
    )
    score = F.array_min(
        F.transform(F.col("__cs"), lambda c: F.abs(F.col("value") - c))
    )
    return base.join(F.broadcast(cents)).select(
        "series_key", "ts_ms", "value", score.alias("score")
    )


def kmeans_distance_scores(
    df: DataFrame,
    k: int = 8,
    seed: int = 42,
    feature_cols: tuple = ("value",),
) -> DataFrame:
    """Model-based detector: fit KMeans over per-point feature vectors,
    score = euclidean distance to the assigned centroid (points far
    from every cluster are anomalous). Output:
    (series_key, ts_ms, value, score)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = array_to_vector(
        F.array(*[F.col(c).cast("double") for c in feature_cols])
    ).alias("features")
    base = df.select("series_key", "ts_ms", "value", feats)
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(base)
    centers = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "prediction int, center array<double>",
    )
    assigned = model.transform(base).join(F.broadcast(centers), "prediction")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                vector_to_array(F.col("features")),
                F.col("center"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return assigned.select("series_key", "ts_ms", "value", dist.alias("score"))
