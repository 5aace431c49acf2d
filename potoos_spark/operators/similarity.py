"""Similarity search over embedding columns (array<float>).

Three tiers, trading recall for scan cost:

* ``cosine_topk`` — brute-force exact top-k: the correctness baseline.
  One shuffle (queries broadcast against the corpus scan); at 100 TB
  it's a full corpus scan per query batch — use only for small query
  sets or as the verifier of the pruned paths.
* ``lsh_bucket_topk`` — sign-bit random-hyperplane LSH (deterministic
  axis-aligned variant: the sign pattern of the first ``n_bits``
  dimensions). Join is bucket-equality — the corpus scan prunes to
  matching buckets (1/2^bits of the data in expectation).
* ``ivf_topk`` — IVF: KMeans (MLlib) coarse quantizer; probe the
  ``n_probe`` nearest centroids per query. The centroid assignment is
  a tiny broadcast join; the candidate scan reads only probed cells.

Cosines use integer-scaled vectors (exact math, engine-portable); ties
broken by id so top-k is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import cosine_expr, scaled_vec


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k neighbors (self-matches excluded)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce"))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("match_id"))
    scored = pairs.select(
        "query_id", "match_id", cosine_expr(F.col("qe"), F.col("ce")).alias("cosine")
    )
    return _ranked_topk(scored, k)


def sign_bucket(vec_col, n_bits: int = 8):
    """Deterministic LSH bucket id: sign pattern of the first n_bits
    dimensions (axis-aligned hyperplanes — engine-portable; swap in
    seeded random hyperplanes for production recall)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(
            F.slice(c, 1, n_bits),
            F.array([F.lit(2 ** i) for i in range(n_bits)]),
            lambda x, w: F.when(x >= 0, w).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    ).cast("bigint")


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_bits: int = 8,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket: equality join on the
    bucket id prunes the corpus scan to ~1/2^n_bits."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        scaled_vec(vec_col).alias("qe"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        scaled_vec(vec_col).alias("ce"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    pairs = F.broadcast(q).join(c, "bucket").filter(
        F.col("query_id") != F.col("match_id")
    )
    scored = pairs.select(
        "query_id", "match_id", cosine_expr(F.col("qe"), F.col("ce")).alias("cosine")
    )
    return _ranked_topk(scored, k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer (seeded — deterministic within
    Spark, but not SQL-expressible → rows-only correctness check).
    Corpus rows are assigned to their nearest centroid cell; each query
    probes its ``n_probe`` nearest cells."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    train = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("emb"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
    assigned = model.transform(train).select(
        "match_id", "emb", F.col("prediction").alias("cell")
    )

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, center array<double>",
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qemb"))
    # rank cells per query by exact centroid distance, probe the best n_probe
    qc = q.crossJoin(F.broadcast(centers)).withColumn(
        "dist",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("qemb").cast("array<double>"),
                    F.col("center"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ),
    )
    wq = W.partitionBy("query_id").orderBy("dist", "cell")
    probed = qc.withColumn("r", F.row_number().over(wq)).filter(F.col("r") <= n_probe)
    cand = (
        F.broadcast(probed.select("query_id", "qemb", "cell"))
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("match_id"))
    )
    scored = cand.select(
        "query_id",
        "match_id",
        cosine_expr(scaled_vec("qemb"), scaled_vec("emb")).alias("cosine"),
    )
    return _ranked_topk(scored, k)
