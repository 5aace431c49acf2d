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

from .dedup import cosine_expr, cosine_from_norms, scaled_vec, sqnorm_expr


def _ranked_topk(pairs: DataFrame, k: int) -> DataFrame:
    # rank as bigint: matches the int64 the DuckDB oracles emit (and
    # the PQ entries), so the driver compares equal widths everywhere
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
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
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("match_id"))
    scored = pairs.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def matryoshka_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Truncated-prefix cosine top-k — the Matryoshka retrieval trick
    (Kusupati et al. 2022, "Matryoshka Representation Learning"): rank
    by cosine over only the FIRST ``dims`` components. With
    MRL-trained embeddings the prefix carries most of the signal, so
    this cuts dot-product cost (and candidate-scan memory traffic) by
    d/dims; the standard deployment retrieves a candidate pool at low
    dims and re-ranks it at full width (compose with ``cosine_topk``
    over the candidates). ``dims = full width`` degenerates to exactly
    ``cosine_topk`` — pinned by a unit test.

    The truncation is a pure in-row ``slice`` before the same
    broadcast-queries-vs-corpus scan as the brute path — no extra
    shuffle, no Python.
    """
    def trunc(df: DataFrame) -> DataFrame:
        return df.withColumn(vec_col, F.slice(F.col(vec_col), 1, int(dims)))

    return cosine_topk(trunc(queries), trunc(corpus), vec_col, id_col, k)


def centroid_drift(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Embedding drift monitor: per label, the cosine between the
    class centroid computed on two deterministic halves of the data
    (md5(id) first hex digit < '8' → half 'a'). Drift ≈ 1 means the
    class occupies the same region in both halves; a drop flags
    distribution shift, labeling drift, or an embedding-model change —
    the standard go/no-go check before mixing corpora or retraining.
    In production the 'halves' are time periods or sources; the
    hash-half form here makes the statistic reproducible on fixtures.

    Exactness: cosine is scale-invariant, so it is computed on the
    per-half integer SUM vectors directly — no float means anywhere.
    Per-dim sums are exact bigints (one map-side-combinable hash agg
    over the posexploded scaled vectors), the dot/norm reductions are
    exact bigint sums, and the single division is the only float op —
    bit-stable across engines and partitionings.

    Shape: one explode → (label, half, dim) hash agg (shuffle carries
    labels × 2 × d rows), one co-keyed join of the two half relations,
    one per-label agg. Labels present in only one half are omitted
    (no drift is defined for them).

    Output: (label, n_a, n_b, drift_cosine).
    """
    from .dedup import scaled_vec

    half = F.when(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1) < "8", "a"
    ).otherwise("b")
    base = df.select(
        F.col(label_col).cast("bigint").alias("label"),
        half.alias("half"),
        scaled_vec(vec_col).alias("e"),
    )
    counts = base.groupBy("label", "half").agg(F.count("*").alias("n"))
    sums = base.select(
        "label", "half", F.posexplode("e").alias("dim", "milli")
    ).groupBy("label", "half", "dim").agg(F.sum("milli").alias("s"))
    a = sums.filter(F.col("half") == "a").select("label", "dim", F.col("s").alias("sa"))
    b = sums.filter(F.col("half") == "b").select("label", "dim", F.col("s").alias("sb"))
    per_label = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("sa") * F.col("sb")).alias("__dot"),
            F.sum(F.col("sa") * F.col("sa")).alias("__na"),
            F.sum(F.col("sb") * F.col("sb")).alias("__nb"),
        )
    )
    drift = F.col("__dot").cast("double") / F.sqrt(
        (F.col("__na") * F.col("__nb")).cast("double")
    )
    na = counts.filter(F.col("half") == "a").select("label", F.col("n").alias("n_a"))
    nb = counts.filter(F.col("half") == "b").select("label", F.col("n").alias("n_b"))
    return (
        per_label.join(na, "label")
        .join(nb, "label")
        .select("label", "n_a", "n_b", drift.alias("drift_cosine"))
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training data: for each
    anchor, the top-``k`` most-similar corpus vectors carrying a
    DIFFERENT label — the near-miss negatives that make a contrastive
    or reranker objective informative (random negatives are trivially
    separable; in-batch negatives are rarely this close).

    Same physical shape as ``cosine_topk``: the (small) anchor set
    broadcasts, the corpus is scanned once with the label inequality
    applied IN the join condition (no post-filter blowup), integer-
    scaled dot products keep scores engine-exact, and per-anchor top-k
    is a ranked window over the scored candidates. The production scale
    path composes the same way with ``lsh_bucket_topk``'s bucket join —
    mine within buckets, then rank.

    Output: (query_id, match_id, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("__ql"),
        scaled_vec(vec_col).alias("qe"),
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(label_col).alias("__cl"),
        scaled_vec(vec_col).alias("ce"),
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    pairs = F.broadcast(q).join(
        c,
        (F.col("query_id") != F.col("match_id"))
        & (F.col("__ql") != F.col("__cl")),
    )
    scored = pairs.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def sign_bucket(vec_col, n_bits: int = 8, offset: int = 0):
    """Deterministic LSH bucket id: sign pattern of ``n_bits``
    dimensions starting at ``offset`` (axis-aligned hyperplanes —
    engine-portable; swap in seeded random hyperplanes for production
    recall). Different offsets give independent hash tables."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.aggregate(
        F.zip_with(
            F.slice(c, offset + 1, n_bits),
            F.array([F.lit(2 ** i) for i in range(n_bits)]),
            lambda x, w: F.when(x >= 0, w).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda a, x: a + x,
    ).cast("bigint")


def streaming_embedding_dedup(
    sdf: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    event_time_col: str = "ingest_time",
    watermark: str = "1 hour",
    n_bits: int = 16,
) -> DataFrame:
    """Embedding near-dup suppression over an unbounded stream — the
    vector sibling of ``dedup.streaming_simhash_dedup``: first arrival
    per ``n_bits``-dim sign-pattern fingerprint (``sign_bucket``)
    passes, later sign-identical vectors (re-encoded / near-parallel
    copies — production near-dups at cosine ≥ 0.99 share all signs
    w.h.p.) drop. The fingerprint is a fully in-row fold, so the only
    shuffle in the plan is the state-store partitioning on the bucket
    key; state = one row per distinct fingerprint inside the watermark
    horizon, evicted at the horizon. ``n_bits`` tunes the
    collision/recall trade exactly like the batch LSH paths (wider =
    stricter 'near'); the batch ``pq_blocked_dup_pairs`` /
    ``embedding_dup_pairs`` are the retroactive sweeps.

    Output: (id, event_time, bucket) — survivors only.
    """
    fp = sdf.select(
        F.col(id_col),
        F.col(event_time_col),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    return fp.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        ["bucket"]
    )


def sign_buckets_multi(vec_col, n_bits: int, n_tables: int):
    """array of (table_id, bucket) structs — one bucket per hash table,
    table t reading dimensions [t*n_bits, (t+1)*n_bits)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                sign_bucket(vec_col, n_bits, t * n_bits).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_bits: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket(s): equality join on
    (table, bucket) prunes the corpus scan to ~n_tables/2^n_bits.

    ``n_tables > 1`` is the recall lever: each table buckets on an
    independent dimension slice; a true neighbor is missed only if it
    disagrees with the query in EVERY table. Candidates are unioned
    (distinct) before exact re-ranking, so cost grows linearly in
    tables while misses shrink geometrically."""
    def prep(d, out_id, vec_alias, norm_alias):
        return (
            d.select(
                F.col(out_id),
                scaled_vec(vec_col).alias(vec_alias),
                F.explode(sign_buckets_multi(vec_col, n_bits, n_tables)).alias("tb"),
            )
            .withColumn(norm_alias, sqnorm_expr(F.col(vec_alias)))
            .select(out_id, vec_alias, norm_alias, "tb.table_id", "tb.bucket")
        )

    q = prep(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        "query_id", "qe", "qn",
    )
    c = prep(
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col)),
        "match_id", "ce", "cn",
    )
    pairs = (
        F.broadcast(q)
        .join(c, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "qe", "qn", "match_id", "ce", "cn")
        .distinct()
    )
    scored = pairs.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer (seeded — deterministic within
    Spark, but not SQL-expressible → rows-only correctness check).
    Corpus rows are assigned to their nearest centroid cell; each query
    probes its ``n_probe`` nearest cells. ``n_cells=None`` derives the
    cell count from corpus size (``auto_n_cells``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    train = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("emb"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(
        k=_resolve_n_cells(n_cells, corpus), seed=seed, featuresCol="features"
    ).fit(train)
    assigned = (
        model.transform(train)
        .select("match_id", scaled_vec("emb").alias("ce"), F.col("prediction").alias("cell"))
        .withColumn("cn", sqnorm_expr(F.col("ce")))
    )

    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, center array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qemb"),
        scaled_vec(vec_col).alias("qe"),
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
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
        F.broadcast(probed.select("query_id", "qe", "qn", "cell"))
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("match_id"))
    )
    scored = cand.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def ivf_topk_md5(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int | None = None,
    n_probe: int = 2,
) -> DataFrame:
    """Deterministic IVF — the hash-oracle-checked twin of ``ivf_topk``
    (the MLlib-KMeans quantizer stays the library API; its seeded
    centroids aren't SQL-reproducible). Coarse centroids are ACTUAL
    corpus vectors — the ``n_cells`` whose md5(id) hashes are smallest
    (a uniform, engine-portable random draw; medoid-style seeds, so no
    float centroid means anywhere) — and the cell id is the centroid's
    own vector id. Assignment and probing use exact-integer squared
    L2 on the scaled vectors (||a-c||² = na + nc − 2·a·c, all bigint),
    ties on cell id, so cell membership is bit-deterministic.

    Physical shape mirrors the production IVF exactly: the centroid
    draw is a TakeOrderedAndProject (per-partition heaps — never a
    global sort or partition-less window); the KB-scale centroid table
    broadcasts to both assignment scans; candidates are only the rows
    of probed cells (n_probe/n_cells of the corpus in expectation).

    Output: (query_id, match_id, cosine, rank) — same as the other
    knn entries.
    """
    c = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    cent = (
        c.withColumn("__hm", F.md5(F.col("match_id").cast("string")))
        .orderBy("__hm")
        .limit(_resolve_n_cells(n_cells, corpus))
        .select(
            F.col("match_id").alias("cell"),
            F.col("ce").alias("cent_e"),
            F.col("cn").alias("cent_n"),
        )
    )

    def sqdist(e, n):
        dot = F.aggregate(
            F.zip_with(e, F.col("cent_e"), lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        return n + F.col("cent_n") - 2 * dot

    assigned = (
        c.crossJoin(F.broadcast(cent))
        .select(
            "match_id",
            "ce",
            "cn",
            "cell",
            sqdist(F.col("ce"), F.col("cn")).alias("__sq"),
        )
        .groupBy("match_id")
        .agg(
            F.min_by(
                F.struct("ce", "cn", "cell"), F.struct("__sq", "cell")
            ).alias("__a")
        )
        .select("match_id", "__a.ce", "__a.cn", "__a.cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    wq = W.partitionBy("query_id").orderBy("__sq", "cell")
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qe", "qn", "cell",
            sqdist(F.col("qe"), F.col("qn")).alias("__sq"),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= int(n_probe))
        .select("query_id", "qe", "qn", "cell")
    )
    cand = F.broadcast(probed).join(assigned, "cell").filter(
        F.col("query_id") != F.col("match_id")
    )
    scored = cand.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def quantize_embeddings(
    df: DataFrame, emb_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column (extension
    tier — the standard storage/ANN-recall trade for vector corpora):

        q_i = floor(x_i * 127 / amax + 0.5),  amax = max(|x|)

    per vector, with ``scale = amax / 127`` for dequantization
    (x ≈ q * scale). Everything is in-row array HOFs — zero shuffle; at
    100 TB this is a pure projection that cuts vector bytes 4× before
    any ANN index is built. All-zero vectors quantize to zeros with
    scale 0. floor(x + 0.5) rounding (not banker's round) keeps the
    lattice engine-portable.

    Output: (id_col, qvec array<bigint>, scale double, n_dims).
    """
    x = F.col(emb_col)
    # stage amax as a real column: HOF lambdas defeat subexpression
    # elimination, so computing it inline would refold the array per
    # element (O(d^2) per row)
    staged = df.select(
        F.col(id_col),
        x.alias("__x"),
        F.array_max(F.transform(x, lambda v: F.abs(v.cast("double")))).alias(
            "__amax"
        ),
    )
    amax = F.col("__amax")
    q = F.when(amax > 0, F.transform(
        "__x",
        lambda v: F.floor(v.cast("double") * 127.0 / amax + 0.5).cast("bigint"),
    )).otherwise(F.transform("__x", lambda v: F.lit(0).cast("bigint")))
    return staged.select(
        F.col(id_col),
        q.alias("qvec"),
        F.when(amax > 0, amax / 127.0).otherwise(F.lit(0.0)).alias("scale"),
        F.size("__x").cast("bigint").alias("n_dims"),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k over int8-QUANTIZED vectors — the search half
    of the ``quantize_embeddings`` storage trade: 4× smaller vectors,
    integer dot products (exact under any order), cosine reconstructed
    from the int8 lattice. Recall vs full-precision search is bounded by
    the quantization error (see tests); at 100 TB this is the scan you
    actually run, with the fp32 vectors cold-stored.

    Same join/rank shape as ``cosine_topk``: queries broadcast, one
    pass over the corpus, per-query top-k window."""
    def prep(d, out_id):
        qz = quantize_embeddings(d, vec_col, id_col)
        return qz.select(
            F.col(id_col).alias(out_id),
            F.col("qvec"),
            sqnorm_expr(F.col("qvec")).alias("n2"),
        )

    q = prep(queries, "query_id").withColumnsRenamed({"qvec": "qv", "n2": "qn"})
    c = prep(corpus, "match_id").withColumnsRenamed({"qvec": "cv", "n2": "cn"})
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("match_id"))
    scored = pairs.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def _pq_parts(df: DataFrame, vec_col: str, id_col: str, out_id: str,
              n_sub: int, dim: int) -> DataFrame:
    """(id, s, sub) — contiguous integer-scaled subvectors, one row per
    (vector, subspace). The slice array is built in-row (compile-time
    bounds) and posexploded — no shuffle."""
    sub_dim = dim // n_sub
    slices = F.array(*[
        F.slice(F.col("__e"), s * sub_dim + 1, sub_dim) for s in range(n_sub)
    ])
    return df.select(
        F.col(id_col).alias(out_id), scaled_vec(vec_col).alias("__e")
    ).select(out_id, F.posexplode(slices).alias("s", "sub"))


def _pq_codebook(corpus: DataFrame, vec_col: str, id_col: str,
                 n_sub: int, n_centroids: int, dim: int) -> DataFrame:
    """(s, cid, csub) — per-subspace codebooks from ONE md5-medoid draw:
    the ``n_centroids`` corpus vectors with smallest md5(id) (the
    ``ivf_topk_md5`` seeding), each contributing its s-th subvector to
    subspace s's codebook. n_sub × n_centroids rows ≈ KBs at any corpus
    size — always the broadcast side."""
    sub_dim = dim // n_sub
    med = (
        corpus.select(
            F.col(id_col).alias("cid"), scaled_vec(vec_col).alias("__e")
        )
        .withColumn("__hm", F.md5(F.col("cid").cast("string")))
        .orderBy("__hm")
        .limit(int(n_centroids))
    )
    slices = F.array(*[
        F.slice(F.col("__e"), s * sub_dim + 1, sub_dim) for s in range(n_sub)
    ])
    return med.select("cid", F.posexplode(slices).alias("s", "csub"))


def _sub_sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def pq_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search") — the storage/ANN workhorse at
    billion-vector scale: each vector splits into ``n_sub`` contiguous
    subvectors, each encoded as the id of its nearest per-subspace
    centroid, compressing d floats to n_sub small codes. Deterministic
    twin construction throughout: codebooks are md5-medoid draws (real
    corpus subvectors — no float k-means means), assignment is exact
    integer squared L2 with centroid-id ties, so codes are
    bit-reproducible and SQL-oracle-checkable.

    Physical shape: one in-row slice+posexplode scan (n_sub rows per
    vector), a broadcast codebook join (n_sub × n_centroids rows — KBs
    regardless of corpus size), one map-side-combinable min-struct agg.
    No corpus self-join, no window over corpus-sized data.

    Output LONG form (catalog outputs carry no arrays): one row per
    (vector, subspace) — (vec_id, s, code, sub_sqdist); ``sub_sqdist``
    is the exact integer quantization error of that subspace, so
    SUM(sub_sqdist) per vector is the reconstruction error the PQ
    recall/compression trade is tuned by.
    """
    cb = _pq_codebook(df, vec_col, id_col, n_sub, n_centroids, dim)
    sub = _pq_parts(df, vec_col, id_col, "vec_id", n_sub, dim)
    scored = sub.join(F.broadcast(cb), "s").select(
        "vec_id", "s", "cid", _sub_sqdist(F.col("sub"), F.col("csub")).alias("__sq")
    )
    m = scored.groupBy("vec_id", "s").agg(
        F.min(F.struct("__sq", "cid")).alias("__m")
    )
    return m.select(
        "vec_id",
        F.col("s").cast("bigint").alias("s"),
        F.col("__m.cid").alias("code"),
        F.col("__m.__sq").alias("sub_sqdist"),
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_sub: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """PQ search with asymmetric distance computation (ADC): the query
    stays full-precision; per (query, subspace) a lookup table of exact
    integer squared distances to every centroid is built once, and each
    corpus vector's approximate distance is the SUM of n_sub table
    lookups keyed by its stored codes — the corpus is never touched
    beyond its code columns. This is the memory-bandwidth shape that
    makes PQ run at billions of vectors: scan codes (n_sub small ints
    per vector), not floats.

    Plan: corpus codes (from ``pq_codes``) join the broadcast LUT
    (|Q| × n_sub × n_centroids rows) on (subspace, code), then one
    map-side-combinable sum per (query, match) and a bounded ranked
    window. Integer end-to-end; the only float is the reported
    distance (sqrt of an exact ≤2^31 integer / scale).

    Output: (query_id, match_id, adc_dist, rank) — ascending distance,
    ties on match_id.
    """
    codes = pq_codes(corpus, vec_col, id_col, n_sub, n_centroids, dim).select(
        F.col("vec_id").alias("match_id"), "s", "code"
    )
    cb = _pq_codebook(corpus, vec_col, id_col, n_sub, n_centroids, dim)
    qsub = _pq_parts(queries, vec_col, id_col, "query_id", n_sub, dim)
    lut = qsub.join(F.broadcast(cb), "s").select(
        "query_id", "s", "cid",
        _sub_sqdist(F.col("sub"), F.col("csub")).alias("__lsq"),
    )
    tot = (
        codes.join(
            F.broadcast(lut),
            (codes["s"] == lut["s"]) & (codes["code"] == lut["cid"]),
        )
        .filter(F.col("query_id") != F.col("match_id"))
        .groupBy("query_id", "match_id")
        .agg(F.sum("__lsq").alias("__total"))
    )
    w = W.partitionBy("query_id").orderBy("__total", "match_id")
    return (
        tot.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "match_id",
            (F.sqrt(F.col("__total").cast("double")) / F.lit(1000.0)).alias(
                "adc_dist"
            ),
            "rank",
        )
    )


def pq_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    expand: int = 4,
    n_sub: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """The production PQ funnel: ADC nominates ``expand × k``
    candidates per query from CODES ONLY (the cheap scan), then the
    exact integer squared L2 on the full-precision vectors re-ranks
    just those candidates to the final top-k — same two-stage shape as
    ``rerank_topk`` (int8 funnel), with PQ's stronger compression on
    stage 1. Both stages deterministic with id ties, so the SQL oracle
    replays the funnel bit-exactly. Stage-2 cost is |Q|·expand·k rows
    regardless of corpus size.

    Output: (query_id, match_id, euclidean_dist, rank) — exact
    distances, ascending.
    """
    cand = pq_adc_topk(
        queries, corpus, vec_col, id_col, k * expand, n_sub, n_centroids, dim
    ).select("query_id", "match_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "match_id")
        .withColumn("__sq", F.col("qn") + F.col("cn") - 2 * dot)
    )
    w = W.partitionBy("query_id").orderBy("__sq", "match_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "match_id",
            (F.sqrt(F.col("__sq").cast("double")) / F.lit(1000.0)).alias(
                "euclidean_dist"
            ),
            "rank",
        )
    )


def pq_blocked_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    n_sub: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
    cell_cap: int | None = None,
) -> DataFrame:
    """Embedding near-dup with BANDED PQ-code blocking — SimHash-band
    economics in embedding space: each subspace code is a band key,
    vectors sharing ANY (subspace, code) band become a candidate pair,
    and exact integer cosine verifies only candidates. No false
    positives (the verify is exact); recall is the banding miss rate —
    for production-tight near-dups (cosine ≥ 0.9, i.e. re-encoded /
    perturbed copies) per-band collision probability is high and the
    pruning is strong, while on this repo's deliberately weak fixture
    'dups' (cosine 0.4–0.51) the measured trade at the default
    operating point is 86% recall with ~21% of the all-pairs volume
    pruned (test-pinned) — the honest statement of what banding does
    when 'near' isn't very near. Tighten ``n_centroids`` to prune
    harder at lower recall (64 → 17% candidate volume, 61% fixture
    recall).

    SCALE GUARDRAIL — ``cell_cap``: with a FIXED codebook, cell
    population grows linearly with the corpus, so per-band pair volume
    grows quadratically (the sf1 probe measured exp 1.68 uncapped —
    SCALE.md r5). ``cell_cap`` skips bands whose cell exceeds the cap
    (an at-average-density cell holds vectors agreeing on one subspace
    by CHANCE — non-discriminative, the df-capped-shingle rationale),
    bounding candidates by cells × C(cap, 2) — linear in the corpus at
    fixed cap. The production lever is scaling ``n_centroids`` with
    the corpus so cells stay small (then the cap never bites); the cap
    is the safety net that keeps a mis-sized codebook from going
    quadratic. None = uncapped (correctness baseline).

    Plan shape: the candidate join is an EQUALITY join on
    (subspace, code) — never a cartesian — followed by one distinct
    and an exact verify bounded by candidate volume.

    Output: (id_a, id_b, cosine) — candidate pairs with
    cosine ≥ threshold, id_a < id_b.
    """
    codes = pq_codes(df, vec_col, id_col, n_sub, n_centroids, dim)
    if cell_cap is not None:
        keep = (
            codes.groupBy("s", "code")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= int(cell_cap))
            .select("s", "code")
        )
        codes = codes.join(keep, ["s", "code"])
    a = codes.select(F.col("vec_id").alias("id_a"), "s", "code")
    b = codes.select(F.col("vec_id").alias("id_b"), "s", "code")
    cand = (
        a.join(b, ["s", "code"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = df.select(
        F.col(id_col).alias("vec_id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    va = v.select(
        F.col("vec_id").alias("id_a"), F.col("e").alias("ea"),
        F.col("n").alias("na"),
    )
    vb = v.select(
        F.col("vec_id").alias("id_b"), F.col("e").alias("eb"),
        F.col("n").alias("nb"),
    )
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    cos = cosine_from_norms(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def brp_sign(t: int, i: int) -> int:
    """±1 hyperplane entry for (table t, dim i) — md5-derived, seedless
    (each engine re-derives the same constant at plan-build time;
    shared by ``brp_lsh_neighbors_md5`` and its SQL oracle generator so
    the two sides can't drift)."""
    import hashlib

    h = hashlib.md5(f"brp|{t}|{i}".encode()).hexdigest()[0]
    return 1 if h in "02468ace" else -1


def brp_lsh_neighbors_md5(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 2.0,
    bucket_length: float = 0.5,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Deterministic bucketed-random-projection (Euclidean) LSH — the
    hash-oracle-checked twin of ``ml.brp_lsh_neighbors`` (the fitted,
    seeded MLlib hash family stays the library API). Datar et al. 2004
    E2LSH with ±1 projection lines derived from md5 (``brp_sign``):
    bucket_t(v) = floor((v · s_t) / w). Projections are exact bigint
    folds over the integer-scaled vectors (w scales with them), so
    bucket membership is bit-deterministic; candidates are pairs
    sharing any (table, bucket); the distance filter compares SQUARED
    integer distance against the squared scaled threshold — no float
    boundary can flip membership. Only the reported distance is a
    float (one sqrt + one division).

    Physical shape: two in-row projection scans (no plane broadcast —
    the ±1 constants are codegen literals, same trick as
    ``random_projection``), one bucket-equality join that prunes the
    pair space to co-bucketed rows, exact verification on candidates
    only — the MLlib approxSimilarityJoin plan re-expressed in
    DataFrame ops.

    Output: (query_id, match_id, euclidean_dist) for pairs within
    ``threshold`` (original units).
    """
    from .dedup import scaled_vec, sqnorm_expr

    scale = 1000
    w = float(bucket_length * scale)
    sq_thresh = int(round(threshold * scale)) ** 2

    def buckets(e):
        def dot_t(t):
            return F.aggregate(
                F.array(*[
                    F.element_at(e, i + 1) * F.lit(brp_sign(t, i))
                    for i in range(dim)
                ]),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            )

        return F.array(*[
            F.struct(
                F.lit(t).alias("t"),
                F.floor(dot_t(t).cast("double") / F.lit(w))
                .cast("bigint")
                .alias("bucket"),
            )
            for t in range(n_tables)
        ])

    c = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    cb = c.select(
        "match_id", "ce", "cn", F.explode(buckets(F.col("ce"))).alias("b")
    ).select("match_id", "ce", "cn", "b.t", "b.bucket")
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    qb = q.select(
        "query_id", "qe", "qn", F.explode(buckets(F.col("qe"))).alias("b")
    ).select("query_id", "qe", "qn", "b.t", "b.bucket")
    cand = (
        qb.join(cb, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("match_id"))
        .dropDuplicates(["query_id", "match_id"])
    )
    dot = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    scored = cand.withColumn(
        "__sq", F.col("qn") + F.col("cn") - 2 * dot
    ).filter(F.col("__sq") <= sq_thresh)
    return scored.select(
        "query_id",
        "match_id",
        (F.sqrt(F.col("__sq").cast("double")) / F.lit(float(scale))).alias(
            "euclidean_dist"
        ),
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dim: int = 64,
    out_dim: int = 8,
) -> DataFrame:
    """Signed random projection (Achlioptas 2003 ±1 variant) for
    dimensionality reduction ahead of clustering / ANN indexing:
    y_j = Σ_i x_i · s(i, j) with s(i, j) ∈ {+1, −1} derived from
    md5(i|j) — a deterministic, seedless projection matrix that never
    materializes anywhere (each executor re-derives the constant signs
    at codegen time, so nothing broadcasts and nothing shuffles).

    Exactness: inputs are integer-scaled (``scaled_vec``: floor(x·1000
    + 0.5)), so the fold is pure bigint arithmetic — order-free and
    bit-identical on any engine. Physical shape: one in-row
    ``transform``/``aggregate`` chain per output dim, whole-stage
    codegen, zero shuffle, zero UDF — at 100 TB this is a map-only
    pass bounded by the parquet scan.

    Output: long form (id, j, y) — one row per (vector, output dim).
    """
    from .dedup import scaled_vec

    sv = scaled_vec(vec_col)

    def sign(i: int, j: int):
        import hashlib

        h = hashlib.md5(f"{i}|{j}".encode()).hexdigest()[0]
        return 1 if h in "02468ace" else -1

    proj = F.array(*[
        F.struct(
            F.lit(j).cast("bigint").alias("j"),
            F.aggregate(
                F.array(*[
                    F.element_at(F.col("__sv"), i + 1) * F.lit(sign(i, j))
                    for i in range(in_dim)
                ]),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("y"),
        )
        for j in range(out_dim)
    ])
    return (
        df.select(F.col(id_col), sv.alias("__sv"))
        .select(F.col(id_col), F.explode(proj).alias("p"))
        .select(F.col(id_col), F.col("p.j").alias("j"), F.col("p.y").alias("y"))
    )


def rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    expand: int = 4,
) -> DataFrame:
    """Two-stage retrieval — the production ANN shape: a cheap
    int8-quantized first pass nominates ``expand × k`` candidates per
    query (4× smaller vectors, integer dot products), then the exact
    full-precision cosine re-ranks ONLY those candidates for the final
    top-k. At 100 TB the first pass is the corpus scan you can afford
    (int8 lattice, cold fp32 storage untouched) and the second pass
    touches |Q|·expand·k rows — the recall loss of quantization is
    confined to the candidate CUTOFF, not the final ordering.

    Both stages are deterministic (integer lattices on both sides,
    ties broken by id), so the whole funnel is engine-reproducible —
    the oracle replays both stages in SQL. The candidate set rides a
    broadcast (bounded by the query set by construction).

    Output: (query_id, match_id, cosine, rank) — exact cosines, top-k.
    """
    cands = quantized_topk(
        queries, corpus, vec_col, id_col, k=int(k) * int(expand)
    ).select("query_id", "match_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    pairs = c.join(F.broadcast(cands.join(F.broadcast(q), "query_id")), "match_id")
    scored = pairs.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return _ranked_topk(scored, k)


def range_search(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Radius (range) search: every corpus vector whose exact cosine
    with a query reaches ``threshold`` — the fixed-similarity-bar
    retrieval mode (mine ALL near matches, e.g. harvesting paraphrase
    pairs or near-dup audit at a known bar), complementing top-k's
    fixed-count mode.

    The scale shape is strictly better than top-k's: after the query
    broadcast there is NO shuffle and NO ranked window anywhere — a
    pure map-side filtered join over the corpus, so the plan is
    embarrassingly parallel at any corpus size and emits matches as it
    scans. (Top-k must gather per-query candidates through a window;
    this never does.) Same exact integer-scaled cosine as
    ``cosine_topk`` — bit-identical scores, engine-portable.

    Output: (query_id, match_id, cosine) with cosine >= threshold.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("match_id"))
    scored = pairs.select(
        "query_id",
        "match_id",
        cosine_from_norms(
            F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= float(threshold))


def whiten_dims(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Diagonal whitening (per-dimension z-score) of an embedding
    corpus — the standard preprocessing before cosine/PQ indexing when
    dimensions have heterogeneous scales (whitening-then-dot is the
    first stage of ZCA/PCA pipelines; the diagonal form needs no
    eigendecomposition and distributes trivially).

    Exactness: embeddings are integer-scaled first (the ``scaled_vec``
    idiom), per-dim moments are EXACT bigint sums, and the z-score is
    algebraically rearranged to one double division of exact integers:
    z = (x*n - S1) / sqrt(n*S2 - S1^2) == (x - mean)/sd_pop, so the
    result is bit-identical across engines (no float accumulation
    order anywhere).

    Shape: one posexplode → per-dim hash agg (map-side combined to d
    rows per partition — d rows total cross the wire), broadcast of
    the d-row stats relation back onto the exploded corpus. At 100 TB
    the stats pass and the apply pass are both single-scan map jobs.

    Output: (vec_id, dim, z) — dim 0-based, one row per component.
    """
    e = df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(scaled_vec(vec_col)).alias("dim", "x"),
    ).withColumn("dim", F.col("dim").cast("bigint"))
    st = e.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    z = (F.col("x") * F.col("n") - F.col("s1")).cast("double") / F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    )
    return e.join(F.broadcast(st), "dim").select(
        "vec_id", "dim", z.alias("z")
    )


AUTO_CELL_TARGET = 256  # expected members per cell: half the cell_cap
# guardrail (512), so the cap is a pathology bound, not the steady state


def auto_n_cells(
    n_rows: int,
    target_cell_size: int = AUTO_CELL_TARGET,
    lo: int = 4,
    hi: int = 65536,
) -> int:
    """The production blocking lever (VERDICT r7 item 3): cells ∝
    corpus size, ``ceil(N / target_cell_size)`` clamped to [lo, hi] —
    keeps EXPECTED cell membership constant as the corpus grows, so
    per-cell pair work stays flat and the ``cell_cap`` guardrail stops
    truncating candidates (with cells FIXED at 16, a 100× corpus blows
    every cell past the cap and recall silently degrades; with the
    sqrt(N) schedule cell size still grows without bound). Total
    within-cell pair volume is then Θ(N · target) — linear, the floor
    for any operator whose OUTPUT is per-row. Deterministic: derived
    from an exact count, independent of partitioning, and mirrored in
    the DuckDB oracles as a scalar-subquery LIMIT."""
    want = (int(n_rows) + int(target_cell_size) - 1) // int(target_cell_size)
    return max(int(lo), min(int(hi), want))


def _resolve_n_cells(n_cells, corpus: DataFrame) -> int:
    """``n_cells=None`` → derive from ONE count of the corpus (a
    columnless scan; driver traffic = 1 scalar, within the SCALE.md
    collect policy). An explicit int passes through untouched."""
    if n_cells is None:
        return auto_n_cells(corpus.count())
    return int(n_cells)


def md5_medoid_centroids(c: DataFrame, n_cells: int) -> DataFrame:
    """(cell, cent_e, cent_n) from a standardized (__id, e, n) frame:
    the ``n_cells`` actual corpus vectors whose md5(id) is smallest —
    the engine-portable medoid quantizer shared by ``ivf_topk_md5``,
    ``semantic_dedup_cells``, and ``storage.write_ivf_index``. A
    TakeOrderedAndProject, never a global sort."""
    return (
        c.withColumn("__hm", F.md5(F.col("__id").cast("string")))
        .orderBy("__hm")
        .limit(int(n_cells))
        .select(
            F.col("__id").alias("cell"),
            F.col("e").alias("cent_e"),
            F.col("n").alias("cent_n"),
        )
    )


def assign_to_cells(c: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment of a standardized (__id, e, n)
    frame: exact-integer squared L2 (||a−c||² = n + cent_n − 2·a·c),
    ties on cell id; one broadcast-centroids map pass + a map-side-
    combinable min_by agg. Output: (__id, e, n, cell)."""
    dot_c = F.aggregate(
        F.zip_with("e", "cent_e", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return (
        c.crossJoin(F.broadcast(cent))
        .select(
            "__id", "e", "n", "cell",
            (F.col("n") + F.col("cent_n") - 2 * dot_c).alias("__sq"),
        )
        .groupBy("__id")
        .agg(
            F.min_by(F.struct("e", "n", "cell"), F.struct("__sq", "cell")).alias(
                "__a"
            )
        )
        .select("__id", "__a.e", "__a.n", "__a.cell")
    )


def _codebook_arrays(rows):
    """Pre-collected (cell, cent_e, cent_n) rows → numpy arrays sorted
    by cell id. Cell-ascending order makes ``argmin``'s
    first-occurrence tie rule equal the (sq, cell) tie rule of
    ``assign_to_cells``."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r["cell"])
    ids = np.array([r["cell"] for r in rows], dtype=np.int64)
    ce = np.array([list(r["cent_e"]) for r in rows], dtype=np.int64)
    cn = np.array([r["cent_n"] for r in rows], dtype=np.int64)
    return ids, ce, cn


def _codebook(cent: DataFrame):
    """Collect the (cell, cent_e, cent_n) relation into numpy arrays
    sorted by cell id — the IVF codebook every vectorized kernel
    broadcasts (MLlib KMeans ships its centers to executors the same
    way). Driver traffic = n_cells · d ints: metadata-scale (33 MB at
    the 65536-cell clamp with d=64 — the codebook, not the corpus)."""
    return _codebook_arrays(cent.collect())


def assign_to_cells_np(c: DataFrame, cent: DataFrame) -> DataFrame:
    """Vectorized twin of ``assign_to_cells``: identical output (exact
    int64 ``M @ C.T`` Gramian, sq = n + cn − 2·dot, argmin with the
    same (sq, cell) tie rule), different physical shape — a MAP-ONLY
    Arrow kernel against the broadcast codebook instead of a
    crossJoin + min_by shuffle. The r8 stage timing at the 10× probe
    scale measured the interpreted HOF fold at 3.4 s for 1.58 M
    centroid distances; the BLAS matmul is milliseconds, and the
    shuffle disappears entirely. Output: (__id, e, n, cell)."""
    return _assign_np_arrays(c, *_codebook(cent))


def _assign_np_arrays(c: DataFrame, ids, ce, cn) -> DataFrame:
    """``assign_to_cells_np`` over an already-collected codebook."""
    import numpy as np

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(e, dtype=np.int64) for e in pdf["e"]])
            sq = (
                pdf["n"].to_numpy(dtype=np.int64)[:, None]
                + cn[None, :]
                - 2 * (m @ ce.T)
            )
            pdf = pdf[["__id", "e", "n"]].copy()
            pdf["cell"] = ids[np.argmin(sq, axis=1)]
            yield pdf

    if ids.size == 0:  # empty corpus: no cells, no assignment
        return c.limit(0).withColumn("cell", F.lit(None).cast("bigint"))
    return c.mapInPandas(
        kern, schema="__id bigint, e array<bigint>, n bigint, cell bigint"
    )


def _md5_capped(pdf, cell_cap: int):
    """In-kernel twin of the md5-ranked ``row_number() <= cell_cap``
    guardrail window: sort by (md5(str(id)), id), truncate."""
    import hashlib

    order = sorted(
        range(len(pdf)),
        key=lambda i: (
            hashlib.md5(str(int(pdf["__id"].iloc[i])).encode()).hexdigest(),
            int(pdf["__id"].iloc[i]),
        ),
    )
    return pdf.iloc[order[: int(cell_cap)]]


def _cell_pair_cosines(pdf):
    """Within-cell all-pairs cosine matrix with the EXPRESSION tier's
    exact op order: int64 Gramian, then double(dot)/sqrt(double(na·nb))
    — both IEEE-correctly-rounded, so every cell is bit-identical to
    ``cosine_from_norms``."""
    import numpy as np

    e = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["e"]])
    n = pdf["n"].to_numpy(dtype=np.int64)
    dots = e @ e.T
    return dots.astype(np.float64) / np.sqrt(
        np.multiply.outer(n, n).astype(np.float64)
    )


def cell_capped_topk(
    assigned: DataFrame, k: int, cell_cap: int
) -> DataFrame:
    """Fused per-cell cap + score + top-k as ONE ``applyInPandas``
    stage: each node's candidates all live in its own (capped) cell, so
    the per-node rank cut can happen inside the cell group and only
    N·k edge rows ever leave Python — where the expression tier
    materialized the full n_cells·cap² pair relation (5.3 M rows at
    the 10× probe) through an interpreted fold and a global rank
    window. One shuffle total (the groupBy cell); group memory is
    bounded by the cell, which the auto-cells schedule keeps at
    ~AUTO_CELL_TARGET members. Ranking replicates row_number over
    (cosine DESC, match_id ASC) exactly (float negation is exact).
    Output: (query_id, match_id, cosine, rank)."""
    import numpy as np
    import pandas as pd

    def kern(pdf):
        pdf = _md5_capped(pdf, cell_cap)
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"query_id": [], "match_id": [], "cosine": [], "rank": []}
            )
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        cos = _cell_pair_cosines(pdf)
        q, mt, cs, rk = [], [], [], []
        for i in range(m):
            mask = np.ones(m, dtype=bool)
            mask[i] = False
            cj, idj = cos[i][mask], ids[mask]
            top = np.lexsort((idj, -cj))[: int(k)]
            q.extend([ids[i]] * len(top))
            mt.extend(idj[top])
            cs.extend(cj[top])
            rk.extend(range(1, len(top) + 1))
        return pd.DataFrame(
            {"query_id": q, "match_id": mt, "cosine": cs, "rank": rk}
        )

    return assigned.groupBy("cell").applyInPandas(
        lambda _, pdf: kern(pdf),
        schema="query_id bigint, match_id bigint, cosine double, rank bigint",
    )


def cell_capped_pairs(
    assigned: DataFrame, threshold: float, cell_cap: int
) -> DataFrame:
    """Fused per-cell cap + thresholded pair emission (the SemDeDup
    verify) as one ``applyInPandas`` stage — same physical rationale as
    ``cell_capped_topk``; only pairs at/above the duplicate bar leave
    Python. Output: (cell, id_a, id_b, cosine) with id_a < id_b."""
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def kern(key, pdf):
        pdf = _md5_capped(pdf, cell_cap)
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {"cell": [], "id_a": [], "id_b": [], "cosine": []}
            )
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        cos = _cell_pair_cosines(pdf)
        iu, ju = np.triu_indices(m, 1)
        keep = cos[iu, ju] >= thr
        ia, jb = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {
                "cell": np.full(keep.sum(), int(key[0]), dtype=np.int64),
                "id_a": np.minimum(ia, jb),
                "id_b": np.maximum(ia, jb),
                "cosine": cos[iu, ju][keep],
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        kern, schema="cell bigint, id_a bigint, id_b bigint, cosine double"
    )


def semantic_dedup_cells(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
    threshold: float = 0.4,
    cell_cap: int = 512,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): partition the embedding corpus into coarse cells,
    verify exact cosine ONLY within each cell — semantic duplicates
    cluster together by construction, so the pair space shrinks by
    ~n_cells versus all-pairs while keeping the verify exact.

    Cells are the md5-medoid coarse quantizer shared with
    ``ivf_topk_md5`` (actual corpus vectors with smallest md5(id) —
    no float k-means means, so assignment is exact-integer and
    engine-portable). ``cell_cap`` bounds members per cell (md5-ranked,
    deterministic) so a pathological mega-cell cannot go quadratic —
    the same guardrail ``pq_blocked_dup_pairs`` ships; the PRODUCTION
    lever — n_cells ∝ corpus size, keeping expected cell size (and so
    pairs-per-cell) constant — is the DEFAULT: ``n_cells=None`` derives
    ``auto_n_cells(count)`` from one corpus count.

    Shape (r8, vectorized): centroid draw is a TakeOrderedAndProject;
    assignment is a MAP-ONLY Arrow kernel against the broadcast
    codebook (``assign_to_cells_np`` — no shuffle); cap + verify are
    fused into ONE per-cell ``applyInPandas`` stage
    (``cell_capped_pairs``) whose exact int64 Gramian replays
    ``cosine_from_norms`` bit-for-bit, so only at-threshold pairs
    leave Python. One shuffle total, no global window, no all-pairs
    join anywhere.

    Quality contract (tested in test_ann_recall.py): precision is 1.0
    by construction — the within-cell verify computes the same exact
    integer-scaled cosine as the brute-force path, so every emitted
    pair is a true pair with the true score. Recall targets TRUE
    near-duplicates (cosine near 1), which share a nearest cell by
    construction; pairs far below the duplicate bar (e.g. the 0.3–0.5
    band of near-random similarities) are scattered across cells and
    are NOT the operator's target — use ``minhash_dedup_pairs`` /
    ``range_search`` when loose-pair completeness is required.

    Output: (cell, id_a, id_b, cosine) with id_a < id_b and
    cosine >= threshold.
    """
    c = df.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, _resolve_n_cells(n_cells, df))
    # r9: assignment rides the two-level funnel (self-gates to flat
    # below 64 cells) — with cells ∝ corpus size the flat N·C scan is
    # the documented ~10⁷-vector wall; the funnel cuts it to ~3·N·√C
    return cell_capped_pairs(two_level_assign(c, cent), threshold, cell_cap)


def _ceil_isqrt(n: int) -> int:
    """ceil(sqrt(n)) in exact integer arithmetic (DuckDB mirrors it as
    CEIL(SQRT(n)) — equal for every n below the 65 536-cell clamp)."""
    import math

    return math.isqrt(max(int(n) - 1, 0)) + 1 if n > 0 else 1


#: below this codebook size the hierarchy is counterproductive — a
#: handful of random-medoid supers routes poorly (any proper subset
#: drops a large fraction of the space: measured recall 0.48–0.72 vs
#: flat 0.89–0.94 at C=8–16) AND there is nothing to save (C dots per
#: vector is already cheap). S = C then makes every super its own
#: singleton group, so assignment degenerates to EXACTLY flat.
IVF2_HIER_MIN_CELLS = 64


def _ivf2_n_super(n_cells: int) -> int:
    """Super count for the two-level funnel: engage the hierarchy
    (S = ceil(sqrt(C))) only once the codebook is big enough to both
    matter and route well; identity (flat) below. At C = 157 the
    engaged hierarchy measured recall parity with flat (0.535 vs
    0.540 at probe 2, equal at probe 3) — the regime where it cuts
    per-vector assignment from C to ~2·sqrt(C) distances."""
    c = int(n_cells)
    return c if c < IVF2_HIER_MIN_CELLS else _ceil_isqrt(c)


def two_level_assign(
    c: DataFrame,
    cent: DataFrame,
    n_super: int | None = None,
    n_super_assign: int = 2,
) -> DataFrame:
    """Hierarchical (IMI-style) cell assignment — the drop-in successor
    to ``assign_to_cells_np`` for auto-sized codebooks: with cells ∝
    corpus size (``auto_n_cells``), FLAT assignment scans all C
    centroids per vector (N·C = N²/target total — the quadratic term
    that eventually dominates); splitting the codebook into
    S = ceil(sqrt(C)) SUPER-cells cuts that to N·(S + nsa·C/S) ≈
    (1+nsa)·N·√C — the inverted-multi-index funnel (Babenko &
    Lempitsky, CVPR'12; FAISS's coarse-within-coarse stage).

    Determinism: supers are the FIRST S centroids in md5(cell) order
    (the SAME order the ``md5_medoid_centroids`` draw used — a nested
    draw, no second hash family); every argmin is exact-integer
    squared L2 with id ties. Assignment: vector → its
    ``n_super_assign`` nearest supers → nearest centroid over the
    UNION of those supers' groups (widening to 2 supers measured
    +0.1–0.2 recall over 1 on the clustered fixture because membership
    then rarely diverges from flat assignment).

    Below ``IVF2_HIER_MIN_CELLS`` the funnel routes poorly AND saves
    nothing, and S = C makes the union argmin provably equal flat
    assignment — so this self-gates to the flat kernel there
    (bit-identical output either way; pinned by
    tests/test_oracle_parity.py's engaged-regime comparison).

    Input/output contract is exactly ``assign_to_cells_np``'s:
    standardized (__id, e, n) in, (__id, e, n, cell) out, map-only
    Arrow kernel against the driver-held codebook (C rows collected
    ONCE — metadata-scale per the SCALE.md collect policy)."""
    return _two_level_assign_rows(c, cent.collect(), n_super, n_super_assign)


def _two_level_assign_rows(
    c: DataFrame, rows, n_super: int | None, n_super_assign: int
) -> DataFrame:
    """``two_level_assign`` over an already-collected codebook."""
    import hashlib

    import numpy as np

    if not rows:
        return c.limit(0).withColumn("cell", F.lit(None).cast("bigint"))
    S = _ivf2_n_super(len(rows)) if n_super is None else int(n_super)
    if S >= len(rows):
        # degenerate regime: every super is its own singleton group, so
        # the union argmin equals the flat argmin — run the flat kernel
        return _assign_np_arrays(c, *_codebook_arrays(rows))

    ordered = sorted(
        rows, key=lambda r: hashlib.md5(str(r["cell"]).encode()).hexdigest()
    )
    sup_rows = sorted(ordered[:S], key=lambda r: r["cell"])  # id-asc ties
    sup_e = np.array([list(r["cent_e"]) for r in sup_rows], dtype=np.int64)
    sup_n = np.array([r["cent_n"] for r in sup_rows], dtype=np.int64)
    cell_ids, cell_e, cell_n = _codebook_arrays(rows)
    # centroid -> super (exact int sq L2, ties super id == argmin-first)
    c2s = np.argmin(
        cell_n[:, None] + sup_n[None, :] - 2 * (cell_e @ sup_e.T), axis=1
    )
    nsa = int(n_super_assign)

    def assign_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(e, dtype=np.int64) for e in pdf["e"]])
            n = pdf["n"].to_numpy(dtype=np.int64)
            # top-nsa supers per row (ties super id), then the best cell
            # over the UNION of those supers' groups (ties (sq, cell)) —
            # the widened funnel that keeps assignment close to flat
            ssq = n[:, None] + sup_n[None, :] - 2 * (m @ sup_e.T)
            tops = np.sort(np.argsort(ssq, axis=1, kind="stable")[:, :nsa], axis=1)
            cells = np.empty(len(pdf), dtype=np.int64)
            combos, inv = np.unique(tops, axis=0, return_inverse=True)
            for ci in range(len(combos)):
                sel = np.flatnonzero(inv == ci)
                grp = np.flatnonzero(np.isin(c2s, combos[ci]))
                sq = (
                    n[sel][:, None]
                    + cell_n[grp][None, :]
                    - 2 * (m[sel] @ cell_e[grp].T)
                )
                best = np.argmin(sq, axis=1)  # grp is cell-id ascending
                cells[sel] = cell_ids[grp][best]
            out = pdf[["__id", "e", "n"]].copy()
            out["cell"] = cells
            yield out

    return c.mapInPandas(
        assign_kernel, schema="__id bigint, e array<bigint>, n bigint, cell bigint"
    )


def _flat_probe(q: DataFrame, rows, n_probe: int) -> DataFrame:
    """FLAT query probing against a collected codebook: each query
    ranks ALL C cells by exact-integer squared L2 (ties (sq, cell) —
    cell-ascending codebook order makes stable argsort equal that
    rule) and keeps the best ``n_probe``. The per-query C-dot cost is
    query-scale (trivial next to the N·C assignment term at Q ≪ N; C
    clamped at 65,536) and probe behavior stays identical to
    ``ivf_topk_md5``'s, which is what drives recall. Input ``q`` must
    carry (__id, e, n); output (query_id, cell)."""
    import numpy as np
    import pandas as pd

    cell_ids, cell_e, cell_n = _codebook_arrays(rows)
    npb = int(n_probe)

    def probe_kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack([np.asarray(e, dtype=np.int64) for e in pdf["e"]])
            n = pdf["n"].to_numpy(dtype=np.int64)
            sq = n[:, None] + cell_n[None, :] - 2 * (m @ cell_e.T)
            order = np.argsort(sq, axis=1, kind="stable")[:, :npb]
            qs = np.repeat(pdf["__id"].to_numpy(dtype=np.int64), order.shape[1])
            yield pd.DataFrame(
                {"query_id": qs, "cell": cell_ids[order].reshape(-1)}
            )

    return q.mapInPandas(probe_kernel, schema="query_id bigint, cell bigint")


def ivf_topk_two_level(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_cells: int | None = None,
    n_super: int | None = None,
    n_probe: int = 2,
    n_super_assign: int = 2,
) -> DataFrame:
    """Two-level (IMI-style) IVF top-k: hierarchical CORPUS assignment
    (``two_level_assign`` — the N-scale cost the funnel exists to cut)
    + FLAT query probing. Probing is deliberately flat: queries rank
    ALL C cells by exact-integer squared L2 and take the best
    ``n_probe`` — per-query cost is Q·C (query-scale, trivial next to
    the N·C assignment term at Q ≪ N; C is clamped at 65,536), and it
    keeps probe behavior identical to ``ivf_topk_md5``'s, which is
    what drives recall. The DuckDB oracle in catalog/pipeline.py
    mirrors BOTH halves exactly (2-super-union assignment CTE, flat
    all-cell probe), so the operator is hash-checkable in the engaged
    regime too — see tests/test_oracle_parity.py's N ≥ 16,384 check.

    Output: (query_id, match_id, cosine, rank) — same as every knn
    entry."""
    import numpy as np
    import pandas as pd

    C = _resolve_n_cells(n_cells, corpus)
    c = corpus.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, C)

    # ONE driver-side codebook collect serves assignment + probing
    rows = cent.collect()
    if not rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, match_id bigint, cosine double, rank bigint"
        )
    assigned = _two_level_assign_rows(c, rows, n_super, n_super_assign)
    q = queries.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    probed = _flat_probe(q, rows, n_probe)
    qv = q.select(
        F.col("__id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("n").alias("qn"),
    )
    scored = (
        probed.join(assigned, "cell")
        .join(qv, "query_id")
        .filter(F.col("query_id") != F.col("__id"))
        .select(
            "query_id",
            F.col("__id").alias("match_id"),
            cosine_from_norms(
                F.col("qe"), F.col("e"), F.col("qn"), F.col("n")
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_cells: int | None = None,
    n_super: int | None = None,
    n_probe: int = 2,
    n_super_assign: int = 2,
    n_sub: int = 8,
    n_centroids: int = 16,
    dim: int = 64,
) -> DataFrame:
    """IVFADC — the full production ANN composition of Jégou et al.
    (TPAMI 2011, §V): coarse IVF cell-probing RESTRICTS the scan, PQ
    asymmetric-distance scoring makes the restricted scan codes-only.
    This is the shape FAISS's IndexIVFPQ ships at billion-vector
    scale, here assembled from the repo's two oracle-checked halves:

    * corpus side: two-level (IMI-style) hierarchical cell assignment
      (``two_level_assign`` semantics — the N·C term cut to
      ~2·sqrt(C)) + PQ codes (``pq_codes``, n_sub small ints per
      vector);
    * query side: flat cell probe (``_flat_probe``, best ``n_probe``
      cells) + per-subspace LUT of exact integer squared distances to
      every codebook centroid (|Q|·n_sub·n_centroids rows — KBs,
      always broadcast);
    * scan: candidate = corpus row in a probed cell; its approximate
      distance is the sum of n_sub LUT lookups keyed by stored codes.
      The corpus's float vectors are never touched after indexing —
      the scan reads (cell, codes) only, and reads them only for the
      probed fraction (~n_probe/C of the corpus vs ALL of it in the
      global-ADC ``pq_adc_topk``).

    Everything stays integer until the final reported distance, same
    determinism contract as both parents, so the composed operator is
    hash-checkable against the DuckDB replay.

    Output: (query_id, match_id, adc_dist, rank) — ascending ADC
    distance, ties on match_id."""
    C = _resolve_n_cells(n_cells, corpus)
    c = corpus.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, C)
    rows = cent.collect()
    if not rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id bigint, match_id bigint, adc_dist double, rank bigint"
        )
    assigned = _two_level_assign_rows(c, rows, n_super, n_super_assign).select(
        F.col("__id").alias("match_id"), "cell"
    )
    q = queries.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cand = (
        _flat_probe(q, rows, n_probe)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id")
    )
    codes = pq_codes(corpus, vec_col, id_col, n_sub, n_centroids, dim).select(
        F.col("vec_id").alias("match_id"), "s", "code"
    )
    cb = _pq_codebook(corpus, vec_col, id_col, n_sub, n_centroids, dim)
    qsub = _pq_parts(queries, vec_col, id_col, "query_id", n_sub, dim)
    lut = qsub.join(F.broadcast(cb), "s").select(
        "query_id",
        "s",
        F.col("cid").alias("code"),
        _sub_sqdist(F.col("sub"), F.col("csub")).alias("__lsq"),
    )
    tot = (
        cand.join(codes, "match_id")
        .join(F.broadcast(lut), ["query_id", "s", "code"])
        .groupBy("query_id", "match_id")
        .agg(F.sum("__lsq").alias("__total"))
    )
    w = W.partitionBy("query_id").orderBy("__total", "match_id")
    return (
        tot.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "match_id",
            (F.sqrt(F.col("__total").cast("double")) / F.lit(1000.0)).alias(
                "adc_dist"
            ),
            "rank",
        )
    )


def binary_sign_words(vec: Column, bits_per_word: int = 32) -> Column:
    """Pack the sign bits of a float vector into an array of bigint
    words, ``bits_per_word`` dims per word (32 keeps every term ≤ 2³¹ —
    exact in both bigint and float64, engine-portable; 64 would need
    the sign bit of a signed bigint). Bit j of word w is dim
    32w+j > 0.0 — the 1-bit "binary quantization" every
    billion-scale vector store ships as its cheapest tier (32×
    compression vs float32, Hamming distance ≈ angular distance)."""
    bpw = int(bits_per_word)
    n_words = F.ceil(F.size(vec) / F.lit(float(bpw))).cast("int")
    # Empty-vector guard: sequence(0, -1) would default to step -1 and
    # yield [0, -1] — two phantom zero words — where the oracle's
    # range(0) is []. Same idiom as the shingles() short-doc guard.
    packed = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w: F.aggregate(
            F.sequence(F.lit(0), F.lit(bpw - 1)),
            F.lit(0).cast("bigint"),
            lambda acc, j: acc
            + F.when(
                # F.get: 0-based, NULL (not ANSI error) past the end —
                # the tail word of a non-multiple-of-32 vector reads 0s
                F.get(vec, (w * bpw + j).cast("int")) > 0.0,
                F.pow(F.lit(2.0), j).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint")),
        ),
    )
    return F.when(F.size(vec) > 0, packed).otherwise(
        F.array().cast("array<bigint>")
    )


def hamming_words(a: Column, b: Column) -> Column:
    """Hamming distance between two packed sign-bit arrays: Σ popcount
    (a_w XOR b_w) — pure integer ops, whole-stage codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def binary_hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k by Hamming distance over 1-bit sign quantization — the
    cheapest retrieval tier (the faiss `IndexBinaryFlat` shape): the
    scan reads 1/32 of the float payload and the distance is XOR +
    popcount, both codegen'd integer ops. For sign-quantized vectors
    the expected Hamming distance is monotone in the angle, so the
    ranking approximates cosine ranking; use ``binary_rerank_topk``
    for the production funnel that repairs the quantization error.

    Plan shape: queries' packed words broadcast against the corpus's
    packed words (map-only scoring), then the bounded per-query ranked
    window. At a billion vectors the packed-words relation is the
    32×-smaller index you'd pin in memory.

    Output: (query_id, match_id, hamming, rank) — rank ascending by
    (hamming, match_id), self-match excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        binary_sign_words(F.col(vec_col)).alias("qw"),
    )
    c = corpus.select(
        F.col(id_col).alias("match_id"),
        binary_sign_words(F.col(vec_col)).alias("cw"),
    )
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            hamming_words(F.col("qw"), F.col("cw")).alias("hamming"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("hamming").asc(), F.col("match_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "match_id", "hamming", "rank")
    )


def binary_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    expand: int = 4,
) -> DataFrame:
    """Binary-then-exact funnel: ``binary_hamming_topk`` nominates
    ``expand × k`` candidates per query from the 1-bit tier, then the
    exact integer-scaled cosine re-ranks the nominees — final scores
    are full precision, stage-1 cost is 1/32 of the float scan. The
    binary sibling of ``rerank_topk`` (int8 stage 1): one tier cheaper,
    wider ``expand`` for the same recall.

    Output: (query_id, match_id, cosine, rank).
    """
    cand = binary_hamming_topk(
        queries, corpus, vec_col=vec_col, id_col=id_col, k=int(k) * int(expand)
    ).select("query_id", "match_id")
    qe = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    ce = corpus.select(
        F.col(id_col).alias("match_id"), scaled_vec(vec_col).alias("ce")
    ).withColumn("cn", sqnorm_expr(F.col("ce")))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "match_id")
        .select(
            "query_id",
            "match_id",
            cosine_from_norms(
                F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")
            ).alias("cosine"),
        )
    )
    return _ranked_topk(scored, int(k))


def mutual_neighbors(edges: DataFrame) -> DataFrame:
    """Mutual-kNN graph symmetrization — the edge filter behind
    density-based clustering and kNN-graph dedup (HDBSCAN, SNN
    clustering, deduplication by connected mutual components): keep
    (a, b) only when b is in a's top-k AND a is in b's top-k. Mutual
    edges are robust to hubness (a hub appears in everyone's top-k,
    but reciprocates only its true neighbors), which is why the mutual
    graph is the standard clustering substrate.

    Takes the EDGE LIST (query_id, match_id, cosine, rank) from ANY
    stage-1 kNN tier — exact, IVF, quantized, banded — so the operator
    itself is one self-join on the (N·k)-row edge frame, LINEAR in
    corpus size; the all-pairs cost (if any) lives in the pluggable
    stage 1, where the ANN tiers bound it.

    Output: (id_a, id_b, cosine, rank_ab, rank_ba) with id_a < id_b;
    cosine is stage-1's a→b score (symmetric for exact cosine).
    """
    a = edges.select(
        F.col("query_id").alias("id_a"),
        F.col("match_id").alias("id_b"),
        "cosine",
        F.col("rank").alias("rank_ab"),
    )
    b = edges.select(
        F.col("match_id").alias("id_a"),
        F.col("query_id").alias("id_b"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        a.join(b, ["id_a", "id_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cosine", "rank_ab", "rank_ba")
    )


def knn_classify(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """kNN majority-vote classification — the standard embedding-
    quality evaluation (a kNN probe): each query's label is predicted
    by the majority label among its k nearest corpus neighbors
    (self excluded), tie → smallest label; ``correct`` compares
    against the query's own label. Aggregate accuracy is the
    embedding-probe metric every similarity pipeline reports before
    trusting an index tier.

    Shape: stage-1 is the exact scan here (pluggable like the other
    funnels); the vote is one (query, label) hash agg over the N·k
    edge list + a ranked window bounded by the per-query label count.

    Output: (query_id, true_label, pred_label, votes, correct).
    """
    edges = cosine_topk(queries, corpus, vec_col, id_col, k).select(
        "query_id", "match_id"
    )
    lab = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(label_col).cast("bigint").alias("__nl"),
    )
    votes = (
        edges.join(lab, "match_id")
        .groupBy("query_id", "__nl")
        .agg(F.count("*").alias("votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("__nl").asc()
    )
    pred = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("__nl").alias("pred_label"), "votes")
    )
    truth = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).cast("bigint").alias("true_label"),
    )
    return pred.join(truth, "query_id").select(
        "query_id",
        "true_label",
        "pred_label",
        "votes",
        (F.col("pred_label") == F.col("true_label")).alias("correct"),
    )


def cell_knn_edges(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_cells: int | None = None,
    cell_cap: int = 512,
) -> DataFrame:
    """Bounded kNN edge list for graph construction: candidates come
    from the md5-medoid CELL blocking (the SemDeDup/IVF quantizer —
    cell_cap guardrail; n_cells ∝ corpus size is the production lever
    and the DEFAULT, via ``auto_n_cells`` when ``n_cells=None``),
    exact integer-scaled cosine scores within cells, and a per-node
    rank cut to k FUSED into the per-cell kernel
    (``cell_capped_topk``) — a node's candidates all live in its own
    cell, so only N·k edges ever materialize. This is the
    candidate-GENERATING-relation-capped stage-1 for
    ``mutual_neighbors`` — scoring volume is bounded by
    n_cells · cell_cap² at ANY corpus size, where the exact all-pairs
    ``cosine_topk(corpus, corpus)`` stage-1 is quadratic
    (probe-measured exp 1.18 before this landed). Within-cell kNN is
    the standard approximation for graph clustering: true neighbors
    co-locate by assignment, cross-cell edges are the recall the
    probe/expand levers of the retrieval tiers buy back.

    Output: (query_id, match_id, cosine, rank) — both directions, so
    the frame feeds ``mutual_neighbors`` directly.
    """
    c = df.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, _resolve_n_cells(n_cells, df))
    # r9: two-level assignment (self-gating) — same wall-removal as
    # semantic_dedup_cells; the per-cell kernel is unchanged
    return cell_capped_topk(two_level_assign(c, cent), k, cell_cap)


_KM_OFFSET = 10_000  # > any |scaled component|: makes the mean's
# dividend non-negative so Spark DIV (truncate) == DuckDB // (floor)


def _assign_with_dist(c: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment KEEPING the squared distance:
    (__id, cell, sq). Same exact-integer L2 + (sq, cell) tie rule as
    ``assign_to_cells``."""
    dot_c = F.aggregate(
        F.zip_with("e", "cent_e", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return (
        c.crossJoin(F.broadcast(cent))
        .select(
            "__id",
            "cell",
            (F.col("n") + F.col("cent_n") - 2 * dot_c).alias("__sq"),
        )
        .groupBy("__id")
        .agg(F.min_by(F.struct("__sq", "cell"), F.struct("__sq", "cell")).alias("__a"))
        .select("__id", F.col("__a.cell").alias("cell"), F.col("__a.__sq").alias("sq"))
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 2,
) -> DataFrame:
    """Fixed-iteration Lloyd k-means, BIT-DETERMINISTIC across engines
    and partitionings — the iterative-ML showcase: seeds are the
    md5-medoid draw (actual corpus vectors, engine-portable), each
    iteration assigns by exact integer squared L2 (ties → cell id) and
    recomputes centroids as per-dim INTEGER floor means. The floor-div
    trick: Spark ``DIV`` truncates toward zero while DuckDB ``//``
    floors, so the mean is computed as
    ``(Σe_d + OFFSET·n) DIV n − OFFSET`` with OFFSET > any |component|
    — the dividend is then non-negative, where truncation ≡ floor.
    No float appears anywhere, so the trajectory (not just the final
    answer) is identical on both engines at ANY partitioning.

    Shape per iteration: one broadcast-centroids assignment pass
    (map-side-combinable min_by), one posexplode → (cell, dim) hash
    agg for the sums (shuffle carries k·d rows after partial agg), one
    k-row centroid rebuild. Cells that lose all members drop out
    (standard Lloyd degeneracy; deterministic on both engines).

    Output: (cell, n_members, inertia) — inertia is the exact bigint
    Σ min squared distance in scaled² units.
    """
    final = kmeans_assignments(df, vec_col, id_col, k, n_iters)
    return final.groupBy("cell").agg(
        F.count("*").alias("n_members"),
        F.sum("sq").alias("inertia"),
    )


def kmeans_assignments(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 2,
) -> DataFrame:
    """Per-point final Lloyd assignment — the labels frame
    ``kmeans_lloyd``'s summary and downstream cluster-aware samplers
    share. Same bit-deterministic trajectory as ``kmeans_lloyd`` (see
    its docstring for the integer floor-mean + tie rules).

    Output: (id, cell, sq) — one row per input vector."""
    c = df.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, k)
    for _ in range(int(n_iters)):
        assigned = assign_to_cells(c, cent)
        sums = (
            assigned.select("cell", F.posexplode("e").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.sum("v").alias("s"), F.count("*").alias("nm"))
        )
        cd = F.expr(f"(s + {_KM_OFFSET} * nm) DIV nm - {_KM_OFFSET}")
        cent = (
            sums.select("cell", "dim", cd.cast("bigint").alias("cd"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cd"))),
                    lambda x: x["cd"],
                ).alias("cent_e")
            )
            .withColumn("cent_n", sqnorm_expr(F.col("cent_e")))
        )
    return _assign_with_dist(c, cent).select(
        F.col("__id").alias(id_col), "cell", "sq"
    )


def cluster_balanced_sample(
    df: DataFrame,
    per_cell: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iters: int = 2,
) -> DataFrame:
    """Cluster-balanced data selection: Lloyd-assign every vector to a
    cell, keep a deterministic md5-ranked sample of ``per_cell`` per
    cell. This is the diversity-preserving counterweight to
    density-proportional sampling — rare modes keep representation
    even when one cluster holds 90% of the corpus (the motivation
    behind cluster-balanced mixes in web-corpus curation; cf. the
    temperature_mix entry for the source-level analogue).

    The rank window partitions by CELL (k groups, each capped at
    per_cell output rows) ordered by (md5(id), id) — unbiased w.r.t.
    id assignment order, reproducible across engines. Output:
    (cell, id, rank ≤ per_cell)."""
    from pyspark.sql import Window as W

    labels = kmeans_assignments(df, vec_col, id_col, k, n_iters)
    w = W.partitionBy("cell").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        labels.select("cell", id_col, F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= int(per_cell))
        .select("cell", id_col, F.col("rank").cast("bigint").alias("rank"))
    )


def kcenter_coreset(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> DataFrame:
    """Greedy k-Center coreset selection (Sener & Savarese, ICLR'18
    "Active Learning for CNNs: A Core-Set Approach") — the diversity-
    maximizing data-selection primitive: repeatedly pick the point
    FARTHEST from the already-chosen set (2-approximation of the
    optimal k-center cover). The selected rows are the "spanning"
    examples a curation pipeline keeps when it wants coverage rather
    than density (the complement of dedup).

    Determinism: seed = smallest md5(id) (the medoid-draw rule);
    distances are exact integer squared L2 on scaled vectors; argmax
    ties break to the smaller id — the full selection SEQUENCE is
    bit-identical across engines and partitionings, which is what lets
    one unrolled SQL statement replay it.

    Shape: k − 1 corpus scans, each a TakeOrderedAndProject against at
    most k broadcast-literal centers (no joins, no windows). The
    driver holds exactly the k chosen vectors between iterations —
    metadata-scale, like ``storage.delete_rows``'s partition values,
    never row data.

    r10 optimization round: the min-distance is maintained
    INCREMENTALLY (classic Gonzalez) — each round carries
    (id, e, __md) forward and folds in ONLY the newest center via
    ``least(__md, dist(new))``, instead of re-evaluating the distance
    to every chosen center. Each round's frame is localCheckpoint'd,
    so the per-round plan is a constant-size (LogicalRDD → one
    distance expression → TakeOrdered) — the previous form's round-i
    plan held i nested HOF lambdas and the driver spent ~5 of the
    entry's 6 s ANALYZING plans, not running them (profiled: all
    stages ≤ 0.11 s). min over a set == fold of ``least``, ties and
    integer math unchanged, so the selection SEQUENCE is bit-identical.

    Output: (round, center_id, radius_sq) — radius_sq is the chosen
    point's exact min squared distance to the prior centers (the
    covering radius achieved when it was picked; NULL for the seed).
    """
    from pyspark import StorageLevel

    # persisted: every one of the k rounds re-reads the SAME scaled
    # frame, so the parquet scan + scaling runs once, not k times
    # (caller-owned cache, same contract as minhash_estimate_pairs)
    c = df.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out_schema = "round bigint, center_id bigint, radius_sq bigint"
    seed_rows = (
        c.withColumn("__hm", F.md5(F.col("__id").cast("string")))
        .orderBy("__hm", "__id")
        .limit(1)
        .collect()
    )
    if not seed_rows:  # pruned-everything input: empty selection
        return df.sparkSession.createDataFrame([], out_schema)
    seed = seed_rows[0]
    chosen = [(int(seed["__id"]), [int(x) for x in seed["e"]], None)]

    def sqdist_to(vec: list) -> "F.Column":
        lit = F.array(*[F.lit(int(x)).cast("bigint") for x in vec])
        return F.aggregate(
            F.zip_with("e", lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    # running (id, e, min-dist-to-chosen) relation; chosen rows are
    # dropped as they are picked, so the TakeOrdered needs no isin
    cur = c.filter(F.col("__id") != int(seed["__id"])).select(
        "__id", "e", sqdist_to(chosen[0][1]).alias("__md")
    ).localCheckpoint(eager=False)
    for _ in range(int(k) - 1):
        nxt_rows = (
            cur.orderBy(F.col("__md").desc(), F.col("__id"))
            .limit(1)
            .collect()
        )
        if not nxt_rows:  # k >= N: every point already chosen
            break
        nxt = nxt_rows[0]
        nxt_id, nxt_e = int(nxt["__id"]), [int(x) for x in nxt["e"]]
        chosen.append((nxt_id, nxt_e, int(nxt["__md"])))
        if len(chosen) < int(k):
            cur = cur.filter(F.col("__id") != nxt_id).select(
                "__id",
                "e",
                F.least(F.col("__md"), sqdist_to(nxt_e)).alias("__md"),
            ).localCheckpoint(eager=False)

    spark = df.sparkSession
    rows = [
        (i, cid, rad) for i, (cid, _, rad) in enumerate(chosen)
    ]
    return spark.createDataFrame(rows, out_schema)


def pca_top_direction(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 3,
) -> DataFrame:
    """Top principal direction by BIT-DETERMINISTIC integer power
    iteration — the second iterative-linear-algebra showcase next to
    ``kmeans_lloyd``, and the PCA seed a whitening/Matryoshka pipeline
    wants (which embedding dims carry the variance).

    Architecture = MLlib's own PCA split (RowMatrix.computeGramianMatrix
    → driver-side eigensolve): the DATA-SIZED work — one scan building
    the d×d scatter matrix — is distributed, and the d²-cell matrix
    (4096 cells at d=64; metadata-scale, the kcenter_coreset precedent
    for driver-held state) iterates on the driver in exact Python
    integers. A first cut iterated via chained DataFrame joins instead:
    flat in N but ~8s of pure broadcast-exchange scheduling overhead
    per call — the distributed tier is the wrong place for a 64-row
    recurrence.

    Exactness: vectors scale to integers (``scaled_vec``), center by
    the per-dim integer floor-mean (positive-dividend DIV idiom);
    scatter terms explode IN-ROW (d² structs per vector, no join) into
    ONE map-side-combined hash agg accumulating in decimal(38,0)
    (int64 would overflow past ~3e7 vectors); G is normalized once to
    max |cell| = 1000 (a scalar multiple — eigenvectors unchanged) and
    each round rescales the iterate back to ±1000 — Python ``//`` on
    the positive dividend ≡ DuckDB HUGEINT ``//`` ≡ the construction's
    floor, so the whole trajectory is engine-portable. Output carries
    the Rayleigh quotient λn = vᵀGn·v / vᵀv in normalized-G units.

    Output: (dim, component ∈ [−1000, 1000], rayleigh)."""
    out_schema = "dim bigint, component bigint, rayleigh double"
    _, _, x, ray = _gramian_and_direction(df, vec_col, id_col, n_iters)
    if x is None:
        return df.sparkSession.createDataFrame([], out_schema)
    return df.sparkSession.createDataFrame(
        [(i, x[i], ray) for i in range(len(x))], out_schema
    )


def _gramian_and_direction(
    df: DataFrame, vec_col: str, id_col: str, n_iters: int
):
    """Shared mean/Gramian/power-iteration pipeline behind
    ``pca_top_direction`` and ``pca_project`` — ONE implementation of
    the bit-exactness-critical path (ADVICE r7: two drifting copies).
    Returns ``(cw, means, x, rayleigh)`` where ``cw`` is the
    (id, scaled-int vector) frame the caller can reuse; ``means``/``x``
    are None when the input is empty."""
    from ..operators.dedup import scaled_vec

    OFF = _PCA_OFF
    D38 = "decimal(38,0)"
    cw = df.select(F.col(id_col).alias(id_col), scaled_vec(vec_col).alias("e"))
    dims = cw.select(F.posexplode("e").alias("i", "v"))
    mean = dims.groupBy("i").agg(
        F.expr(f"(sum(v) + {OFF} * count(*)) div count(*) - {OFF}").alias("m")
    )
    mean_rows = mean.collect()  # d rows — metadata-scale, like the means
    if not mean_rows:
        return cw, None, None, None
    d_in = max(r["i"] for r in mean_rows) + 1
    means = [0] * d_in
    for r in mean_rows:
        means[r["i"]] = int(r["m"])

    # scatter terms via Arrow-batched numpy Gramians: each batch emits
    # one exact int64 d×d partial (|C| ≤ 2000 ⇒ a 10k-row batch cell
    # stays ≤ 4e10), summed across batches in decimal(38,0) — exact at
    # ANY corpus size. (An in-row HOF explode of the d² struct terms is
    # interpreted, measured ~5s at sf0.1; the einsum partial is the
    # production Arrow path and emits 4096 rows per BATCH, not per
    # vector.)
    import numpy as np
    import pandas as pd

    def gram_kernel(batches):
        m_np = np.array(means, dtype=np.int64)
        ij = np.indices((d_in, d_in)).reshape(2, -1)
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.stack([np.asarray(e, dtype=np.int64) for e in pdf["c_e"]])
            C = M - m_np
            P = C.T @ C
            yield pd.DataFrame(
                {"i": ij[0], "j": ij[1], "p": P.reshape(-1)}
            )

    g_rows = (
        cw.select(F.col("e").alias("c_e"))
        .mapInPandas(gram_kernel, schema="i bigint, j bigint, p bigint")
        .groupBy("i", "j")
        .agg(F.sum(F.col("p").cast(D38)).alias("g"))
        .collect()
    )
    if not g_rows:
        return cw, means, None, None
    x, ray = _pca_iterate(g_rows, OFF, int(n_iters))
    return cw, means, x, ray


_PCA_OFF = 10_000  # > any |scaled component| (positive-dividend DIV idiom)


def _pca_iterate(g_rows, OFF: int, n_iters: int):
    """Exact-Python-integer power iteration on the collected d² scatter
    cells (see pca_top_direction for why this runs on the driver)."""
    d = max(r["i"] for r in g_rows) + 1
    G = [[0] * d for _ in range(d)]
    for r in g_rows:
        G[r["i"]][r["j"]] = int(r["g"])
    mxg = max(max(abs(x) for x in row) for row in G) or 1
    Gn = [
        [(g * 1000 + 2 * OFF * mxg) // mxg - 2 * OFF for g in row] for row in G
    ]
    x = [1000] * d
    for _ in range(n_iters):
        w = [sum(Gn[i][j] * x[j] for j in range(d)) for i in range(d)]
        mx = max(max(abs(v) for v in w), 1)
        x = [(wi * 1000 + 2 * OFF * mx) // mx - 2 * OFF for wi in w]
    num = sum(Gn[i][j] * x[j] * x[i] for i in range(d) for j in range(d))
    den = sum(v * v for v in x)
    return x, float(num) / float(den)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 3,
) -> DataFrame:
    """Per-vector score along the top principal direction — the
    downstream half of ``pca_top_direction`` (dimensionality-reduced
    ordering/bucketing for selection and drift monitoring): solve the
    direction once (distributed Gramian + driver eigensolve), then ONE
    map-only pass computes each CENTERED vector's exact integer dot
    product with the broadcast-literal direction — proj = Σ (e_d − m_d)
    · x_d, |proj| ≤ d·2000·1000, no float anywhere.

    Output: (id, proj) in scaled·component integer units."""
    cw, means, x, _ = _gramian_and_direction(df, vec_col, id_col, n_iters)
    spark = df.sparkSession
    if x is None:
        return spark.createDataFrame([], f"{id_col} bigint, proj bigint")
    m_lit = F.array(*[F.lit(m).cast("bigint") for m in means])
    x_lit = F.array(*[F.lit(v).cast("bigint") for v in x])
    # exact integer dot of the centered vector with the direction
    proj = F.aggregate(
        F.zip_with(
            F.expr("zip_with(e, __m, (a, b) -> a - b)"),
            F.col("__x"),
            lambda c, xv: c * xv,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    return (
        cw.withColumn("__m", m_lit)
        .withColumn("__x", x_lit)
        .select(F.col(id_col), proj.alias("proj"))
    )


def ann_recall_eval(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of the binary-Hamming ANN tier against exact
    brute-force cosine, as a first-class operator — the eval a
    retrieval pipeline must run CONTINUOUSLY (recall silently decays
    as the corpus distribution drifts away from the quantizer), not
    once at deployment. Both tiers are the engine's own deterministic
    ops (exact integer cosine / exact integer Hamming with id
    tiebreaks), so the per-query overlap is reproducible bit-for-bit
    and oracle-checkable — turning recall itself into a driver-gated
    number rather than a notebook claim.

    Cost = the two tiers it compares (brute is the ground truth and
    dominates; run on a query SAMPLE at scale — the eval needs
    statistical, not exhaustive, coverage).

    Output: (query_id, n_overlap, recall = n_overlap/k)."""
    truth = cosine_topk(queries, corpus, k=k, vec_col=vec_col, id_col=id_col)
    approx = binary_hamming_topk(
        queries, corpus, k=k, vec_col=vec_col, id_col=id_col
    )
    return recall_vs_truth(truth, approx, k)


def recall_vs_truth(truth: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Per-query overlap of an approximate top-k against the exact
    top-k — the shared tail of every recall eval (binary, IVF, …).
    Output: (query_id, n_overlap, recall = n_overlap/k)."""
    hits = truth.select("query_id", "match_id").join(
        approx.select("query_id", "match_id"), ["query_id", "match_id"]
    )
    per_q = truth.select("query_id").distinct()
    agg = hits.groupBy("query_id").agg(F.count("*").alias("n_overlap"))
    return (
        per_q.join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
    )
