"""Physical storage layout for the 100 TB series store (SURVEY.md §7
Phase 5; SCALE.md prescription made executable).

Layout: **partition by date** (time-range queries become partition
pruning — whole days never touched), **bucket by series_key** (joins
and groupBys on the series key are shuffle-free: Spark's bucketed scan
satisfies the hash-partitioning requirement at read time), **sort files
by ts_ms** (parquet row-group min/max skipping within a day +
sort-free per-series window functions).

Bucketed tables go through ``saveAsTable`` (bucket metadata lives in
the catalog); the bucket count is a cluster-sizing decision — at 100 TB
pick buckets ≈ 2-4× executor count so each bucket file stays in the
hundreds of MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_series_store(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a canonical series frame as the partitioned/bucketed/sorted
    store. Adds a ``date`` partition column derived from ts_ms."""
    out = df.withColumn("date", F.to_date(F.timestamp_millis(F.col("ts_ms"))))
    writer = (
        out.write.mode(mode)
        .partitionBy("date")
        .bucketBy(n_buckets, "series_key")
        .sortBy("ts_ms")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_series_store(
    spark: SparkSession,
    table_name: str,
    from_ms: int | None = None,
    to_ms: int | None = None,
) -> DataFrame:
    """Read the store back as a canonical frame; time bounds are applied
    to BOTH the date partition column (partition pruning) and ts_ms
    (row-group skipping within the boundary days)."""
    df = spark.table(table_name)
    if from_ms is not None:
        df = df.filter(
            (F.col("date") >= F.to_date(F.timestamp_millis(F.lit(from_ms))))
            & (F.col("ts_ms") >= from_ms)
        )
    if to_ms is not None:
        df = df.filter(
            (F.col("date") <= F.to_date(F.timestamp_millis(F.lit(to_ms))))
            & (F.col("ts_ms") <= to_ms)
        )
    return df.drop("date")


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    max_records_per_file: int = 1_000_000,
    target_files: int | None = None,
) -> int:
    """Small-files compaction pass — the maintenance job the scale probe's
    file-layout lesson calls for (SCALE.md: scan parallelism follows file
    layout, so a directory of thousands of tiny micro-batch outputs
    throttles every later scan, while one giant file serializes it).

    Rewrites ``src`` into ``dst`` range-partitioned on (series_key,
    ts_ms) — each output file covers a contiguous key/time slice, so
    per-series sort order survives within files (window functions read
    them sort-free) and parquet min/max row-group skipping stays sharp —
    with ``maxRecordsPerFile`` bounding file size from above and
    ``target_files`` (default: cluster default parallelism) bounding
    the file count from below.

    Returns the number of rows written (compaction must be a row-exact
    rewrite; callers assert equality with the source count).
    """
    df = spark.read.parquet(src)
    n = target_files or spark.sparkContext.defaultParallelism
    out = df.repartitionByRange(
        n, F.col("series_key"), F.col("ts_ms")
    ).sortWithinPartitions("series_key", "ts_ms")
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", int(max_records_per_file))
        .parquet(dst)
    )
    return spark.read.parquet(dst).count()


def zorder_key(col_a, col_b, bits: int = 14):
    """Z-order (Morton) interleave of two bounded integer columns — the
    multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE
    ZORDER: sorting or range-partitioning by the interleaved key gives
    EVERY participating column locality, so per-file min/max stats
    prune scans filtered on either column (a single-column sort only
    prunes its own column). Inputs must already lie in [0, 2^bits);
    callers clamp with pmod or rank-bucket first. Pure compile-time
    unrolled bit arithmetic (shift/and/or) — whole-stage codegen, zero
    shuffle, engine-portable bit-for-bit.

    Returns a bigint column: bit i of ``col_a`` lands at position 2i,
    bit i of ``col_b`` at 2i+1.
    """
    from pyspark.sql import functions as F

    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("bigint")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(int(bits)):
        z = z + F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def zorder_compact(
    spark: SparkSession,
    src: str,
    dst: str,
    col_a: str,
    col_b: str,
    bits: int = 14,
    target_files: int | None = None,
    max_records_per_file: int = 1_000_000,
) -> int:
    """Z-order clustering compaction — the storage-side CONSUMER of
    ``zorder_key`` (the ``q_zorder_clustering`` catalog entry proves
    the key; this writes the files): rewrite ``src`` so every output
    file covers a narrow range of BOTH ``col_a`` and ``col_b``, giving
    parquet footer min/max stats pruning power on EITHER column — the
    job Delta/Iceberg run as OPTIMIZE ZORDER. A single-column sort
    prunes only its own column; the second dimension stays at ~full
    range per file (measured in tests/test_storage.py).

    Shape: one tiny min/max agg per dimension (broadcast back as a
    1-row cross join), linear scaling of each dim into [0, 2^bits),
    the codegen'd Morton interleave, then range-repartition + in-file
    sort on the z key — the same range-exchange discipline as
    ``compact_parquet``, so file sizes stay balanced at any scale and
    no stage ever sees a single-task sort. The z key is dropped before
    writing; the rewrite is row-exact (callers assert the returned
    count equals the source's).
    """
    df = spark.read.parquet(src)
    span = F.lit((1 << int(bits)) - 1).cast("double")
    bounds = df.agg(
        F.min(F.col(col_a).cast("double")).alias("__amin"),
        F.max(F.col(col_a).cast("double")).alias("__amax"),
        F.min(F.col(col_b).cast("double")).alias("__bmin"),
        F.max(F.col(col_b).cast("double")).alias("__bmax"),
    )

    def scaled(col, lo, hi):
        width = F.greatest(F.col(hi) - F.col(lo), F.lit(1.0))
        x = (F.col(col).cast("double") - F.col(lo)) / width * span
        return F.least(span, F.greatest(F.lit(0.0), x)).cast("bigint")

    keyed = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__za", scaled(col_a, "__amin", "__amax"))
        .withColumn("__zb", scaled(col_b, "__bmin", "__bmax"))
        .withColumn("__z", zorder_key("__za", "__zb", bits=bits))
    )
    n = target_files or spark.sparkContext.defaultParallelism
    out = (
        keyed.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__za", "__zb", "__z", "__amin", "__amax", "__bmin", "__bmax")
    )
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", int(max_records_per_file))
        .parquet(dst)
    )
    return spark.read.parquet(dst).count()


def write_ivf_index(
    spark: SparkSession,
    corpus: DataFrame,
    dst: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int | None = None,
) -> int:
    """Materialize an IVF index as a CELL-PARTITIONED parquet layout —
    the serving-side consumer of the md5-medoid quantizer
    (``ivf_topk_md5`` proves the search; this writes the files a
    long-lived index would pin): every corpus vector is stored under
    its cell's partition directory together with its integer-scaled
    form and squared norm, and the KB-scale centroid table is written
    beside it. A probe then touches ONLY the probed cells' files —
    partition pruning does at the storage layer what the cell
    semi-join does in memory.

    Returns the indexed vector count (callers assert row-exactness).
    """
    from .dedup import scaled_vec, sqnorm_expr
    from .similarity import (
        _resolve_n_cells,
        assign_to_cells,
        md5_medoid_centroids,
    )

    c = corpus.select(
        F.col(id_col).alias("__id"), scaled_vec(vec_col).alias("e")
    ).withColumn("n", sqnorm_expr(F.col("e")))
    cent = md5_medoid_centroids(c, _resolve_n_cells(n_cells, corpus))
    assigned = assign_to_cells(c, cent).select(
        F.col("__id").alias(id_col), "e", "n", "cell"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{dst}/index")
    cent.write.mode("overwrite").parquet(f"{dst}/centroids")
    return spark.read.parquet(f"{dst}/index").count()


def probe_ivf_index(
    spark: SparkSession,
    src: str,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Search a ``write_ivf_index`` layout: assign each query to its
    ``n_probe`` nearest stored centroids, then join the index ON THE
    PARTITION COLUMN — Spark's dynamic partition pruning turns the
    probed-cells relation into a runtime filter on the parquet scan,
    so only n_probe/n_cells of the index files are read (asserted in
    tests/test_storage.py via the dynamicpruning subquery in the
    plan). Scoring is the same exact integer cosine as the in-memory
    IVF; given the same corpus, the result is bit-identical to
    ``ivf_topk_md5`` (equivalence pinned in tests).

    Output: (query_id, match_id, cosine, rank).
    """
    from pyspark.sql import Window as W

    from .dedup import cosine_from_norms, scaled_vec, sqnorm_expr

    cent = spark.read.parquet(f"{src}/centroids")
    index = spark.read.parquet(f"{src}/index")
    q = queries.select(
        F.col(id_col).alias("query_id"), scaled_vec(vec_col).alias("qe")
    ).withColumn("qn", sqnorm_expr(F.col("qe")))
    dot_c = F.aggregate(
        F.zip_with("qe", "cent_e", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    wq = W.partitionBy("query_id").orderBy("__sq", "cell")
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qe", "qn", "cell",
            (F.col("qn") + F.col("cent_n") - 2 * dot_c).alias("__sq"),
        )
        .withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= int(n_probe))
        .select("query_id", "qe", "qn", "cell")
    )
    cand = F.broadcast(probed).join(index, "cell").filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("match_id"),
        cosine_from_norms(F.col("qe"), F.col("e"), F.col("qn"), F.col("n")).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "match_id", "cosine", "rank")
    )


def delete_rows(
    df_path: str,
    spark: SparkSession,
    tombstones: DataFrame,
    key_cols: list[str],
    partition_col: str = "date",
) -> None:
    """Targeted delete propagation (the GDPR / right-to-be-forgotten
    rewrite): remove every row matching a tombstone key from a
    ``partition_col``-partitioned parquet store while rewriting ONLY
    the partitions that contain matches — at 100 TB a delete of one
    user's rows must not touch the other 36,499 day-partitions.

    Mechanism: the keep-set is (affected partitions, semi-join) minus
    (tombstoned rows, anti-join), written with Spark's DYNAMIC
    partition-overwrite mode — only partitions present in the written
    data are replaced; untouched partitions' files are not rewritten
    (byte-identical, pinned by mtime in tests). No row ever reaches
    the driver: affected partitions are discovered by a semi-join, not
    a collect.

    Fully-deleted partitions (r7, closing the r6 caveat): a partition
    whose rows are ALL tombstoned produces no output rows, so dynamic
    overwrite has nothing to replace there and its stale files would
    keep the "deleted" rows alive — a silent correctness hole, not
    just a space leak. Those partitions are discovered BEFORE the
    overwrite (one left-anti join; the collect is METADATA-scale — one
    value per fully-deleted partition, never row data) and their
    directories are dropped through the Hadoop FileSystem API after
    the overwrite commits. Partition values are formatted with
    ``str()`` — matches Spark's directory naming for the date/int/
    plain-string partition columns this store uses (table formats with
    delete metadata — Delta/Iceberg — replace this dance with
    tombstone files).
    """
    df = spark.read.parquet(df_path)
    t = F.broadcast(tombstones.select(*key_cols).distinct())
    affected = (
        df.join(t, key_cols, "semi").select(partition_col).distinct()
    )
    keep = (
        df.join(affected, partition_col, "semi")
        .join(t, key_cols, "left_anti")
    )
    emptied = [
        r[0]
        for r in affected.join(
            keep.select(partition_col).distinct(), partition_col, "left_anti"
        ).collect()
    ]
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            keep.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(df_path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if emptied:
        jconf = spark._jsc.hadoopConfiguration()
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        for v in emptied:
            p = jpath(f"{df_path}/{partition_col}={v}")
            fs = p.getFileSystem(jconf)
            if fs.exists(p):
                fs.delete(p, True)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "date",
    max_records_per_file: int = 1_000_000,
    max_files_per_partition: int = 1,
) -> dict:
    """Partition-grain maintenance pass for a ``partition_col``-
    partitioned parquet store (VERDICT r6 item 6) — the job a table
    format's OPTIMIZE runs nightly:

    1. **Merge fragmented partitions**: every partition holding more
       than ``max_files_per_partition`` data files is rewritten (one
       dynamic partition overwrite covering ONLY those partitions —
       healthy partitions' files are untouched, byte-identical). The
       rewrite hash-clusters on the partition value so each rewritten
       partition lands in ~1 file, bounded above by
       ``maxRecordsPerFile``.
    2. **Drop dead partition directories**: a directory whose files
       hold ZERO live rows (debris from an aborted writer, an
       empty-output micro-batch, or a pre-r7 full-partition delete) is
       removed through the Hadoop FileSystem API.

    Driver traffic is metadata-scale only: one row per partition
    (file count), never row data — at 100 TB that is one value per
    day-partition, ~36 K rows for a century.

    Returns ``{"rewritten": [...], "dropped": [...]}`` (partition
    values as strings, sorted).
    """
    df = spark.read.parquet(path)
    stats = (
        df.select(F.col(partition_col), F.col("_metadata.file_path").alias("__f"))
        .groupBy(partition_col)
        .agg(F.count_distinct("__f").alias("n_files"))
        .collect()
    )
    frag = [r[0] for r in stats if r["n_files"] > int(max_files_per_partition)]
    live = {str(r[0]) for r in stats}

    if frag:
        sel = df.filter(F.col(partition_col).isin(frag))
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                sel.repartition(max(len(frag), 1), F.col(partition_col))
                .write.mode("overwrite")
                .option("maxRecordsPerFile", int(max_records_per_file))
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    dropped = []
    jconf = spark._jsc.hadoopConfiguration()
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(path)
    fs = root.getFileSystem(jconf)
    prefix = f"{partition_col}="
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if (
            status.isDirectory()
            and name.startswith(prefix)
            and name[len(prefix):] not in live
        ):
            fs.delete(status.getPath(), True)
            dropped.append(name[len(prefix):])
    return {
        "rewritten": sorted(str(v) for v in frag),
        "dropped": sorted(dropped),
    }
