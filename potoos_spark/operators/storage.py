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
