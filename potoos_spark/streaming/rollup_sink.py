"""Continuous rollup maintenance: keep the multi-resolution rollup
ladder (operators/rollup.py) up to date from an unbounded stream.

Log-structured design: each micro-batch computes its OWN algebraic
partials per (series, bucket) and appends them to a per-resolution
parquet log. Because partials are associative, a bucket touched by many
batches simply has many log rows — reads combine them on the fly
(``read_rollup_log`` → ``combine_partials``), so the sink never
rewrites files (no read-modify-write race, safe for exactly-once
foreachBatch retries at the cost of re-appended batch partials being
idempotent only per epoch — pair with checkpointing). A periodic
compaction (``compact_rollup_log``) folds the log back to one row per
bucket; queries are correct with or without it.

This is the streaming half of the "hypertable rollup" tier: ingest
maintains partial logs at write time; dashboards read finalized
aggregates at any multiple resolution without scanning raw points.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.rollup import combine_partials, finalize, rollup_partials


def rollup_log_sink(
    sdf: DataFrame,
    path_prefix: str,
    resolutions_ms: Dict[str, int],
    checkpoint_dir: str,
    **trigger_kwargs,
) -> StreamingQuery:
    """Start the maintenance query: per micro-batch, append batch-local
    partials for every resolution to ``{path_prefix}/{label}``."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        for label, res in resolutions_ms.items():
            rollup_partials(batch_df, res).write.mode("append").parquet(
                f"{path_prefix}/{label}"
            )

    writer = (
        sdf.writeStream.foreachBatch(handle)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    return writer.start()


def read_rollup_log(
    spark: SparkSession,
    path_prefix: str,
    label: str,
    bucket_ms: int,
    agg_type: str = "avg",
) -> DataFrame:
    """Serve a bucketed aggregation from a partials log: combine the
    (possibly many) log rows per bucket up to ``bucket_ms``, finalize.
    ``bucket_ms`` must be a multiple of the log's resolution."""
    partials = spark.read.parquet(f"{path_prefix}/{label}")
    return finalize(combine_partials(partials, bucket_ms), agg_type)


def compact_rollup_log(
    spark: SparkSession, path_prefix: str, label: str, resolution_ms: int
) -> None:
    """Fold the log to one row per (series, bucket). Optional — reads
    are correct without it; run it when the log's row count grows far
    past the bucket count. Stage-and-swap through the Hadoop
    FileSystem API (works on local FS / HDFS / object stores with a
    Hadoop connector); single-writer operation."""
    path = f"{path_prefix}/{label}"
    staging = f"{path}__compacting"
    combine_partials(spark.read.parquet(path), resolution_ms).write.mode(
        "overwrite"
    ).parquet(staging)

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    hstaging = jvm.org.apache.hadoop.fs.Path(staging)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)
    fs.rename(hstaging, hpath)
