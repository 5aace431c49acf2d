"""SparkSession construction tuned for this engine.

Local-mode testing defaults; on a real cluster the same code runs with the
cluster's own master/resource config — only the session-level SQL knobs
below matter there (AQE on, sane shuffle partitioning, UTC, Arrow).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app_name: str = "potoos_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r10 optimization round (guide §9 baseline / §3.1): let the
        # planner pick a shuffled HASH join when its size conditions
        # fit instead of always sort-merge, and let AQE rewrite
        # SMJ -> SHJ at runtime when every post-shuffle partition is
        # small (the conversion is off until the threshold is set).
        # Skips the sort of both sides on mid-sized joins; 64m per
        # partition is a conservative build-side bound on any sane
        # executor (guide sizes partitions at 100 MB - 1 GB). Measured
        # (interleaved A/B, min-of-3): q_triangle_count 8.1 -> 5.2 s,
        # small wins on correlated-avg/dsir, no losses beyond noise.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def normalize_session(spark: SparkSession) -> SparkSession:
    """Apply the session-level invariants this engine assumes to an
    externally-provided session (e.g. the verification driver's):
    UTC timestamp semantics and AQE. Safe to call repeatedly."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
