"""Shared plumbing for the oracle-checked query catalog.

Every catalog entry is a ``QuerySpec``: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB SQL the driver runs side-by-side. The driver
hash-compares values, so every query here is engineered for
**bit-exact cross-engine equality**:

* sums/averages/variances accumulate in DECIMAL (exact, order-free),
  then derive doubles with the identical formula in both engines;
* sequential scores (EMA) use the same float64 recurrence on both
  sides (numpy loop ↔ recursive CTE);
* outputs are only string / bigint / double — no decimals, no arrays,
  no raw timestamps (epoch-ms bigints or formatted date strings avoid
  engine timezone semantics entirely).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None → driver does rows-only check


def _normalize(spark: SparkSession) -> SparkSession:
    # The driver supplies its own session; pin the semantics we assume.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def is_single_file(spark: SparkSession, path: str) -> bool:
    """Layout probe for streaming file sources, via the Hadoop
    FileSystem API so ANY scheme answers correctly (local path, HDFS,
    s3a:// — ADVICE r4: a driver-local ``os.path.isfile`` reports False
    for every object-store URI, silently sending single-file tables
    down the directory branch the file stream source rejects). Missing
    paths report False — the caller's directory branch raises the real
    error with Spark's own message."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    try:
        return bool(fs.getFileStatus(hpath).isFile())
    except Exception:
        return False


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _normalize(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread_input(df: DataFrame, key: str | None = None) -> DataFrame:
    """Scale-adaptive scan-parallelism repair (optimization guide §2.5:
    "one huge unsplittable file … repartition immediately after the
    read"). The test fixtures are single-file, single-ROW-GROUP parquet
    tables — an indivisible split — so every scan otherwise runs as ONE
    task and serializes the per-row expression work (tokenize, md5,
    shingle, decode) that dominates the text/dedup/similarity tiers.

    Guarded to be a NO-OP whenever the scan already yields at least
    half the default parallelism (any real multi-file table, so the
    exchange never appears in at-scale plans — this is not a local-mode
    constant, it adapts to whatever the scan provides). When it fires,
    it hash-partitions on ``key`` (deterministic, avoids round-robin's
    sort-before-repartition, and doc-keyed shuffles downstream can
    reuse the exchange) or round-robins when no key is natural.
    Results are partition-invariant by catalog contract (pinned by
    tests), so this changes plans, never values."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, n // 2):
        return df
    return df.repartition(n, F.col(key)) if key else df.repartition(n)


def events_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical many-series frame from ``events``; ns → ms flooring on
    both engines (DuckDB's epoch_ms truncates the same way). Carries
    the raw storage column so time filters push down to the parquet scan
    (retrieval.RAW_TS_COL rule); handles both parquet-nanos reader
    shapes (int64 ns / TIMESTAMP_NTZ — see retrieval.events_ts_parts)."""
    from ..operators.retrieval import events_ts_parts, series_frame

    ev = table(spark, sf_dir, "events")
    ts_expr, units = events_ts_parts(ev)
    return series_frame(
        ev,
        "event_type",
        ts_expr,
        "value",
        seq="event_id",
        raw_ts="ts",
        raw_units_per_ms=units,
    )


# DuckDB mirror of events_frame (driver pre-registers the `events` view).
EVENTS_SQL = (
    "SELECT event_type AS series_key, epoch_ms(ts) AS ts_ms, value, "
    "event_id AS seq FROM events"
)

# Exact money-ish decimal: the synthetic data carries 2 fractional digits.
DEC = "decimal(18,2)"


def dec(col):  # Spark-side decimal cast for exact accumulation
    return (F.col(col) if isinstance(col, str) else col).cast(DEC)


HOUR_MS = 3_600_000


def hourly_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact hourly-average series — the canonical detector input.
    Decimal accumulation → identical doubles on both engines."""
    df = events_frame(spark, sf_dir)
    bucket = F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(HOUR_MS))
    return (
        df.groupBy("series_key", bucket.alias("ts_ms"))
        .agg((F.sum(dec("value")).cast("double") / F.count("value")).alias("value"))
    )


# DuckDB mirror of hourly_avg_frame; compose as f"WITH series AS (...), g AS ({G_SQL}) ..."
G_SQL = (
    f"SELECT series_key, ts_ms - ts_ms % {HOUR_MS} AS ts_ms, "
    f"CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) / COUNT(value) AS value "
    f"FROM series GROUP BY series_key, ts_ms - ts_ms % {HOUR_MS}"
)


def flit(x: float) -> str:
    """A float64 constant as DuckDB SQL that parses to EXACTLY the same
    bits as the Python double: ``CAST('<repr>' AS DOUBLE)``. A bare
    numeric literal is NOT safe — DuckDB parses it through DECIMAL and
    converts decimal→double with two roundings, which lands one ulp off
    for some values (measured: repr(2/13) and repr(1 − 2/27) diverge;
    the string→double cast is correctly rounded). Use this for every
    engine-shared float constant embedded in an oracle."""
    return f"CAST('{x!r}' AS DOUBLE)"
