"""Multi-resolution rollup store ("hypertable rollup" tier, SURVEY.md
§7 Phase 5 extension).

At 100 TB, dashboards asking for month-of-hourly-buckets must not scan
raw points. The rollup store materializes per-(series, bucket) rows at
a ladder of resolutions — but instead of storing one finalized value
per aggregator, each row stores the **algebraic partials**
``(n, Σx, Σx², min, max, (first_ts, first_v), (last_ts, last_v))``.
Partials compose: a 1-day bucket is the combination of its 24 1-hour
partials — so ONE rollup table serves all 12 retrieval aggregators
(A1-A12) at any bucket size that is a multiple of its resolution, and
finer rollups re-aggregate into coarser requests without touching raw
data.

Query routing (``rollup_agg``): pick the coarsest materialized
resolution dividing the requested bucket, combine partials up to the
requested bucket, finalize the requested aggregator. Storage cost:
the 1-minute rollup is ~points/points-per-minute of raw; each coarser
level shrinks by its ratio.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession, functions as F

from .retrieval import bucket_start

PARTIAL_COLS = (
    "n", "s", "q", "mn", "mx", "first_ts", "first_v", "last_ts", "last_v"
)


def rollup_partials(df: DataFrame, bucket_ms: int) -> DataFrame:
    """Per-(series, bucket) algebraic partials from a canonical frame."""
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    v = F.col("value")
    return (
        df.withColumn("__tie", tie)
        .groupBy("series_key", bucket_start(F.col("ts_ms"), bucket_ms).alias("bucket_ms"))
        .agg(
            F.count("value").alias("n"),
            F.sum(v).alias("s"),
            F.sum(v * v).alias("q"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
            F.min(F.struct("ts_ms", "__tie")).alias("__first_key"),
            F.max(F.struct("ts_ms", "__tie")).alias("__last_key"),
            F.min_by(v, F.struct("ts_ms", "__tie")).alias("first_v"),
            F.max_by(v, F.struct("ts_ms", "__tie")).alias("last_v"),
        )
        .select(
            "series_key",
            "bucket_ms",
            "n",
            "s",
            "q",
            "mn",
            "mx",
            F.col("__first_key.ts_ms").alias("first_ts"),
            "first_v",
            F.col("__last_key.ts_ms").alias("last_ts"),
            "last_v",
        )
    )


def combine_partials(partials: DataFrame, bucket_ms: int) -> DataFrame:
    """Re-aggregate finer partials into coarser buckets — the algebraic
    combine step (what makes one rollup serve every coarser request)."""
    return (
        partials.groupBy(
            "series_key",
            bucket_start(F.col("bucket_ms"), bucket_ms).alias("bucket_ms"),
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("q").alias("q"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
            F.min("first_ts").alias("first_ts"),
            F.min_by("first_v", "first_ts").alias("first_v"),
            F.max("last_ts").alias("last_ts"),
            F.max_by("last_v", "last_ts").alias("last_v"),
        )
    )


def finalize(partials: DataFrame, agg_type: str) -> DataFrame:
    """Partials → the requested A1-A12 aggregator value."""
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    exprs = {
        "avg": s / n,
        "sum": s,
        "min": F.col("mn"),
        "max": F.col("mx"),
        "range": F.col("mx") - F.col("mn"),
        "count": n.cast("double"),
        "first": F.col("first_v"),
        "last": F.col("last_v"),
        "var.p": (q - s * s / n) / n,
        "var.s": F.when(n > 1, (q - s * s / n) / (n - 1)),
        "std.p": F.sqrt(F.greatest((q - s * s / n) / n, F.lit(0.0))),
        "std.s": F.when(
            n > 1, F.sqrt(F.greatest((q - s * s / n) / (n - 1), F.lit(0.0)))
        ),
    }
    return partials.select(
        "series_key",
        F.col("bucket_ms").alias("ts_ms"),
        exprs[agg_type].cast("double").alias("value"),
    )


def write_rollups(
    df: DataFrame,
    table_prefix: str,
    resolutions_ms: Dict[str, int],
    path_prefix: str | None = None,
    mode: str = "overwrite",
) -> Dict[str, int]:
    """Materialize the rollup ladder: one partials table per resolution,
    named ``{table_prefix}_{label}``. Returns {table_name: bucket_ms}."""
    out = {}
    for label, res in sorted(resolutions_ms.items(), key=lambda kv: kv[1]):
        name = f"{table_prefix}_{label}"
        writer = rollup_partials(df, res).write.mode(mode)
        if path_prefix is not None:
            writer = writer.option("path", f"{path_prefix}/{name}")
        writer.saveAsTable(name)
        out[name] = res
    return out


def rollup_agg(
    spark: SparkSession,
    tables: Dict[str, int],
    bucket_ms: int,
    agg_type: str = "avg",
) -> DataFrame:
    """Serve a bucketed aggregation from the rollup ladder: route to the
    coarsest materialized resolution dividing ``bucket_ms``, combine,
    finalize. Raises if no materialized resolution divides the request
    (then the query must fall back to raw data)."""
    candidates = {t: r for t, r in tables.items() if bucket_ms % r == 0}
    if not candidates:
        raise ValueError(
            f"no rollup resolution divides bucket_ms={bucket_ms}; "
            f"materialized: {sorted(set(tables.values()))}"
        )
    table = max(candidates, key=candidates.get)
    partials = spark.table(table)
    return finalize(combine_partials(partials, bucket_ms), agg_type)
