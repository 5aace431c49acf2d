"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship end-to-end pipeline (Phase-0 slice from
SURVEY.md §7) at sf0.001. ``queries``/``oracle_sql`` expose the
operator catalog from ``potoos_spark.catalog`` — one entry per
implemented operator from SURVEY.md §2, each with its DuckDB oracle
where SQL-expressible.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from potoos_spark.catalog import CATALOG


def _ordered_catalog(
    latest: dict | None = None, specs: dict | None = None
) -> dict:
    """Catalog ordered for the driver's per-round sample: (1) entries
    whose MOST RECENT driver row was not fully green (so a shipped fix
    gets re-checked immediately — e.g. the r3 hash failures fixed in
    r4; the verdict's top item, and there are only ever a handful),
    (2) entries never driver-sampled, (3) oracle-backed entries whose
    latest green row compared ZERO rows (a vacuous match proves
    nothing — VERDICT r7 flagged multimodal_dhash_pairs; once the
    entry re-samples with rows > 0 it leaves this tier), (4) the
    already-green rest. Heals red rows first, then maximizes
    cumulative coverage. Falls back to the raw order when no
    CORRECTNESS files exist.

    ``latest`` (entry name -> most recent driver row) and ``specs``
    (entry name -> QuerySpec) are injectable for tests; by default
    ``latest`` accumulates from the CORRECTNESS_r*.json files next to
    this module (later rounds overriding earlier ones) and ``specs``
    is the live CATALOG.
    """
    if specs is None:
        specs = CATALOG
    if latest is None:
        latest = {}
        here = os.path.dirname(os.path.abspath(__file__))
        for path in sorted(
            glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        ):
            try:
                with open(path) as f:
                    latest.update(json.load(f))
            except Exception:
                pass

    def resolved(name: str, row: dict) -> bool:
        """True when re-sampling this entry first would buy nothing.
        A rows-only row (the driver writes null matches + err
        "no_oracle") is as green as a no-SQL entry can ever get, so it
        counts as seen — UNLESS the entry has since gained an oracle,
        in which case it must be re-checked red-first (ADVICE r4: the
        old rule parked no-oracle entries in the red tier forever,
        burning sampler slots every round)."""
        if row.get("err") == "no_oracle" and specs[name].sql is None:
            return (
                row.get("rows_match") is not False
                and row.get("schema_match") is not False
            )
        return bool(
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match", True)
            and not row.get("err")
        )

    fresh = {k: v for k, v in specs.items() if k not in latest}
    red = {
        k: v
        for k, v in specs.items()
        if k in latest and not resolved(k, latest[k])
    }
    vacuous = {
        k: v
        for k, v in specs.items()
        if k in latest
        and resolved(k, latest[k])
        and latest[k].get("spark_rows") == 0
        and v.sql is not None
    }
    seen = {
        k: v
        for k, v in specs.items()
        if k in latest and resolved(k, latest[k]) and k not in vacuous
    }
    return {**red, **fresh, **vacuous, **seen}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: scan events → time filter (F1) → hourly avg
    buckets (A1) → derivative detector (D1) → threshold windows (D10)
    joined with per-series metadata (A17). Exercises every layer:
    scan → filter → agg → window → sequential-UDF → result."""
    from potoos_spark import DetectorConfig, PotoosSession, TimeSeriesConfig
    from potoos_spark.catalog.common import events_frame

    sess = PotoosSession(spark)
    series = events_frame(spark, "/root/testdata/sf0.001")
    cfg = TimeSeriesConfig(aggregation_type="avg", bucket_size_msec=3_600_000)
    res = sess.monitor(series, cfg, DetectorConfig(score_percent_threshold=0.9))
    meta = res.meta.withColumnsRenamed(
        {"start_ts_ms": "series_start_ms", "end_ts_ms": "series_end_ms"}
    )
    return res.anomalies.join(meta, "series_key")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _ordered_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.sql
        for name, spec in _ordered_catalog().items()
        if spec.sql is not None
    }
