"""Cache-materialization discipline shared across the operator tier
(r10 optimization round)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_fill(df: DataFrame) -> DataFrame:
    """Materialize a lazily-persisted relation NOW (one cheap count),
    before any concurrent consumer exists. Under AQE the broadcast-
    exchange threads and the main stage evaluate concurrently, and an
    un-filled cache is not locked per-partition — every concurrent
    reader re-computes the full subtree (profiled in the r10
    optimization round: duplicate 20–100 CPU-s stages running the
    identical MinHash/verify pipeline side by side). Call this on a
    persisted frame that is about to be referenced from more than one
    plan branch. Wall-cost is one extra job over the (now cached)
    relation; the duplicated subtree evaluation it prevents is pure
    waste at any scale where executors are busy — and for range-
    sampled repartitions it also closes the window where two branches
    could sample DIFFERENT split points (the pack_bins retry hazard).
    """
    df.count()
    return df
