"""Sharded trailing-range windows: the two-phase carry-in trick that
breaks the one-partition-per-series sort (VERDICT r7 item 5).

A rolling aggregate ``PARTITION BY series ORDER BY ts RANGE BETWEEN W
PRECEDING AND CURRENT ROW`` puts each WHOLE series in one task: at a
fixed series count the per-task sort grows linearly with history
(ts_bollinger_bands probed exp 0.62 sf0.1→sf1 — 5 series means 5 tasks
on a 32-core host, and on a 1000-executor cluster means 5 busy cores).
But a TRAILING window only ever reaches back W milliseconds, so the
series can be cut into time chunks of C ≥ W ms and each chunk handled
independently once it also sees the last W ms of its predecessor — the
same carry-in discipline as ``pack_bins``' distributed prefix sum:

* every row belongs to chunk ``ts div C`` (owned copy);
* rows in the last W ms of a chunk are REPLICATED into the next chunk
  (carry-in copy, ≤ W/C duplication — 1/24 at the default C = 24·W);
* the window runs per (series, chunk) over the augmented frame;
* only owned rows are emitted.

For an owned row at time t in chunk c, every window member has
ts ∈ [t−W, t] ⊆ [c·C − W, (c+1)·C) — owned-in-c plus carried-from-c−1
by construction, and carried rows older than t−W fall out of the RANGE
frame on their own. The aggregate therefore sees EXACTLY the same row
set as the unsharded window; with exact accumulators (bigint/decimal
sums, counts) the output is bit-identical at any partitioning
(pinned in tests/test_rolling_shard.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window as W, WindowSpec, functions as F

#: chunk length as a multiple of the window: 24·W keeps the carry-in
#: replication at ~4% while cutting a month-long hourly window into
#: ~30 independent tasks per series.
DEFAULT_CHUNKS_PER_WINDOW = 24

OWNED = "__rw_owned"
CHUNK = "__rw_chunk"


def sharded_trailing_window(
    df: DataFrame,
    window_ms: int,
    ts_col: str = "ts_ms",
    keys: Sequence[str] = ("series_key",),
    chunk_ms: int | None = None,
) -> tuple[DataFrame, WindowSpec]:
    """Prepare ``df`` for a sharded trailing-range window: returns
    ``(aug, w)`` where ``aug`` carries the chunk id and carry-in
    replicas and ``w`` is the per-(keys, chunk) RANGE window. Compute
    the window aggregates over ``aug`` with ``w``, then call
    ``emit_owned`` to drop the replicas and helper columns.

    Timestamps must be non-negative (epoch ms — ``div`` truncation ==
    floor on the non-negative dividend, the repo-wide idiom)."""
    window_ms = int(window_ms)
    if chunk_ms is None:
        chunk_ms = window_ms * DEFAULT_CHUNKS_PER_WINDOW
    chunk_ms = int(chunk_ms)
    if chunk_ms < window_ms:
        raise ValueError(
            f"chunk_ms ({chunk_ms}) must be >= window_ms ({window_ms}): "
            "a trailing window may span at most one chunk boundary"
        )
    ts = F.col(ts_col)
    # exact integer division (ts >= 0: trunc == floor) — a double
    # divide could misplace rows landing exactly on a chunk boundary
    chunk = F.expr(f"`{ts_col}` div {chunk_ms}").cast("bigint")
    owned = df.withColumn(CHUNK, chunk).withColumn(OWNED, F.lit(True))
    carry = (
        df.filter(F.pmod(ts, F.lit(chunk_ms)) >= F.lit(chunk_ms - window_ms))
        .withColumn(CHUNK, chunk + 1)
        .withColumn(OWNED, F.lit(False))
    )
    aug = owned.unionByName(carry)
    w = (
        W.partitionBy(*keys, CHUNK)
        .orderBy(ts_col)
        .rangeBetween(-window_ms, 0)
    )
    return aug, w


def emit_owned(df: DataFrame) -> DataFrame:
    """Keep only the owned copies and drop the sharding helper
    columns — the last step of every sharded-window pipeline."""
    return df.filter(F.col(OWNED)).drop(OWNED, CHUNK)
