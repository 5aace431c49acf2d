"""Skew-resistant aggregation (SURVEY.md §7 Phase 5 — 100 TB hardening).

A hot series key (one metric emitting 1000× its peers) turns the
single hash-partitioned aggregation into one straggler task. AQE's
skew handling splits skewed *joins* but not aggregation groups, so the
classic fix is salting: aggregate in two stages —

  stage 1: groupBy(key, salt)  — the hot key's rows spread over
           ``n_salts`` partitions, each computing a partial aggregate;
  stage 2: groupBy(key)        — combine the ≤ n_salts partials.

The shuffle after stage 1 carries n_salts rows per key instead of every
raw row, so the straggler disappears at the cost of one extra (tiny)
shuffle. Only algebraic aggregates decompose this way; this module
covers the ones the retrieval surface needs (sum/count/min/max/avg and
the variance family via (n, Σx, Σx²) partials).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .cache import eager_fill

_DECOMPOSABLE = ("sum", "count", "min", "max", "avg", "var.p", "var.s", "std.p", "std.s")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    agg_type: str = "sum",
    n_salts: int = 32,
    out_col: str = "value",
) -> DataFrame:
    """Two-stage salted aggregation of ``value_col`` by ``keys``.

    Equivalent to ``df.groupBy(keys).agg(<agg>)`` but immune to hot
    keys: stage 1 partials are computed per (keys, salt) where salt is
    a uniform hash of the whole row's position — ``rand``-free
    (deterministic plans matter for retries) via pmod over
    ``monotonically_increasing_id``.
    """
    if agg_type not in _DECOMPOSABLE:
        raise ValueError(
            f"{agg_type!r} does not decompose into partials; "
            f"supported: {_DECOMPOSABLE}"
        )
    keys = list(keys)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(int(n_salts))).alias("__salt")
    v = F.col(value_col)

    partial = (
        df.select(*keys, v.alias("__v"), salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum("__v").alias("__s"),
            F.sum(F.col("__v") * F.col("__v")).alias("__q"),
            F.count("__v").alias("__n"),
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
        )
    )
    final = partial.groupBy(*keys).agg(
        F.sum("__s").alias("__s"),
        F.sum("__q").alias("__q"),
        F.sum("__n").alias("__n"),
        F.min("__mn").alias("__mn"),
        F.max("__mx").alias("__mx"),
    )

    s, q, n = F.col("__s"), F.col("__q"), F.col("__n")
    exprs: dict[str, Column] = {
        "sum": s,
        "count": n.cast("double"),
        "min": F.col("__mn"),
        "max": F.col("__mx"),
        "avg": s / n,
        "var.p": (q - s * s / n) / n,
        "var.s": F.when(n > 1, (q - s * s / n) / (n - 1)),
        "std.p": F.sqrt(F.greatest((q - s * s / n) / n, F.lit(0.0))),
        "std.s": F.when(n > 1, F.sqrt(F.greatest((q - s * s / n) / (n - 1), F.lit(0.0)))),
    }
    return final.select(*keys, exprs[agg_type].cast("double").alias(out_col))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the join-side complement of
    ``salted_agg`` for when AQE's runtime skew splitting isn't available
    (e.g. the skewed side feeds a co-partitioned downstream op, or the
    join is inside a streaming plan where AQE doesn't run).

      facts side: salt = uniform hash spread — each hot key's rows
                  scatter over ``n_salts`` sub-partitions;
      dim side:   replicated n_salts× (explode) so every salted
                  sub-partition finds its dim row.

    The dim side grows n_salts× — use only when dim ≪ facts (the usual
    skew shape: a huge fact table hot on a few keys joining a modest
    dimension). Result is row-identical to the plain join.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(int(n_salts)))
    f = facts.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1)))
    )
    return f.join(d, [on, "__salt"]).drop("__salt")


def two_phase_cap(
    df: DataFrame,
    cap: int,
    by: str = "source",
    id_col: str = "doc_id",
    n_salts: int = 32,
) -> DataFrame:
    """Skew-safe per-group cap: identical keep-set and ranks to the
    single-window ``curate.source_cap``, but no single task ever ranks
    a whole hot group (the hardening ``source_cap``'s docstring calls
    for).

    Phase 1 ranks within (group, salt) — the hot group's rows spread
    over ``n_salts`` reducers — and drops rows ranked past ``cap``
    there: any row whose within-salt rank exceeds ``cap`` ranks past
    ``cap`` globally too (ranks only grow when more rows compete), so
    every global top-``cap`` row survives. Phase 2 re-ranks the
    ≤ cap × n_salts survivors per group — a bounded partition
    regardless of group size — and keeps rank ≤ cap.

    The salt is md5-derived from the id (deterministic, partitioning-
    independent), and the order key is the same md5 shuffle as
    ``source_cap``, so the output is row-identical to the one-window
    form. Output: (by, id_col, rk).
    """
    h = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(int(n_salts)))
    from pyspark.sql import Window as W

    staged = df.select(F.col(by), F.col(id_col), h.alias("__h"), salt.alias("__s"))
    w1 = W.partitionBy(by, "__s").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    phase1 = staged.withColumn("__r1", F.row_number().over(w1)).filter(
        F.col("__r1") <= int(cap)
    )
    w2 = W.partitionBy(by).orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        phase1.withColumn("rk", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rk") <= int(cap))
        .select(by, id_col, "rk")
    )


def global_rank(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    rank_col: str = "rank",
    n_parts: int = 32,
) -> DataFrame:
    """Exact global row_number over a TOTAL order without the
    single-task global window (``Window.orderBy`` with no partition key
    funnels the whole relation through one sort task — the same
    driver-shaped mistake ``curate.pack_bins`` documents). Classic
    distributed ranking, the rank twin of pack_bins' prefix sum:

    1. ``repartitionByRange(order_cols)`` — order-respecting split;
    2. per-partition ``row_number`` (window partitioned by
       ``spark_partition_id`` — every sort input is a bounded range
       slice);
    3. partition COUNTS (≤ n_parts rows) prefix-summed at driver scale
       and broadcast-joined back as rank offsets.

    ``order_cols`` must be a total order (append a unique id as the
    last column) or ranks are nondeterministic; entries may be column
    names (ascending) or Column sort specs (``F.col("x").desc()``) —
    ``repartitionByRange`` honors SortOrder expressions, so descending
    orders range-partition correctly too. The input is persisted
    for the same reason as pack_bins: range sampling must happen ONCE —
    a task retry re-sampling different split points would shift rows
    between partitions inconsistently across the two branches. Caller
    owns the cache.

    Output: input columns + ``rank_col`` (1-based bigint).
    """
    from pyspark.sql import Window as W

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    staged = (
        df.repartitionByRange(int(n_parts), *cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    # eager fill: staged feeds the local-window branch and the
    # partition-totals branch concurrently (see dedup.eager_fill); an
    # unfilled cache would also let the two branches range-sample
    # independently — the retry hazard the pack_bins docstring flags
    eager_fill(staged)
    w_local = W.partitionBy("__pid").orderBy(*cols)
    local = staged.withColumn("__rn", F.row_number().over(w_local))
    counts = staged.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__pid", "__rn", "__off")
    )


def global_ntile(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    n: int,
    tile_col: str = "tile",
    n_parts: int = 32,
) -> DataFrame:
    """Exact ANSI NTILE(n) over a total order, built on ``global_rank``
    (so no single-task window): with t total rows, q = t div n and
    r = t mod n, the first r tiles hold q+1 rows — computed closed-form
    from the global rank, bit-identical to SQL NTILE. The total row
    count is a 1-row broadcast.

    Output: input columns + ``tile_col`` (1..n bigint)."""
    ranked = global_rank(df, order_cols, rank_col="__grk", n_parts=n_parts)
    total = ranked.agg(F.count("*").alias("__t"))
    q = F.floor(F.col("__t") / n)
    r = F.col("__t") % n
    big_span = (q + 1) * r  # ranks 1..big_span fall in the q+1-sized tiles
    tile = F.when(
        F.col("__grk") <= big_span,
        F.floor((F.col("__grk") - 1) / (q + 1)) + 1,
    ).otherwise(
        F.when(
            q > 0, r + F.floor((F.col("__grk") - 1 - big_span) / q) + 1
        )  # q == 0: every row sits in the first t tiles (rank = tile)
        .otherwise(F.col("__grk"))
    )
    return (
        ranked.join(F.broadcast(total))
        .withColumn(tile_col, tile.cast("bigint"))
        .drop("__grk", "__t")
    )


def global_cumsum(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "cumsum",
    n_parts: int = 32,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` over a TOTAL order
    without the single-task global window — the prefix-sum twin of
    ``global_rank`` (and the generalization of ``curate.pack_bins``'s
    offset machinery):

    1. ``repartitionByRange(order_cols)`` — order-respecting split;
    2. per-slice inclusive cumsum (window partitioned by
       ``spark_partition_id``);
    3. per-slice TOTALS (≤ n_parts rows) prefix-summed over the tiny
       offset relation and broadcast-joined back.

    Bit-identical to ``F.sum(value_col).over(Window.orderBy(...))``
    ONLY for exact-arithmetic value types (integer / DECIMAL) — float
    sums are order-sensitive, so refuse them rather than silently
    reassociate.

    ``order_cols`` must be a total order; entries may be names
    (ascending) or Column sort specs (``F.col("x").desc()``). The
    input is persisted (range sampling must happen once across the two
    branches); caller owns the cache, same contract as ``global_rank``.

    Output: input columns + ``out_col``.
    """
    from pyspark.sql import Window as W

    kind = dict(df.dtypes).get(value_col, "")
    if kind in ("float", "double") or kind.startswith("float"):
        raise ValueError(
            f"global_cumsum({value_col!r}: {kind}) — float sums are "
            "order-sensitive; scale to integer/decimal first"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    staged = (
        df.repartitionByRange(int(n_parts), *cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    # eager fill: staged feeds the local-window branch and the
    # partition-totals branch concurrently (see dedup.eager_fill); an
    # unfilled cache would also let the two branches range-sample
    # independently — the retry hazard the pack_bins docstring flags
    eager_fill(staged)
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = staged.withColumn("__lc", F.sum(value_col).over(w_local))
    totals = staged.groupBy("__pid").agg(F.sum(value_col).alias("__s"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__s").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lc"))
        .drop("__pid", "__lc", "__off")
    )


def global_cummax(
    df: DataFrame,
    order_cols: Sequence[str | Column],
    value_col: str,
    out_col: str = "cummax",
    n_parts: int = 32,
    inclusive: bool = True,
) -> DataFrame:
    """Exact running max of ``value_col`` over a TOTAL order without
    the single-task global window — the prefix-MAX sibling of
    ``global_cumsum`` (max is associative and commutative, so the
    two-phase reassociation is exact for every dtype, floats
    included). ``inclusive=False`` gives the strict-predecessors frame
    (``rowsBetween(unboundedPreceding, -1)``) the skyline sweep needs:
    the slice-local exclusive max combines with the max of all prior
    slices via ``greatest`` (null-skipping), so only the global first
    row is NULL — identical to the one-window form.

    Same persist/caller-owns-cache contract as ``global_rank``.

    Output: input columns + ``out_col``.
    """
    from pyspark.sql import Window as W

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    staged = (
        df.repartitionByRange(int(n_parts), *cols)
        .withColumn("__pid", F.spark_partition_id())
    ).persist()
    # eager fill: staged feeds the local-window branch and the
    # partition-totals branch concurrently (see dedup.eager_fill); an
    # unfilled cache would also let the two branches range-sample
    # independently — the retry hazard the pack_bins docstring flags
    eager_fill(staged)
    end = 0 if inclusive else -1
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(W.unboundedPreceding, end)
    )
    local = staged.withColumn("__lm", F.max(value_col).over(w_local))
    totals = staged.groupBy("__pid").agg(F.max(value_col).alias("__m"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.max("__m").over(w_off)
    ).select("__pid", "__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.greatest(F.col("__off"), F.col("__lm")))
        .drop("__pid", "__lm", "__off")
    )
