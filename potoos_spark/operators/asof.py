"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as a composition of built-in ops (SURVEY.md custom-operator
rule (a)): union both sides tagged, one sort per key partition, then
``last(..., ignoreNulls)`` over an unbounded-preceding window carries the
most recent right-side values forward onto left rows. Cost: ONE shuffle
on the key (same as any join) and one per-partition sort — no range
explosion, no cross product, robust to arbitrary skew between the two
sides' timestamps. This scales linearly: at 100 TB it behaves like a
sort-merge join keyed on ``on`` with time-major merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    direction: str = "backward",
    tolerance_ms: int | None = None,
    right_seq: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward' gives
    smallest >=). Right-side payload columns keep their names; collisions
    with left columns are an error (alias beforehand).

    ``tolerance_ms`` nulls out matches farther than the given gap.
    ``right_seq`` names an ingestion-sequence column on the right used
    to break duplicate-timestamp ties deterministically (max seq wins,
    the A15 latest-ingested rule); without it, equal right timestamps
    are matched in an unspecified order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    payload = [
        c for c in right.columns
        if c not in keys and c != right_ts and c != right_seq
    ]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    l = left.withColumn("__side", F.lit(1)).withColumn("__t", F.col(left_ts))
    r = right.withColumn("__side", F.lit(0)).withColumn("__t", F.col(right_ts))
    seq = F.col(right_seq) if right_seq else F.lit(0)
    l = l.withColumn("__seq", F.lit(0))
    r = r.withColumn("__seq", seq)
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in payload:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    cols = keys + ["__t", "__side", "__seq"] + [
        c for c in left.columns if c not in keys
    ] + payload
    both = l.select(*cols).unionByName(r.select(*cols))

    if direction == "backward":
        # right rows (__side=0) sort before left rows at equal ts so an
        # exactly-aligned baseline point matches its own timestamp
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__seq").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
    else:
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").desc(), F.col("__side").asc(), F.col("__seq").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
    # the payload is carried as ONE struct, not per-column: carrying each
    # column independently with last(ignorenulls) would backfill a NULL
    # field of the matched right row with a stale value from an OLDER
    # right row, emitting a mixed-row result that never existed
    p_struct = F.when(F.col("__side") == 0, F.struct(*[F.col(c) for c in payload]))
    carried_p = F.last(p_struct, ignorenulls=True).over(w).alias("__p")
    match_ts = F.last(
        F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True
    ).over(w)

    out = both.select(
        *keys,
        "__t",
        "__side",
        *[c for c in left.columns if c not in keys],
        carried_p,
        match_ts.alias("__match_t"),
    ).filter(F.col("__side") == 1)
    out = out.select(
        *[c for c in out.columns if c != "__p"],
        *[F.col(f"__p.{c}").alias(c) for c in payload],
    )

    if tolerance_ms is not None:
        gap = F.abs(F.col("__t") - F.col("__match_t"))
        out = out.select(
            *[
                F.when(gap <= int(tolerance_ms), F.col(c)).otherwise(F.lit(None)).alias(c)
                if c in payload
                else F.col(c)
                for c in out.columns
            ]
        )
    return out.drop("__side", "__t", "__match_t")


def nearest_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_ms",
    right_ts: str = "ts_ms",
    tolerance_ms: int | None = None,
    right_seq: str | None = None,
) -> DataFrame:
    """As-of join in the NEAREST direction: each left row takes the
    right row minimizing |right_ts - left_ts|, ties going to the past
    (backward) match — pandas' ``merge_asof(direction='nearest')``
    semantics, composed from one backward and one forward pass over the
    same union+window machinery (still no range join, no explode).

    Right payload columns keep their names; ``tolerance_ms`` nulls
    matches farther than the gap in BOTH directions."""
    keys = [on] if isinstance(on, str) else list(on)
    skip = set(keys) | {right_ts} | ({right_seq} if right_seq else set())
    payload = [c for c in right.columns if c not in skip]

    def prep(suffix: str) -> DataFrame:
        sel = [F.col(k) for k in keys] + [F.col(right_ts)]
        if right_seq:
            sel.append(F.col(right_seq))
        sel += [F.col(c).alias(c + suffix) for c in payload]
        return right.select(*sel).withColumn("__mts" + suffix, F.col(right_ts))

    b = asof_join(
        left, prep("__b"), on=keys, left_ts=left_ts, right_ts=right_ts,
        direction="backward", right_seq=right_seq,
    )
    both = asof_join(
        b, prep("__f"), on=keys, left_ts=left_ts, right_ts=right_ts,
        direction="forward", right_seq=right_seq,
    )
    lt = F.col(left_ts)
    bts, fts = F.col("__mts__b"), F.col("__mts__f")
    use_b = bts.isNotNull() & (fts.isNull() | ((lt - bts) <= (fts - lt)))
    gap = F.when(use_b, lt - bts).otherwise(fts - lt)
    out_cols = []
    for c in left.columns:
        out_cols.append(F.col(c))
    for c in payload:
        v = F.when(use_b, F.col(c + "__b")).otherwise(F.col(c + "__f"))
        if tolerance_ms is not None:
            v = F.when(gap <= int(tolerance_ms), v)
        out_cols.append(v.alias(c))
    return both.select(*out_cols)
