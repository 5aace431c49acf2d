"""Stateful streaming detectors: cross-micro-batch EMA scoring.

The sequential detectors (D1 derivative / D2 exp_avg,
detectors/sequential.py) carry per-series recurrence state that must
survive micro-batch boundaries; ``applyInPandasWithState`` holds that
state in the streaming state store, keyed by ``series_key``.

Streaming variants are **prefix-causal**: the batch detectors normalize
scores by the whole-series stddev (which needs the future); a stream
can only know the past, so the normalizer here is the running sample
stddev over everything seen so far. The EMA recurrence itself is
bit-identical to batch (``ema_i = a*v_i + (1-a)*ema_{i-1}``,
``ema_0 = v_0``); running stats use Welford's algorithm, so results are
**micro-batch-boundary invariant**: any ordered split of the stream
into batches yields identical scores (tests/test_streaming.py pins
this).

``streaming_bucket_scores`` additionally folds the A1-A12 tumbling
bucket aggregation into the same state machine: Spark forbids chaining
``applyInPandasWithState`` after a streaming aggregation, and at scale
one stateful pass beats two stateful operators anyway. The open
bucket's accumulators (sum/cnt/min/max/first/last/sum-of-squares —
enough for all 12 aggregators) live in state; a bucket finalizes when
a point from a later bucket arrives, and the finalized value feeds the
scoring recurrence.

Arrival contract: rows arrive per-series in ts order (the usual shape
for metric streams; put ``stream_latest_dedup`` or a watermarked sort
upstream for out-of-order feeds). Rows within a batch are sorted by
ts_ms before applying the recurrence.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import TimeSeriesConfig

OUT_SCHEMA = "series_key string, ts_ms bigint, value double, score double"

# cnt/ema over the scored quantity; mean/m2 = Welford running stats of it;
# last_v/last_t support the derivative's dv/dt.
_SCORE_FIELDS = (
    "cnt bigint, ema double, mean double, m2 double, last_v double, last_t double"
)
SCORE_STATE_SCHEMA = _SCORE_FIELDS
# + the open bucket's accumulators (bkt = -2^63 sentinel for "no bucket yet").
BUCKET_STATE_SCHEMA = _SCORE_FIELDS + (
    ", bkt bigint, a_cnt bigint, a_sum double, a_min double, a_max double,"
    " a_first double, a_last double, a_sum2 double"
)

_NO_BUCKET = -(2**63)


def _gather_sorted(batches, sort_cols=("ts_ms",)):
    """Concatenate ALL of a group's Arrow chunks and sort ONCE.

    ``applyInPandasWithState`` hands a group over as an iterator of
    Arrow chunks in shuffle-concat order; sorting per chunk silently
    breaks per-series ts order whenever a group exceeds one Arrow batch
    (~10k rows at the default maxRecordsPerBatch) — a later chunk can
    hold earlier timestamps, so a per-chunk recurrence runs (and then
    checkpoints) out of order. Memory is bounded by the group's rows in
    the micro-batch, which already transit this task either way.
    """
    pdfs = [p for p in batches if len(p)]
    if not pdfs:
        return None
    pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
    cols = [c for c in sort_cols if c in pdf.columns]
    return pdf.sort_values(cols).reset_index(drop=True)


class _Scorer:
    """The prefix-causal scoring recurrence shared by both stateful ops."""

    __slots__ = (
        "alpha", "derivative", "cnt", "ema", "mean", "m2", "last_v", "last_t", "_n"
    )

    def __init__(self, alpha: float, derivative: bool, packed: Optional[tuple]):
        self.alpha = alpha
        self.derivative = derivative
        if packed is None:
            self.cnt, self.ema, self.mean, self.m2 = 0, 0.0, 0.0, 0.0
            self.last_v, self.last_t = 0.0, 0.0
        else:
            (self.cnt, self.ema, self.mean, self.m2, self.last_v, self.last_t) = packed
        # Welford sample count. Both paths keep it equal to cnt (the
        # derivative's d_0 = d_1 duplicate makes d-count == point count),
        # so it reconstructs from persisted state for free.
        self._n = self.cnt

    def packed(self) -> tuple:
        return (self.cnt, self.ema, self.mean, self.m2, self.last_v, self.last_t)

    def step(self, t: int, v: float) -> float:
        a, b = self.alpha, 1.0 - self.alpha
        if self.derivative:
            if self.cnt == 0:
                score = 0.0  # batch sets d_0 = d_1 → score_0 ≡ 0
            else:
                dt = (t - self.last_t) / 1000.0 or 1.0
                d = abs(v - self.last_v) / dt
                if self.cnt == 1:
                    self.ema = d
                    # mirror batch's d_0 = d_1 duplicate in the stats
                    for _ in range(2):
                        self._add_stat(d)
                else:
                    self.ema = a * d + b * self.ema
                    self._add_stat(d)
                std = self._std()
                score = abs(d - self.ema) / std if std > 0 else 0.0
        else:
            self.ema = v if self.cnt == 0 else a * v + b * self.ema
            self._add_stat(v)
            std = self._std()
            score = abs(v - self.ema) / std if std > 0 else 0.0
        self.cnt += 1
        self.last_v, self.last_t = v, float(t)
        return score

    def _add_stat(self, x: float) -> None:
        self._n += 1
        delta = x - self.mean
        self.mean += delta / self._n
        self.m2 += delta * (x - self.mean)

    def _std(self) -> float:
        if self._n < 2:
            return 0.0
        return math.sqrt(self.m2 / (self._n - 1))


def _mk_scorer_kwargs(algorithm: str, smoothing_factor: float):
    if algorithm not in ("exp_avg_detector", "derivative_detector"):
        raise ValueError(f"unsupported streaming algorithm {algorithm!r}")
    return float(smoothing_factor), algorithm == "derivative_detector"


REORDER_STATE_SCHEMA = _SCORE_FIELDS + ", pend_ts array<bigint>, pend_v array<double>"


def streaming_scores(
    sdf: DataFrame,
    algorithm: str = "exp_avg_detector",
    smoothing_factor: float = 0.2,
    ordered: bool = True,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Score a streaming series frame point-by-point with persistent
    per-series state. ``algorithm`` ∈ {exp_avg_detector,
    derivative_detector} — the two recurrence-state detectors; the
    stateless detectors are plain column expressions on the stream.

    ``ordered=False`` handles out-of-order arrival with an event-time
    reorder buffer folded into the SAME state machine (chaining a
    second stateful operator is both forbidden by Spark and wasteful):
    rows buffer in state and are scored in ts order only once the
    watermark passes them; rows later than the watermark are dropped
    (standard late-data policy). The trailing unflushed buffer stays
    pending until the watermark advances past it."""
    alpha, derivative = _mk_scorer_kwargs(algorithm, smoothing_factor)

    if ordered:

        def fn(
            key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            sc = _Scorer(alpha, derivative, state.get if state.exists else None)
            pdf = _gather_sorted(batches)
            if pdf is not None:
                scores = [
                    sc.step(int(t), float(v))
                    for t, v in zip(pdf["ts_ms"], pdf["value"])
                ]
                out = pdf[["ts_ms", "value"]].copy()
                out.insert(0, "series_key", key[0])
                out["score"] = scores
                yield out
            state.update(sc.packed())

        return (
            sdf.select("series_key", "ts_ms", "value")
            .groupBy("series_key")
            .applyInPandasWithState(
                fn, OUT_SCHEMA, SCORE_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
            )
        )

    from pyspark.sql import functions as F

    def fn_buffered(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            packed = state.get
            sc = _Scorer(alpha, derivative, packed[:6])
            pend_ts = list(packed[6] or [])
            pend_v = list(packed[7] or [])
        else:
            sc = _Scorer(alpha, derivative, None)
            pend_ts, pend_v = [], []
        wm = state.getCurrentWatermarkMs()
        high = sc.last_t  # never score behind what's already scored
        seen = set(pend_ts)  # one score per (series, ts): first arrival wins
        for pdf in batches:
            for t, v in zip(pdf["ts_ms"], pdf["value"]):
                t = int(t)
                if (sc.cnt and t <= high) or t in seen:
                    continue  # behind emitted history, or duplicate ts
                seen.add(t)
                pend_ts.append(t)
                pend_v.append(float(v))
        order = sorted(range(len(pend_ts)), key=lambda i: pend_ts[i])
        emit_idx = [i for i in order if pend_ts[i] <= wm]
        keep_idx = [i for i in order if pend_ts[i] > wm]
        if emit_idx:
            ts = [pend_ts[i] for i in emit_idx]
            vs = [pend_v[i] for i in emit_idx]
            scores = [sc.step(t, v) for t, v in zip(ts, vs)]
            yield pd.DataFrame(
                {
                    "series_key": key[0],
                    "ts_ms": pd.Series(ts, dtype="int64"),
                    "value": vs,
                    "score": scores,
                }
            )
        state.update(
            sc.packed()
            + ([pend_ts[i] for i in keep_idx], [pend_v[i] for i in keep_idx])
        )

    if "event_time" not in sdf.columns:
        sdf = sdf.withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    sdf = sdf.withWatermark("event_time", watermark)
    return (
        sdf.select("series_key", "ts_ms", "value", "event_time")
        .groupBy("series_key")
        .applyInPandasWithState(
            fn_buffered,
            OUT_SCHEMA,
            REORDER_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def _bucket_value(agg: str, cnt, s, mn, mx, first, last, s2) -> Optional[float]:
    if cnt == 0:
        return None
    mean = s / cnt
    if agg == "avg":
        return mean
    if agg == "sum":
        return s
    if agg == "min":
        return mn
    if agg == "max":
        return mx
    if agg == "range":
        return mx - mn
    if agg == "count":
        return float(cnt)
    if agg == "first":
        return first
    if agg == "last":
        return last
    var_p = max(s2 / cnt - mean * mean, 0.0)
    if agg == "var.p":
        return var_p
    if agg == "std.p":
        return math.sqrt(var_p)
    if cnt < 2:
        return None  # sample variance of 1 point: NULL (engine convention)
    var_s = max((s2 - cnt * mean * mean) / (cnt - 1), 0.0)
    if agg == "var.s":
        return var_s
    if agg == "std.s":
        return math.sqrt(var_s)
    raise ValueError(f"unknown aggregation_type {agg!r}")


def streaming_bucket_scores(
    sdf: DataFrame,
    ts_cfg: TimeSeriesConfig,
    algorithm: str = "derivative_detector",
    smoothing_factor: float = 0.2,
) -> DataFrame:
    """One stateful pass: tumbling-bucket aggregation (A1-A12, with A13
    align and A14 labels) + prefix-causal EMA scoring of the bucket
    series. A bucket finalizes when the series' first later-bucket point
    arrives; the trailing open bucket stays pending (it is still
    accumulating — emitting it early would re-score history).

    Output rows: (series_key, ts_ms = bucket label, value = bucket
    aggregate, score)."""
    if ts_cfg.aggregation_type is None:
        raise ValueError("streaming_bucket_scores requires cfg.aggregation_type")
    agg = ts_cfg.aggregation_type
    b = int(ts_cfg.bucket_size_msec)
    offset = ts_cfg.align_offset_ms()
    label_shift = {"~": b // 2, "+": b}.get(ts_cfg.bucket_timestamp or "-", 0)
    alpha, derivative = _mk_scorer_kwargs(algorithm, smoothing_factor)

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            packed = state.get
            sc = _Scorer(alpha, derivative, packed[:6])
            bkt, a_cnt, a_sum, a_min, a_max, a_first, a_last, a_sum2 = packed[6:]
        else:
            sc = _Scorer(alpha, derivative, None)
            bkt, a_cnt = _NO_BUCKET, 0
            a_sum = a_min = a_max = a_first = a_last = a_sum2 = 0.0

        pdf = _gather_sorted(batches)
        if pdf is not None:
            out_ts, out_v, out_s = [], [], []
            for t, v in zip(pdf["ts_ms"], pdf["value"]):
                t, v = int(t), float(v)
                cur = t - (t - offset) % b
                if cur != bkt:
                    if bkt != _NO_BUCKET:
                        val = _bucket_value(
                            agg, a_cnt, a_sum, a_min, a_max, a_first, a_last, a_sum2
                        )
                        if val is not None:
                            label = bkt + label_shift
                            out_ts.append(label)
                            out_v.append(val)
                            out_s.append(sc.step(label, val))
                    bkt, a_cnt = cur, 0
                    a_sum = a_sum2 = 0.0
                    a_min = a_max = a_first = a_last = v
                a_cnt += 1
                a_sum += v
                a_sum2 += v * v
                a_min = min(a_min, v)
                a_max = max(a_max, v)
                a_last = v
            if out_ts:
                yield pd.DataFrame(
                    {
                        "series_key": key[0],
                        "ts_ms": pd.Series(out_ts, dtype="int64"),
                        "value": out_v,
                        "score": out_s,
                    }
                )
        state.update(
            sc.packed()
            + (bkt, a_cnt, a_sum, a_min, a_max, a_first, a_last, a_sum2)
        )

    return (
        sdf.select("series_key", "ts_ms", "value")
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, BUCKET_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


RATE_STATE_SCHEMA = "bkt bigint, a_max double, prev_max double, has_prev bigint"


def streaming_counter_rate(
    sdf: DataFrame, bucket_ms: int, offset_ms: int = 0
) -> DataFrame:
    """Stateful streaming counter rate over bucket maxima (the scrape-
    style variant of ``operators.rate.counter_rate``): per series, each
    finalized bucket's MAX is compared against the previous finalized
    bucket's MAX —

        increase = cur - prev   if cur >= prev   (monotone counter)
                   cur          otherwise        (reset to 0)

    and rate = increase / bucket_seconds. Using the per-bucket MAX
    (order-free, exact — no accumulation) makes the result independent
    of arrival order *within* a bucket, so the stream replay is
    bit-identical to the batch SQL regardless of micro-batch splits.

    Like ``streaming_bucket_scores``, a bucket finalizes when the
    series' first later-bucket point arrives (arrival-driven); the
    trailing open bucket stays pending. The first finalized bucket
    seeds the baseline and emits nothing.

    Output: (series_key, ts_ms = bucket start, value = bucket max,
    increase, rate_per_sec).
    """
    b = int(bucket_ms)
    offset = int(offset_ms)
    out_schema = (
        "series_key string, ts_ms bigint, value double, "
        "increase double, rate_per_sec double"
    )
    bucket_sec = b / 1000.0

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bkt, a_max, prev_max, has_prev = state.get
        else:
            bkt, a_max, prev_max, has_prev = _NO_BUCKET, 0.0, 0.0, 0

        pdf = _gather_sorted(batches)
        if pdf is not None:
            out_ts, out_v, out_inc = [], [], []
            for t, v in zip(pdf["ts_ms"], pdf["value"]):
                t, v = int(t), float(v)
                cur = t - (t - offset) % b
                if cur != bkt:
                    if bkt != _NO_BUCKET:
                        if has_prev:
                            inc = a_max - prev_max if a_max >= prev_max else a_max
                            out_ts.append(bkt)
                            out_v.append(a_max)
                            out_inc.append(inc)
                        prev_max, has_prev = a_max, 1
                    bkt, a_max = cur, v
                elif v > a_max:
                    a_max = v
            if out_ts:
                yield pd.DataFrame(
                    {
                        "series_key": key[0],
                        "ts_ms": pd.Series(out_ts, dtype="int64"),
                        "value": out_v,
                        "increase": out_inc,
                        "rate_per_sec": [x / bucket_sec for x in out_inc],
                    }
                )
        state.update((bkt, a_max, prev_max, has_prev))

    return (
        sdf.select("series_key", "ts_ms", "value")
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, out_schema, RATE_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


DEBOUNCE_STATE_SCHEMA = "lk bigint, has_lk bigint"


def streaming_debounce(sdf: DataFrame, cooldown_ms: int) -> DataFrame:
    """Streaming cooldown debounce: the batch ``debounce`` rule with the
    last-kept timestamp in the state store. Kept rows emit immediately
    (no bucket to finalize, so nothing is withheld at end-of-stream and
    the replay equals the batch answer exactly). Arrival contract as
    the other stateful ops: per-series ts order.

    Output: the kept rows (series_key, ts_ms, value)."""
    cd = int(cooldown_ms)
    out_schema = "series_key string, ts_ms bigint, value double"

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lk, has_lk = state.get
        else:
            lk, has_lk = 0, 0
        pdf = _gather_sorted(batches, ("ts_ms", "seq"))
        if pdf is not None:
            keep = []
            for t in pdf["ts_ms"]:
                t = int(t)
                if not has_lk or t - lk >= cd:
                    keep.append(True)
                    lk, has_lk = t, 1
                else:
                    keep.append(False)
            out = pdf.loc[keep, ["ts_ms", "value"]].copy()
            if len(out):
                out.insert(0, "series_key", key[0])
                yield out
        state.update((lk, has_lk))

    cols = ["series_key", "ts_ms", "value"] + (
        ["seq"] if "seq" in sdf.columns else []
    )
    return (
        sdf.select(*cols)
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, out_schema, DEBOUNCE_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


SLA_STATE_SCHEMA = (
    "first_ts bigint, last_ts bigint, has bigint, n bigint, viol bigint, "
    "down bigint"
)


def streaming_heartbeat_sla(sdf: DataFrame, heartbeat_ms: int) -> DataFrame:
    """Live availability dashboard — the stateful twin of the batch
    ``rate.heartbeat_sla``: per series, O(1) state (first/last ts,
    point/violation counts, downtime) updated per arriving point, with
    the RUNNING SLA emitted per point (append mode, nothing withheld at
    end-of-stream). The final row per series equals the batch summary
    exactly; the full per-point emission equals the batch cumulative-
    window form, which is the replay oracle. Integer ms arithmetic end
    to end; the ratio is one division of exact integers per emitted
    row. Arrival contract: per-series (ts, seq) order, like the other
    stateful ops.

    Output (append): (series_key, ts_ms, n_points, n_violations,
    downtime_ms, uptime_ratio) — ratio NULL until the span is nonzero.
    """
    th = int(heartbeat_ms)
    out_schema = (
        "series_key string, ts_ms bigint, n_points bigint, "
        "n_violations bigint, downtime_ms bigint, uptime_ratio double"
    )

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            first, last, has, n, viol, down = state.get
        else:
            first, last, has, n, viol, down = 0, 0, 0, 0, 0, 0
        pdf = _gather_sorted(batches, ("ts_ms", "seq"))
        if pdf is not None:
            # The per-point SLA recurrence is a pure prefix scan, so it
            # vectorizes: gaps by diff (carry-in = the checkpointed
            # last_ts), violation/downtime by cumsum, span off the
            # fixed first_ts. Same IEEE double division as the scalar
            # form — bit-identical output, ~50x less Python per point
            # (VERDICT r5 item 5: per-point emission was the only
            # growth axis the scale probe could see).
            ts = pdf["ts_ms"].to_numpy(dtype="int64")
            if has:
                gaps = np.diff(ts, prepend=np.int64(last))
            else:
                first = int(ts[0])
                # the opening point closes no interval: no gap charge
                gaps = np.diff(ts, prepend=ts[0])
            over = gaps - th
            viol_c = viol + np.cumsum(gaps > th, dtype="int64")
            down_c = down + np.cumsum(
                np.maximum(over, 0, out=over), dtype="int64"
            )
            n_c = n + np.arange(1, len(ts) + 1, dtype="int64")
            span = ts - first
            with np.errstate(divide="ignore", invalid="ignore"):
                ratio = np.where(
                    span > 0, 1.0 - down_c / span, np.nan
                )
            out = pd.DataFrame(
                {
                    "ts_ms": ts,
                    "n_points": n_c,
                    "n_violations": viol_c,
                    "downtime_ms": down_c,
                    "uptime_ratio": ratio,
                }
            )
            out.insert(0, "series_key", key[0])
            has, last = 1, int(ts[-1])
            n, viol, down = int(n_c[-1]), int(viol_c[-1]), int(down_c[-1])
            yield out
        state.update((first, last, has, n, viol, down))

    cols = ["series_key", "ts_ms"] + (["seq"] if "seq" in sdf.columns else [])
    return (
        sdf.select(*cols)
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, out_schema, SLA_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


GAP_STATE_SCHEMA = "last_ts bigint, has bigint"
GAP_REORDER_STATE_SCHEMA = "last_ts bigint, has bigint, pend array<bigint>"


def streaming_gap_detect(
    sdf: DataFrame,
    threshold_ms: int,
    ordered: bool = True,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming silence watchdog — the stateful twin of the batch gap
    detector (`catalog/timeseries.ts_gap_detect`): whenever a point
    arrives more than ``threshold_ms`` after its series' previous
    point, emit the closed gap. State is O(1) per series (the last
    seen timestamp), and alerts emit at arrival of the closing point —
    nothing is withheld at end-of-stream, so a full replay equals the
    batch lead-window answer exactly (every reported gap has a closing
    point by construction; an UNCLOSED trailing silence is the
    processing-time-timeout variant's job and is intentionally out of
    scope for the replay contract).

    Arrival contract: with ``ordered=True`` (default), per-series ts
    order like the other stateful ops. ``ordered=False`` folds the same
    event-time reorder buffer as ``streaming_scores(ordered=False)``
    into this state machine: arrivals buffer in state and feed the gap
    rule in ts order only once the watermark passes them; rows at or
    behind the already-processed frontier drop (a gap already reported
    cannot be retracted — standard late-data policy), and a
    late-but-in-time backfill point SPLITS what would have been one big
    gap into the true smaller ones.

    Output (append): (series_key, gap_start_ms, gap_end_ms, gap_ms).
    """
    th = int(threshold_ms)
    out_schema = (
        "series_key string, gap_start_ms bigint, gap_end_ms bigint, gap_ms bigint"
    )

    def _emit(key, starts, ends):
        out = pd.DataFrame({"gap_start_ms": starts, "gap_end_ms": ends})
        out.insert(0, "series_key", key[0])
        out["gap_ms"] = out["gap_end_ms"] - out["gap_start_ms"]
        return out

    if ordered:

        def fn(
            key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            if state.exists:
                last, has = state.get
            else:
                last, has = 0, 0
            pdf = _gather_sorted(batches, ("ts_ms", "seq"))
            if pdf is not None:
                starts, ends = [], []
                for t in pdf["ts_ms"]:
                    t = int(t)
                    if has and t - last > th:
                        starts.append(last)
                        ends.append(t)
                    last, has = t, 1
                if starts:
                    yield _emit(key, starts, ends)
            state.update((last, has))

        cols = ["series_key", "ts_ms"] + (["seq"] if "seq" in sdf.columns else [])
        return (
            sdf.select(*cols)
            .groupBy("series_key")
            .applyInPandasWithState(
                fn, out_schema, GAP_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
            )
        )

    def fn_buffered(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last, has, pend = state.get
            pend = list(pend or [])
        else:
            last, has, pend = 0, 0, []
        wm = state.getCurrentWatermarkMs()
        seen = set(pend)
        for pdf in batches:
            for t in pdf["ts_ms"]:
                t = int(t)
                # behind the processed frontier (gap already judged) or dup
                if (has and t <= last) or t in seen:
                    continue
                seen.add(t)
                pend.append(t)
        pend.sort()
        flush = [t for t in pend if t <= wm]
        keep = [t for t in pend if t > wm]
        if flush:
            starts, ends = [], []
            for t in flush:
                if has and t - last > th:
                    starts.append(last)
                    ends.append(t)
                last, has = t, 1
            if starts:
                yield _emit(key, starts, ends)
        state.update((last, has, keep))

    from pyspark.sql import functions as F

    sdf2 = sdf
    if "event_time" not in sdf2.columns:
        sdf2 = sdf2.withColumn("event_time", F.timestamp_millis(F.col("ts_ms")))
    sdf2 = sdf2.withWatermark("event_time", watermark)
    return (
        sdf2.select("series_key", "ts_ms", "event_time")
        .groupBy("series_key")
        .applyInPandasWithState(
            fn_buffered,
            out_schema,
            GAP_REORDER_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


PH_STATE_SCHEMA = "cnt bigint, s double, up double, dn double, mn double, mx double"


def streaming_page_hinkley(sdf: DataFrame, delta_frac: float = 0.02) -> DataFrame:
    """Stateful streaming Page-Hinkley drift scorer — the CAUSAL twin of
    ``detectors.sequential.page_hinkley_detector``: the batch op's
    allowance and normalizer use the series' GLOBAL range (acausal on a
    stream), so the streaming variant substitutes the RUNNING range
    observed so far; the (running-mean center, up/dn accumulator)
    recurrence is otherwise identical. State is O(1) per series:
    (cnt, sum, up, dn, min, max).

    Points are scored in (ts_ms, seq) order within each micro-batch;
    like the other stateful scorers, cross-batch late data is the
    reorder-buffer variant's job — the replay oracle assumes in-order
    arrival.

    Output (append): (series_key, ts_ms, value, score) per point.
    """
    df_ = float(delta_frac)

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cnt, s, up, dn, mn, mx = state.get
        else:
            cnt, s, up, dn, mn, mx = 0, 0.0, 0.0, 0.0, 0.0, 0.0

        pdf = _gather_sorted(batches, ("ts_ms", "seq"))
        if pdf is not None:
            out_ts, out_v, out_sc = [], [], []
            for t, v in zip(pdf["ts_ms"], pdf["value"]):
                t, v = int(t), float(v)
                cnt += 1
                s += v
                mean = s / cnt
                mn = v if cnt == 1 else min(mn, v)
                mx = v if cnt == 1 else max(mx, v)
                rng = mx - mn
                delta = df_ * rng
                up = max(up + ((v - mean) - delta), 0.0)
                dn = max(dn + ((mean - v) - delta), 0.0)
                out_ts.append(t)
                out_v.append(v)
                out_sc.append(max(up, dn) / rng if rng > 0 else 0.0)
            if out_ts:
                yield pd.DataFrame(
                    {
                        "series_key": key[0],
                        "ts_ms": pd.Series(out_ts, dtype="int64"),
                        "value": out_v,
                        "score": out_sc,
                    }
                )
        state.update((cnt, s, up, dn, mn, mx))

    cols = ["series_key", "ts_ms", "value"] + (
        ["seq"] if "seq" in sdf.columns else []
    )
    return (
        sdf.select(*cols)
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, OUT_SCHEMA, PH_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


SCD2_STATE_SCHEMA = (
    "cur string, vfrom bigint, ver bigint, has bigint, last string, seen bigint"
)


def streaming_scd2(sdf: DataFrame) -> DataFrame:
    """CDC → live SCD Type-2 history: per entity, a CLOSED version row
    emits the moment a state change arrives — the streaming deployment
    of the batch ``q_scd2_history`` warehouse rewrite (which recomputes
    the whole history; this maintains it incrementally with O(1) state
    per entity: current state, its valid_from, and the version
    counter). The OPEN version lives only in state — it has no
    valid_to yet — so the replay equals the batch history MINUS its
    is_current rows, which is exactly the shared oracle's filter.

    Same determinism discipline as the other stateful kernels: rows
    sort by (ts_ms, seq) inside each micro-batch and state carries the
    recurrence across batch boundaries, so any micro-batch split
    yields the identical closed-version set.

    NULL states follow the batch twin's three-valued lag semantics
    (``prev IS NULL OR state <> prev``): a null-state row after a
    non-null row is ABSORBED into the open version (NULL comparison →
    no change), but because the NEXT row's lag is then NULL, it always
    opens a new version — so the kernel tracks the previous ROW's
    state (``last``/``seen``) separately from the open VERSION's state
    (``cur``/``has``); collapsing the two (the old ``str(s)`` coercion,
    which turned NULL into the literal string 'None') diverges from
    the batch history on null input.

    Output: (user_id, state, version, valid_from_ms, valid_to_ms).
    """
    out_schema = (
        "user_id bigint, state string, version bigint, "
        "valid_from_ms bigint, valid_to_ms bigint"
    )

    def fn(
        key: Tuple[int], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur, vfrom, ver, has, last, seen = state.get
        else:
            cur, vfrom, ver, has, last, seen = None, 0, 0, 0, None, 0

        pdf = _gather_sorted(batches, sort_cols=("ts_ms", "seq"))
        if pdf is not None:
            o_state, o_ver, o_from, o_to = [], [], [], []
            for t, s in zip(pdf["ts_ms"], pdf["state"]):
                t = int(t)
                # Arrow nulls arrive as None or NaN in an object column
                if s is None or (isinstance(s, float) and s != s):
                    s = None
                else:
                    s = str(s)
                # batch lag rule: chg ⟺ prev IS NULL OR state <> prev
                chg = (
                    not seen
                    or last is None
                    or (s is not None and s != last)
                )
                if chg:
                    if has:
                        o_state.append(cur)
                        o_ver.append(ver)
                        o_from.append(vfrom)
                        o_to.append(t - 1)
                    cur, vfrom, ver, has = s, t, ver + 1, 1
                last, seen = s, 1
            if o_state:
                yield pd.DataFrame(
                    {
                        "user_id": pd.Series(
                            [key[0]] * len(o_state), dtype="int64"
                        ),
                        "state": o_state,
                        "version": pd.Series(o_ver, dtype="int64"),
                        "valid_from_ms": pd.Series(o_from, dtype="int64"),
                        "valid_to_ms": pd.Series(o_to, dtype="int64"),
                    }
                )
        state.update((cur, vfrom, ver, has, last, seen))

    return (
        sdf.select("user_id", "state", "ts_ms", "seq")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            out_schema,
            SCD2_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


BOLL_STATE_SCHEMA = "ts array<bigint>, v array<bigint>"


def streaming_bollinger(sdf: DataFrame, window_ms: int = 3_600_000) -> DataFrame:
    """Live Bollinger bands — the streaming twin of the batch
    ``ts_bollinger_bands``: per series, the trailing ``window_ms``
    points live in state as parallel (ts, v100) arrays; each arriving
    point evicts expired entries, appends itself, and emits the band
    row from EXACT integer sums (the same
    var·10⁴ = (n·Σv² − (Σv)²)/n² identity, Python ints are unbounded
    so the arithmetic is identical to the batch bigint path; the only
    floats are the same one division, one sqrt, two IEEE adds).

    Streaming semantics are SEEN-SO-FAR: a point's window contains
    exactly the points that arrived before it in (ts, seq) order
    within the trailing hour — a live monitor cannot read same-
    timestamp peers that haven't arrived. The replay oracle mirrors
    this precisely with a (ts, seq)-bounded self-join rather than the
    batch entry's RANGE window (identical whenever (series, ts) is
    unique, which the fixtures are; the semantic difference under
    peers is deliberate and documented).

    State is O(points per trailing window) per series — bounded by
    the series' arrival rate × window, watermark-free because
    eviction is driven by the monotone per-series event time
    (arrival contract: per-series (ts, seq) order, like the other
    stateful kernels).

    Output (append): (series_key, ts_ms, seq, value, n_in_hour, mean,
    std, upper, lower, breakout ∈ {-1, 0, 1}).
    """
    import math

    w_ms = int(window_ms)
    out_schema = (
        "series_key string, ts_ms bigint, seq bigint, value double, "
        "n_in_hour bigint, mean double, std double, upper double, "
        "lower double, breakout bigint"
    )

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_l, v_l = state.get
            ts_l, v_l = list(ts_l), list(v_l)
        else:
            ts_l, v_l = [], []

        pdf = _gather_sorted(batches, sort_cols=("ts_ms", "seq"))
        if pdf is not None:
            # Vectorized window sums (the r6 heartbeat-SLA precedent):
            # prefix sums over state+batch, per-point window start via
            # searchsorted — identical exact integers to the per-point
            # loop, O(batch log window) instead of O(batch · window).
            # v100 stays a scalar pass: decimal(18,2) HALF_UP on the
            # SHORTEST double repr, exactly Spark's double→decimal cast
            # (java BigDecimal.valueOf + setScale(2, HALF_UP)).
            from decimal import ROUND_HALF_UP, Decimal

            import numpy as np

            vals = pdf["value"].to_numpy(dtype="float64")
            v100_new = np.fromiter(
                (
                    int(
                        Decimal(repr(float(v))).quantize(
                            Decimal("0.01"), rounding=ROUND_HALF_UP
                        )
                        * 100
                    )
                    for v in vals
                ),
                dtype=np.int64,
                count=len(vals),
            )
            prev_n = len(ts_l)
            all_ts = np.concatenate(
                [np.asarray(ts_l, dtype=np.int64),
                 pdf["ts_ms"].to_numpy(dtype="int64")]
            )
            all_v = np.concatenate(
                [np.asarray(v_l, dtype=np.int64), v100_new]
            )
            c1 = np.cumsum(all_v)
            c2 = np.cumsum(all_v * all_v)
            idx = np.arange(prev_n, len(all_ts))
            j = np.searchsorted(all_ts, all_ts[idx] - w_ms, side="left")
            n = (idx - j + 1).astype(np.int64)
            a = c1[idx] - np.where(j > 0, c1[np.maximum(j - 1, 0)], 0)
            b = c2[idx] - np.where(j > 0, c2[np.maximum(j - 1, 0)], 0)
            mean = a.astype(np.float64) / (100.0 * n)
            var4 = (n * b - a * a).astype(np.float64) / (
                (n * n * 10_000).astype(np.float64)
            )
            std = np.sqrt(var4)
            up, low = mean + 2.0 * std, mean - 2.0 * std
            bk = np.where(vals > up, 1, np.where(vals < low, -1, 0)).astype(
                np.int64
            )
            out = pd.DataFrame(
                {
                    "ts_ms": pd.Series(all_ts[idx], dtype="int64"),
                    "seq": pdf["seq"].astype("int64").values,
                    "value": pd.Series(vals, dtype="float64"),
                    "n_in_hour": pd.Series(n, dtype="int64"),
                    "mean": pd.Series(mean, dtype="float64"),
                    "std": pd.Series(std, dtype="float64"),
                    "upper": pd.Series(up, dtype="float64"),
                    "lower": pd.Series(low, dtype="float64"),
                    "breakout": pd.Series(bk, dtype="int64"),
                }
            )
            out.insert(0, "series_key", key[0])
            yield out
            # state = the last point's trailing window only
            keep = int(
                np.searchsorted(all_ts, all_ts[-1] - w_ms, side="left")
            )
            ts_l = [int(x) for x in all_ts[keep:]]
            v_l = [int(x) for x in all_v[keep:]]
        state.update((ts_l, v_l))

    return (
        sdf.select("series_key", "ts_ms", "value", "seq")
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, out_schema, BOLL_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


CUSUM_STATE_SCHEMA = "sp double, sn double"


def cusum_profile(df: DataFrame, allowance_frac: float = 0.05) -> DataFrame:
    """Per-series CUSUM calibration from batch history: LOW median mu
    (exact rank selection, ordered by (value, ts_ms) — the same rule as
    the det_cusum oracle), range, and allowance k = frac·range. This is
    the nightly-calibration half of a deployed CUSUM monitor: the
    center/allowance come from history, the live stream only carries
    the O(1) (s+, s−) recurrence. ≤ one row per series — a broadcast-
    scale relation."""
    from pyspark.sql import Window as W, functions as F

    wv = W.partitionBy("series_key").orderBy("value", "ts_ms")
    wp = W.partitionBy("series_key")
    r = df.select(
        "series_key",
        "value",
        "ts_ms",
        F.row_number().over(wv).alias("__vr"),
        F.count("*").over(wp).alias("__n"),
        (F.max("value").over(wp) - F.min("value").over(wp)).alias("rng"),
    )
    return r.filter(F.col("__vr") == F.expr("(__n + 1) div 2")).select(
        "series_key",
        F.col("value").alias("mu"),
        "rng",
        (F.lit(float(allowance_frac)) * F.col("rng")).alias("k"),
    )


def streaming_cusum(sdf: DataFrame, profile: DataFrame) -> DataFrame:
    """Stateful streaming CUSUM — the deployed twin of
    ``detectors.sequential.cusum_detector``: the batch op's center
    (median) and allowance (frac·range) are GLOBAL statistics, acausal
    on a live stream, so the production shape calibrates them offline
    (``cusum_profile`` over history) and broadcast-joins the ≤1-row-
    per-series profile into the stream BEFORE the stateful apply — a
    stateless stream-static join. The live state is exactly the CUSUM
    pair (s+, s−): O(1) per series, batch-split-invariant.

        s+ = max(s+ + ((v − mu) − k), 0);  s− = max(s− + ((mu − v) − k), 0)
        score = max(s+, s−) / rng

    With the profile computed over the same data the replay scores are
    bit-identical to the batch detector's (same float64 op order), so
    the entry shares det_cusum's recursive-CTE oracle. Series absent
    from the profile are dropped by the inner join — an un-calibrated
    series needs a profile row first (deployment contract).

    Output (append): (series_key, ts_ms, value, score) per point.
    """

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sp, sn = state.get
        else:
            sp, sn = 0.0, 0.0

        pdf = _gather_sorted(batches, ("ts_ms", "seq"))
        if pdf is not None:
            mu = float(pdf["mu"].iloc[0])
            k = float(pdf["k"].iloc[0])
            rng = float(pdf["rng"].iloc[0])
            out_ts, out_v, out_sc = [], [], []
            for t, v in zip(pdf["ts_ms"], pdf["value"]):
                t, v = int(t), float(v)
                sp = max(sp + ((v - mu) - k), 0.0)
                sn = max(sn + ((mu - v) - k), 0.0)
                out_ts.append(t)
                out_v.append(v)
                out_sc.append(max(sp, sn) / rng if rng > 0 else 0.0)
            if out_ts:
                yield pd.DataFrame(
                    {
                        "series_key": key[0],
                        "ts_ms": pd.Series(out_ts, dtype="int64"),
                        "value": out_v,
                        "score": out_sc,
                    }
                )
        state.update((sp, sn))

    from pyspark.sql import functions as F

    cols = ["series_key", "ts_ms", "value"] + (
        ["seq"] if "seq" in sdf.columns else []
    )
    joined = sdf.select(*cols).join(F.broadcast(profile), "series_key")
    return joined.groupBy("series_key").applyInPandasWithState(
        fn, OUT_SCHEMA, CUSUM_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


MACD_STATE_SCHEMA = "ef double, es double, sig double, seen bigint"

MACD_OUT_SCHEMA = (
    "series_key string, ts_ms bigint, value double, "
    "macd double, signal double, histogram double"
)


def streaming_macd(sdf: DataFrame) -> DataFrame:
    """Stateful streaming MACD(12, 26, 9) — the live twin of
    ``detectors.sequential.macd_frame``. Unlike CUSUM, the EMA
    recurrences are fully CAUSAL (no global statistics), so no
    calibration profile is needed: state is exactly (ef, es, sig) plus
    a seen flag — O(1) per series, batch-split-invariant, and the
    availableNow replay reproduces the batch kernel bit-for-bit on the
    same rows.

    Output (append): (series_key, ts_ms, value, macd, signal,
    histogram) per point."""
    from ..detectors.sequential import (
        MACD_A_FAST, MACD_B_FAST, MACD_A_SLOW, MACD_B_SLOW,
        MACD_A_SIG, MACD_B_SIG,
    )

    def fn(
        key: Tuple[str], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ef, es, sig, seen = state.get
        else:
            ef, es, sig, seen = 0.0, 0.0, 0.0, 0

        pdf = _gather_sorted(batches, ("ts_ms", "seq"))
        if pdf is not None:
            out_ts, out_v, out_m, out_s, out_h = [], [], [], [], []
            for t, v in zip(pdf["ts_ms"], pdf["value"]):
                t, v = int(t), float(v)
                if not seen:
                    ef = es = v
                    sig = 0.0
                    seen = 1
                    m = 0.0
                else:
                    ef = MACD_A_FAST * v + MACD_B_FAST * ef
                    es = MACD_A_SLOW * v + MACD_B_SLOW * es
                    m = ef - es
                    sig = MACD_A_SIG * m + MACD_B_SIG * sig
                out_ts.append(t)
                out_v.append(v)
                out_m.append(m)
                out_s.append(sig)
                out_h.append(m - sig)
            if out_ts:
                yield pd.DataFrame(
                    {
                        "series_key": key[0],
                        "ts_ms": pd.Series(out_ts, dtype="int64"),
                        "value": out_v,
                        "macd": out_m,
                        "signal": out_s,
                        "histogram": out_h,
                    }
                )
        state.update((ef, es, sig, seen))

    cols = ["series_key", "ts_ms", "value"] + (
        ["seq"] if "seq" in sdf.columns else []
    )
    return (
        sdf.select(*cols)
        .groupBy("series_key")
        .applyInPandasWithState(
            fn, MACD_OUT_SCHEMA, MACD_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
