"""Oracle-checked catalog: the Structured-Streaming tier, exercised by
replaying the ``events`` table through a file-source stream
(``availableNow`` trigger → memory sink) and returning the sink table.

The replay produces *batch-identical* results for the windowed
aggregations (complete output mode emits every window), so those
entries carry real DuckDB oracles — the streaming plan is held to the
same bit-exact standard as the batch plan. The stateful EMA scorer is
a prefix-causal floating-point recurrence (EMA + Welford running
stddev); its oracle replays the SAME recurrence in a DuckDB recursive
CTE, carrying (ema, n, mean, m2) through the recursion so every float64
op happens in the identical order — DuckDB's built-in windowed
STDDEV_SAMP is NOT bit-identical to Welford (last-ulp drift), the
explicit recursion is. tests/test_streaming.py additionally pins the
scorer against a pure-python reference.

Aggregators chosen here (min) are exact doubles — no accumulation —
so stream/batch/DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import TimeSeriesConfig
from ..streaming import (
    stream_bucket_agg,
    stream_session_agg,
    streaming_bucket_scores,
)
from .common import EVENTS_SQL, QuerySpec, flit
from .timeseries import _OHLC_SQL as _OHLC_REPLAY_SQL
from .timeseries import _SEASONAL_ANOMALY_SQL as _SEASONAL_ANOMALY_REPLAY_SQL
from .relational_ext import _SCD2_SQL

# closed versions only: the streaming twin's open version lives in state
_SCD2_CLOSED_SQL = (
    f"SELECT user_id, state, version, valid_from_ms, valid_to_ms "
    f"FROM ({_SCD2_SQL}) WHERE NOT is_current"
)

HOUR = 3_600_000
GAP_MS = 1_800_000  # 30 min session gap

_S = f"WITH series AS ({EVENTS_SQL})"


def _events_raw_stream(spark: SparkSession, sf_dir: str):
    """(batch, stream) pair over the raw events table, layout-agnostic.
    The stream schema is probed from a batch footer read so both
    parquet-nanos reader shapes work (int64 ns / TIMESTAMP_NTZ — see
    retrieval.events_ts_parts). The file stream source requires a
    DIRECTORY: a directory-per-table layout (the production shape)
    streams the table path directly; the single-file fixture layout
    streams the parent with a filename glob (a glob on the parent
    matches nothing under a directory layout, so the branch is
    load-bearing, not cosmetic)."""
    from .common import is_single_file

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(path)
    # The probe goes through the Hadoop FileSystem API so single-file
    # tables behind object-store URIs take the parent+glob branch too
    # (ADVICE r4); directories stream the table path directly — the
    # branch that is correct at scale is the default.
    if is_single_file(spark, path):
        ev = (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    else:
        ev = spark.readStream.schema(batch.schema).parquet(path)
    return batch, ev


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table as the canonical series
    frame (same reshape as the batch events_frame). The stream schema is
    probed from a batch footer read so both parquet-nanos reader shapes
    work (int64 ns / TIMESTAMP_NTZ — see retrieval.events_ts_parts)."""
    from ..operators.retrieval import events_ts_ms

    batch, ev = _events_raw_stream(spark, sf_dir)
    ts_ms = events_ts_ms(batch)
    return ev.select(
        F.col("event_type").alias("series_key"),
        ts_ms.alias("ts_ms"),
        F.col("value"),
        F.col("event_id").alias("seq"),
    )


def _stream_seasonal_fn(spark, sf_dir):
    """Streaming seasonal monitor — how ``ts_seasonal_anomaly`` deploys
    in production: the calendar profile is computed BATCH (a nightly
    job over history; ≤ series×168 rows), broadcast into the live
    stream, and every arriving event is scored stateless against its
    normal-for-this-hour band. Append mode, zero streaming state, no
    watermark needed — the monitor's latency is one map + one
    broadcast join per micro-batch. The availableNow replay over the
    same events produces the batch entry's exact row set (same oracle).
    """
    from .common import dec, events_frame
    from .timeseries import DAY, HOUR, SEASONAL_TOL

    hour = F.floor(F.col("ts_ms") / HOUR).cast("bigint") % 24
    dow = (F.floor(F.col("ts_ms") / DAY).cast("bigint") + 4) % 7
    prof = (
        events_frame(spark, sf_dir)
        .groupBy("series_key", dow.alias("dow"), hour.alias("hour"))
        .agg(F.count("*").alias("n"), F.sum(dec("value")).alias("__s"))
        .select(
            "series_key", "dow", "hour",
            (F.col("__s").cast("double") / F.col("n").cast("double")).alias(
                "expected"
            ),
        )
    )
    ev = _events_stream(spark, sf_dir)
    scored = ev.select(
        "series_key", "ts_ms", "value", dow.alias("dow"), hour.alias("hour")
    ).join(F.broadcast(prof), ["series_key", "dow", "hour"])
    out = scored.select(
        "series_key",
        "ts_ms",
        "value",
        "expected",
        (F.col("value") - F.col("expected")).alias("residual"),
    ).filter(F.abs(F.col("value") - F.col("expected")) > SEASONAL_TOL)
    return _replay(out, "append")


def _stream_scd2_fn(spark, sf_dir):
    """CDC → live SCD2 replay: closed version rows only (the open
    version lives in state), so the oracle is the batch history minus
    its is_current rows — see ``streaming/stateful.streaming_scd2``."""
    from ..operators.retrieval import events_ts_ms
    from ..streaming.stateful import streaming_scd2

    batch, ev = _events_raw_stream(spark, sf_dir)
    ms = events_ts_ms(batch)
    s = ev.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_type").alias("state"),
        ms.alias("ts_ms"),
        F.col("event_id").cast("bigint").alias("seq"),
    )
    return _replay(streaming_scd2(s), "append")


def _replay(sdf: DataFrame, mode: str) -> DataFrame:
    name = f"replay_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def _stream_agg_fn(spark, sf_dir):
    cfg = TimeSeriesConfig(aggregation_type="min", bucket_size_msec=HOUR)
    return _replay(stream_bucket_agg(_events_stream(spark, sf_dir), cfg), "complete")


def _stream_session_fn(spark, sf_dir):
    return _replay(
        stream_session_agg(
            _events_stream(spark, sf_dir), gap=f"{GAP_MS} milliseconds", agg_type="min"
        ),
        "complete",
    )


SLIDE_MS = 1_800_000  # 30 min slide over 1h windows → overlap factor 2


def _stream_sliding_fn(spark, sf_dir):
    cfg = TimeSeriesConfig(aggregation_type="min", bucket_size_msec=HOUR)
    return _replay(
        stream_bucket_agg(_events_stream(spark, sf_dir), cfg, slide_msec=SLIDE_MS),
        "complete",
    )


def _stream_latest_fn(spark, sf_dir):
    from ..streaming import stream_latest_dedup

    return _replay(stream_latest_dedup(_events_stream(spark, sf_dir)), "complete")


# Streaming D10 replay: append-mode output holds back sessions still
# inside the watermark horizon at end-of-replay, so both engines keep
# only windows ending before a fixed cutoff well clear of the stream
# tail (events span Jan 2024; horizon = 1h bucket + 10min watermark).
CUTOFF_MS = 1_706_227_200_000  # 2024-01-26T00:00:00Z


def _stream_windows_fn(spark, sf_dir):
    from ..streaming import stream_anomaly_windows

    cfg = TimeSeriesConfig(aggregation_type="min", bucket_size_msec=HOUR)
    out = stream_anomaly_windows(
        _events_stream(spark, sf_dir), cfg, upper=250.0, lower=5.0,
        score_threshold=2.0,
    )
    return _replay(out, "append").filter(F.col("end_ts_ms") < CUTOFF_MS)


# Islands are TIME-based (split when the bucket gap exceeds one bucket),
# not row-based: a missing in-between bucket (hour with no events) splits
# the window, exactly as the session gap does in the streaming plan.
_STREAM_WINDOWS_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    f"MIN(value) AS value FROM series GROUP BY series_key, ts_ms - ts_ms % {HOUR}), "
    "sc AS (SELECT series_key, ts_ms, CASE WHEN value > 250.0 THEN value - 250.0 "
    "WHEN value < 5.0 THEN 5.0 - value ELSE 0.0 END AS score FROM g), "
    "an AS (SELECT * FROM sc WHERE score >= 2.0), "
    "br AS (SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER "
    f"(PARTITION BY series_key ORDER BY ts_ms) > {HOUR} THEN 1 ELSE 0 END AS brk FROM an), "
    "ab AS (SELECT *, SUM(brk) OVER (PARTITION BY series_key ORDER BY ts_ms "
    "ROWS UNBOUNDED PRECEDING) AS isl FROM br), "
    "agg AS (SELECT series_key, isl, MIN(ts_ms) AS start_ts_ms, MAX(ts_ms) AS end_ts_ms, "
    "MAX(score) AS anomaly_score FROM ab GROUP BY series_key, isl) "
    "SELECT a.series_key, a.start_ts_ms, a.end_ts_ms, MIN(b.ts_ms) AS exact_ts_ms, "
    "a.anomaly_score FROM agg a JOIN ab b ON b.series_key = a.series_key "
    "AND b.isl = a.isl AND b.score = a.anomaly_score "
    f"WHERE a.end_ts_ms < {CUTOFF_MS} "
    "GROUP BY a.series_key, a.start_ts_ms, a.end_ts_ms, a.anomaly_score"
)


def _stream_scores_fn(spark, sf_dir):
    # min buckets: order-free exact doubles, so the scoring recurrence's
    # inputs (and hence its float64 trajectory) are engine-portable
    cfg = TimeSeriesConfig(aggregation_type="min", bucket_size_msec=HOUR)
    return _replay(
        streaming_bucket_scores(_events_stream(spark, sf_dir), cfg), "append"
    )


# Oracle for the fused stateful op (bucket min → derivative EMA score,
# trailing open bucket withheld): the scorer's exact recurrence as a
# recursive CTE. The per-series ``rn < n`` exclusion mirrors the engine
# exactly: streaming_bucket_scores finalizes a bucket only when THAT
# series receives a point from a later bucket (arrival-driven, no
# watermark involved), so each series' final bucket is withheld at
# end-of-replay regardless of where the series ends relative to the
# stream tail. The recurrence is prefix-causal, so the exclusion
# cannot perturb earlier scores. Base case duplicates d_1 into d_0 (batch convention);
# Welford state (wn, wmean, wm2) advances with the same op order as
# streaming/stateful.py::_Scorer._add_stat, so scores match bit-for-bit.
# CAST(0.0 AS DOUBLE): a bare 0.0 literal types the recursion's wm2
# column as DECIMAL and silently truncates every accumulation.
_ALPHA = 0.2
_BETA = repr(1.0 - _ALPHA)

_STREAM_SCORES_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), "
    f"gm AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    f"MIN(value) AS value FROM series GROUP BY 1, 2), "
    "gn AS (SELECT *, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM gm), "
    "gf AS (SELECT series_key, ts_ms, value, rn FROM gn WHERE rn < n), "
    "dd AS (SELECT series_key, ts_ms, value, rn, "
    "ABS(value - LAG(value) OVER w) / "
    "(CASE WHEN (ts_ms - LAG(ts_ms) OVER w) = 0 THEN 1000 "
    "ELSE ts_ms - LAG(ts_ms) OVER w END / 1000.0) AS d_raw "
    "FROM gf WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms)), "
    "d AS (SELECT *, COALESCE(d_raw, LEAD(d_raw) OVER "
    "(PARTITION BY series_key ORDER BY ts_ms)) AS d FROM dd), "
    "e AS (SELECT series_key, ts_ms, value, rn, d, d AS ema, "
    "CAST(1 AS BIGINT) AS wn, d AS wmean, CAST(0.0 AS DOUBLE) AS wm2 "
    "FROM d WHERE rn = 1 "
    "UNION ALL "
    # rn=2 copies d into the EMA (scorer's cnt==1 branch assigns, not
    # blends: a*d + (1-a)*d rounds differently from d for some doubles)
    f"SELECT o.series_key, o.ts_ms, o.value, o.rn, o.d, "
    f"CASE WHEN e.rn = 1 THEN o.d ELSE {_ALPHA}*o.d + {_BETA}*e.ema END, "
    "e.wn + 1, "
    "e.wmean + (o.d - e.wmean)/(e.wn + 1), "
    "e.wm2 + (o.d - e.wmean)*(o.d - (e.wmean + (o.d - e.wmean)/(e.wn + 1))) "
    "FROM d o JOIN e ON o.series_key = e.series_key AND o.rn = e.rn + 1) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN wn >= 2 AND SQRT(wm2/(wn - 1)) > 0 "
    "THEN ABS(d - ema)/SQRT(wm2/(wn - 1)) ELSE 0.0 END AS score "
    "FROM e"
)


_STREAM_AGG_SQL = (
    f"{_S} SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    f"MIN(value) AS value FROM series GROUP BY series_key, ts_ms - ts_ms % {HOUR}"
)

# Session windows as gaps-and-islands: a row starts a new session when
# its gap to the previous row is > GAP_MS (Spark merges inclusively — an
# event exactly GAP_MS after the last one extends the session; pinned by
# tests/test_properties.py::test_session_window_islands_match_reference);
# session end = last ts + gap.
_STREAM_SESSION_SQL = (
    f"{_S}, x AS (SELECT series_key, ts_ms, seq, value, CASE WHEN "
    f"ts_ms - LAG(ts_ms) OVER w > {GAP_MS} OR "
    "LAG(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s FROM series "
    "WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms, seq)), "
    "y AS (SELECT *, SUM(new_s) OVER (PARTITION BY series_key ORDER BY ts_ms, seq "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM x) "
    "SELECT series_key, MIN(ts_ms) AS session_start_ms, "
    f"MAX(ts_ms) + {GAP_MS} AS session_end_ms, COUNT(*) AS n_points, "
    "MIN(value) AS value FROM y GROUP BY series_key, sid"
)


# each point lands in 2 overlapping hourly windows: its 30-min anchor
# and the one before (same shape as the batch ts_sliding_window oracle)
_STREAM_SLIDING_SQL = (
    f"{_S}, e AS (SELECT series_key, unnest(["
    f"ts_ms - ts_ms % {SLIDE_MS}, ts_ms - ts_ms % {SLIDE_MS} - {SLIDE_MS}"
    "]) AS ts_ms, value FROM series) "
    "SELECT series_key, ts_ms, MIN(value) AS value FROM e GROUP BY series_key, ts_ms"
)


def _stream_enrich_fn(spark, sf_dir):
    """Stream-static enrichment join: the unbounded events stream joined
    to the static ``customer`` dimension (broadcast — the classic
    fact-stream × dimension shape; the static side is re-read per
    micro-batch by Spark, no state involved), then aggregated per
    (event_type, market segment). Decimal accumulation keeps the sum
    order-free exact."""
    from ..operators.retrieval import events_ts_ms

    batch, ev = _events_raw_stream(spark, sf_dir)
    cust = F.broadcast(
        spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
    )
    j = ev.join(cust, ev["user_id"] == cust["c_custkey"])
    agg = j.groupBy("event_type", "c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return _replay(agg, "complete")


def _stream_stream_join_fn(spark, sf_dir):
    """Stream-stream self-join with a time-interval condition: each
    click joined to the same user's error events in the trailing day.
    Both sides carry watermarks and the join bound is on event-time
    columns, so Spark can evict join state as the watermark advances —
    the 100 TB shape for correlating two unbounded streams. Inner joins
    emit matches as both sides arrive; the availableNow replay therefore
    produces the complete (batch-identical) pair set."""
    from ..operators.retrieval import events_ts_ms

    batch, ev = _events_raw_stream(spark, sf_dir)
    ms = events_ts_ms(batch)
    base = ev.select(
        "event_type",
        "user_id",
        "event_id",
        ms.alias("ms"),
        F.timestamp_millis(ms).alias("event_time"),
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .withWatermark("event_time", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ms").alias("c_ms"),
            F.col("event_time").alias("c_time"),
        )
    )
    errors = (
        base.filter(F.col("event_type") == "error")
        .withWatermark("event_time", "10 minutes")
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("e_user"),
            F.col("ms").alias("e_ms"),
            F.col("event_time").alias("e_time"),
        )
    )
    j = clicks.join(
        errors,
        (F.col("c_user") == F.col("e_user"))
        & (F.col("e_time") >= F.col("c_time") - F.expr("INTERVAL 1 DAY"))
        & (F.col("e_time") <= F.col("c_time")),
    )
    out = j.select("click_id", "err_id", "c_ms", "e_ms")
    return _replay(out, "append")


_STREAM_SS_JOIN_SQL = (
    "WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type "
    "FROM events) "
    "SELECT c.event_id AS click_id, r.event_id AS err_id, c.ms AS c_ms, "
    "r.ms AS e_ms FROM e c JOIN e r ON c.event_type = 'click' "
    "AND r.event_type = 'error' AND r.user_id = c.user_id "
    f"AND r.ms BETWEEN c.ms - {86_400_000} AND c.ms"
)


_STREAM_ENRICH_SQL = (
    "SELECT event_type, c_mktsegment, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM events JOIN customer ON user_id = c_custkey "
    "GROUP BY event_type, c_mktsegment"
)




def _stream_ph_fn(spark, sf_dir):
    from ..streaming import streaming_page_hinkley

    return _replay(streaming_page_hinkley(_events_stream(spark, sf_dir)), "append")


# Oracle for the causal streaming Page-Hinkley: the recurrence as a
# recursive CTE carrying (s, up, dn, mn, mx) in (ts_ms, seq) order.
# Running (not global) range feeds both the allowance delta and the
# normalizer — every float expression inlined in the same op order as
# the kernel, so the replay is bit-exact.
_STREAM_PH_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), st AS (SELECT series_key, ts_ms, value, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms, seq) AS rn "
    "FROM series), "
    "r AS (SELECT series_key, ts_ms, value, rn, value AS s, "
    "CAST(0.0 AS DOUBLE) AS up, CAST(0.0 AS DOUBLE) AS dn, "
    "value AS mn, value AS mx, CAST(0.0 AS DOUBLE) AS score "
    "FROM st WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, "
    "r.s + o.value, "
    "GREATEST(r.up + ((o.value - (r.s + o.value) / o.rn) "
    "- 0.02 * (GREATEST(r.mx, o.value) - LEAST(r.mn, o.value))), 0.0), "
    "GREATEST(r.dn + (((r.s + o.value) / o.rn - o.value) "
    "- 0.02 * (GREATEST(r.mx, o.value) - LEAST(r.mn, o.value))), 0.0), "
    "LEAST(r.mn, o.value), GREATEST(r.mx, o.value), "
    "CASE WHEN GREATEST(r.mx, o.value) - LEAST(r.mn, o.value) > 0 THEN "
    "GREATEST("
    "GREATEST(r.up + ((o.value - (r.s + o.value) / o.rn) "
    "- 0.02 * (GREATEST(r.mx, o.value) - LEAST(r.mn, o.value))), 0.0), "
    "GREATEST(r.dn + (((r.s + o.value) / o.rn - o.value) "
    "- 0.02 * (GREATEST(r.mx, o.value) - LEAST(r.mn, o.value))), 0.0)) "
    "/ (GREATEST(r.mx, o.value) - LEAST(r.mn, o.value)) ELSE 0.0 END "
    "FROM st o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, value, score FROM r"
)


def _stream_counter_rate_fn(spark, sf_dir):
    from ..streaming import streaming_counter_rate

    return _replay(
        streaming_counter_rate(_events_stream(spark, sf_dir), HOUR), "append"
    )


# Oracle for the stateful counter rate: per-bucket MAX (order-free,
# exact), per-series final bucket withheld (arrival-driven finalize,
# same rn < n exclusion as the stateful scorer), first finalized bucket
# seeds the baseline and emits nothing (pv IS NULL filter). increase is
# one subtraction of exact doubles; rate one division — bit-exact.
_STREAM_COUNTER_RATE_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms - ts_ms % {HOUR} AS ts_ms, "
    f"MAX(value) AS value FROM series GROUP BY 1, 2), "
    "gn AS (SELECT *, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM g), "
    "d AS (SELECT series_key, ts_ms, value, LAG(value) OVER "
    "(PARTITION BY series_key ORDER BY ts_ms) AS pv FROM gn WHERE rn < n) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN value >= pv THEN value - pv ELSE value END AS increase, "
    "(CASE WHEN value >= pv THEN value - pv ELSE value END) / 3600.0 "
    "AS rate_per_sec FROM d WHERE pv IS NOT NULL"
)




B6 = 6 * HOUR


def _stream_m4_fn(spark, sf_dir):
    from ..streaming import stream_m4

    return _replay(stream_m4(_events_stream(spark, sf_dir), B6), "complete")


# Oracle: the batch M4 SQL (complete-mode replay emits every window, so
# stream == batch exactly; all eight reductions are order-free argmin/
# argmax with explicit tie-breaks).
_STREAM_M4_SQL = (
    f"{_S}, pt AS (SELECT series_key, ts_ms - ts_ms % {B6} AS b, "
    "ts_ms, value, seq FROM series), "
    "r AS (SELECT *, "
    "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY ts_ms, seq) AS rf, "
    "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY ts_ms DESC, seq DESC) AS rl, "
    "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY value, ts_ms) AS rmin, "
    "ROW_NUMBER() OVER (PARTITION BY series_key, b ORDER BY value DESC, ts_ms) AS rmax "
    "FROM pt) "
    "SELECT series_key, b AS bucket_ms, "
    "MIN(CASE WHEN rf = 1 THEN ts_ms END) AS ts_first, "
    "MIN(CASE WHEN rf = 1 THEN value END) AS v_first, "
    "MIN(CASE WHEN rl = 1 THEN ts_ms END) AS ts_last, "
    "MIN(CASE WHEN rl = 1 THEN value END) AS v_last, "
    "MIN(CASE WHEN rmin = 1 THEN ts_ms END) AS ts_min, "
    "MIN(CASE WHEN rmin = 1 THEN value END) AS v_min, "
    "MIN(CASE WHEN rmax = 1 THEN ts_ms END) AS ts_max, "
    "MIN(CASE WHEN rmax = 1 THEN value END) AS v_max "
    "FROM r GROUP BY series_key, b"
)




CD_MS = 30 * 60 * 1000


def _stream_debounce_fn(spark, sf_dir):
    from ..streaming import streaming_debounce

    return _replay(
        streaming_debounce(_events_stream(spark, sf_dir), CD_MS), "append"
    )


# Kept rows emit at arrival (no open bucket), so the replay equals the
# batch debounce recursion exactly — same recursive CTE as ts_debounce.
_STREAM_DEBOUNCE_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), "
    "o AS (SELECT series_key, ts_ms, value, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms, seq) AS rn FROM series), "
    "r AS (SELECT series_key, ts_ms, value, rn, ts_ms AS lk, 1 AS kept "
    "FROM o WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, "
    f"CASE WHEN o.ts_ms - r.lk >= {CD_MS} THEN o.ts_ms ELSE r.lk END, "
    f"CASE WHEN o.ts_ms - r.lk >= {CD_MS} THEN 1 ELSE 0 END "
    "FROM o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, value FROM r WHERE kept = 1"
)




def _stream_ohlc_fn(spark, sf_dir):
    from ..streaming.aggregate import stream_ohlc

    return _replay(stream_ohlc(_events_stream(spark, sf_dir)), "complete")


_GAP_MS = 2 * HOUR


def _stream_gap_fn(spark, sf_dir):
    from ..streaming.stateful import streaming_gap_detect

    return _replay(
        streaming_gap_detect(_events_stream(spark, sf_dir), _GAP_MS), "append"
    )


# Alerts emit at arrival of the closing point, so the replay equals the
# batch lead-window watchdog exactly (same SQL as ts_gap_detect).
_STREAM_GAP_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms AS gap_start_ms, "
    "LEAD(ts_ms) OVER (PARTITION BY series_key ORDER BY ts_ms, seq) AS gap_end_ms "
    "FROM series) "
    "SELECT series_key, gap_start_ms, gap_end_ms, "
    "gap_end_ms - gap_start_ms AS gap_ms FROM g "
    f"WHERE gap_end_ms - gap_start_ms > {_GAP_MS}"
)


def _stream_sla_fn(spark, sf_dir):
    from .timeseries import HEARTBEAT_MS
    from ..streaming.stateful import streaming_heartbeat_sla

    return _replay(
        streaming_heartbeat_sla(_events_stream(spark, sf_dir), HEARTBEAT_MS),
        "append",
    )


# Running SLA emits per point, so the replay equals the batch
# cumulative-window form exactly (and the last row per series equals
# the batch ts_heartbeat_sla summary). Integer SUMs CAST AS BIGINT
# (DuckDB HUGEINT / pandas-float64 rule — scripts/dtype_audit.py).
_STREAM_SLA_SQL = (
    f"{_S}, g AS (SELECT series_key, ts_ms, seq, "
    "ts_ms - LAG(ts_ms) OVER w AS gap, "
    "MIN(ts_ms) OVER w2 AS first_ts, "
    "ROW_NUMBER() OVER w AS n_points "
    "FROM series WINDOW w AS (PARTITION BY series_key ORDER BY ts_ms, seq), "
    "w2 AS (PARTITION BY series_key ORDER BY ts_ms, seq "
    "ROWS UNBOUNDED PRECEDING), "
    "c AS (PARTITION BY series_key ORDER BY ts_ms, seq "
    "ROWS UNBOUNDED PRECEDING)), "
    "r AS (SELECT series_key, ts_ms, n_points, "
    f"CAST(COALESCE(SUM(CASE WHEN gap > {HOUR} THEN 1 ELSE 0 END) OVER c, 0) AS BIGINT) AS n_violations, "
    f"CAST(COALESCE(SUM(GREATEST(gap - {HOUR}, 0)) OVER c, 0) AS BIGINT) AS downtime_ms, "
    "ts_ms - first_ts AS span "
    "FROM g WINDOW c AS (PARTITION BY series_key ORDER BY ts_ms, seq "
    "ROWS UNBOUNDED PRECEDING)) "
    "SELECT series_key, ts_ms, n_points, n_violations, downtime_ms, "
    "CASE WHEN span > 0 THEN 1.0 - CAST(downtime_ms AS DOUBLE) / "
    "CAST(span AS DOUBLE) END AS uptime_ratio FROM r"
)


def _stream_bollinger_fn(spark, sf_dir):
    from ..streaming.stateful import streaming_bollinger

    return _replay(streaming_bollinger(_events_stream(spark, sf_dir)), "append")


# Seen-so-far trailing-hour bands: the streaming kernel can only see
# points that ARRIVED before the current one, so the oracle bounds the
# window by (ts, seq) lexicographically — identical to the batch
# ts_bollinger_bands RANGE window whenever (series, ts) is unique
# (true of the fixtures); deliberately divergent under same-ts peers.
_STREAM_BOLL_SQL = (
    f"{_S}, "
    "s2 AS (SELECT series_key, ts_ms, seq, value, "
    "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v100 FROM series), "
    "w AS (SELECT p.series_key, p.ts_ms, p.seq, p.value, "
    "COUNT(*) AS n, SUM(q.v100) AS a, SUM(q.v100 * q.v100) AS b "
    "FROM s2 p JOIN s2 q ON q.series_key = p.series_key "
    "AND q.ts_ms >= p.ts_ms - 3600000 "
    "AND (q.ts_ms < p.ts_ms OR (q.ts_ms = p.ts_ms AND q.seq <= p.seq)) "
    "GROUP BY 1, 2, 3, 4), "
    "bands AS (SELECT series_key, ts_ms, seq, value, "
    "CAST(n AS BIGINT) AS n_in_hour, "
    "CAST(a AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean, "
    "sqrt(CAST(n * b - a * a AS DOUBLE) / CAST(n * n * 10000 AS DOUBLE)) AS std "
    "FROM w) "
    "SELECT series_key, ts_ms, seq, value, n_in_hour, mean, std, "
    "mean + 2.0 * std AS upper, mean - 2.0 * std AS lower, "
    "CAST(CASE WHEN value > mean + 2.0 * std THEN 1 "
    "WHEN value < mean - 2.0 * std THEN -1 ELSE 0 END AS BIGINT) AS breakout "
    "FROM bands"
)


QUERIES: dict[str, QuerySpec] = {
    "stream_ohlc_replay": QuerySpec(_stream_ohlc_fn, _OHLC_REPLAY_SQL),
    # r7: live Bollinger bands (trailing-hour state, seen-so-far window)
    "stream_bollinger_replay": QuerySpec(_stream_bollinger_fn, _STREAM_BOLL_SQL),
    "stream_bucket_agg_replay": QuerySpec(_stream_agg_fn, _STREAM_AGG_SQL),
    "stream_sliding_agg_replay": QuerySpec(_stream_sliding_fn, _STREAM_SLIDING_SQL),
    "stream_anomaly_windows_replay": QuerySpec(
        _stream_windows_fn, _STREAM_WINDOWS_SQL
    ),
    "stream_latest_dedup_replay": QuerySpec(
        _stream_latest_fn,
        # A15 semantics — identical to the batch ts_latest_dedup oracle
        f"{_S} SELECT series_key, ts_ms, arg_max(value, seq) AS value "
        "FROM series GROUP BY series_key, ts_ms",
    ),
    "stream_session_agg_replay": QuerySpec(_stream_session_fn, _STREAM_SESSION_SQL),
    "stream_bucket_scores_replay": QuerySpec(_stream_scores_fn, _STREAM_SCORES_SQL),
    "stream_static_join_replay": QuerySpec(_stream_enrich_fn, _STREAM_ENRICH_SQL),
    # r6: streaming seasonal monitor (static profile x live stream);
    # same oracle as the batch ts_seasonal_anomaly — replay-identical
    "stream_seasonal_anomaly_replay": QuerySpec(
        _stream_seasonal_fn, _SEASONAL_ANOMALY_REPLAY_SQL
    ),
    # r6: CDC -> live SCD2 (closed versions; oracle = batch history
    # minus is_current — the open version lives only in state)
    "stream_scd2_replay": QuerySpec(_stream_scd2_fn, _SCD2_CLOSED_SQL),
    "stream_stream_join_replay": QuerySpec(
        _stream_stream_join_fn, _STREAM_SS_JOIN_SQL
    ),
    # extension: stateful streaming counter rate over bucket maxima
    "stream_counter_rate_replay": QuerySpec(
        _stream_counter_rate_fn, _STREAM_COUNTER_RATE_SQL
    ),
    # extension: streaming M4 downsampling (batch-identical argmin/argmax agg)
    "stream_m4_replay": QuerySpec(_stream_m4_fn, _STREAM_M4_SQL),
    # extension: streaming cooldown debounce (immediate emission)
    "stream_debounce_replay": QuerySpec(_stream_debounce_fn, _STREAM_DEBOUNCE_SQL),
    # extension: streaming silence watchdog (O(1) state per series;
    # replay equals the batch lead-window gap detector)
    "stream_gap_detect_replay": QuerySpec(_stream_gap_fn, _STREAM_GAP_SQL),
    # causal Page-Hinkley per-point scoring (running-range allowance)
    "stream_page_hinkley_replay": QuerySpec(_stream_ph_fn, _STREAM_PH_SQL),
    # r4: live availability SLA (O(1) state/series; running per-point
    # emission — replay equals the batch cumulative-window form)
    "stream_heartbeat_sla_replay": QuerySpec(_stream_sla_fn, _STREAM_SLA_SQL),
}


def _stream_cusum_fn(spark, sf_dir):
    """Deployed CUSUM: calibrate (median, range, allowance) in batch
    over history, broadcast the ≤1-row-per-series profile into the
    stream, run the O(1)-state (s+, s−) recurrence live. Replaying the
    same events the profile was calibrated on reproduces the batch
    detector bit-for-bit, so this entry shares det_cusum's
    recursive-CTE oracle."""
    from ..streaming import streaming_cusum
    from ..streaming.stateful import cusum_profile
    from .common import events_frame

    profile = cusum_profile(
        events_frame(spark, sf_dir), allowance_frac=_CUSUM_ALLOWANCE
    )
    return _replay(
        streaming_cusum(_events_stream(spark, sf_dir), profile), "append"
    )


# Oracle for the deployed CUSUM: profile (LOW median by (value, ts_ms),
# global range, k = allowance·range) computed over the SAME raw series
# the stream replays, then the (s+, s−) recurrence as a recursive CTE in
# (ts_ms, seq) order — every float op in the kernel's order, so the
# replay is bit-exact. (det_cusum's oracle is NOT reusable here: that
# entry scores the hourly-avg frame; the stream scores raw points.)
# The allowance constant is shared between the Spark profile call above
# and this SQL through flit() — the bare-literal path converts
# decimal→double with an extra rounding (ADVICE r7), and a non-default
# allowance_frac would silently diverge from a hard-coded 0.05.
_CUSUM_ALLOWANCE = 0.05
_STREAM_CUSUM_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), "
    "m AS (SELECT series_key, value, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY value, ts_ms) AS vr, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n, "
    "MAX(value) OVER (PARTITION BY series_key) - "
    "MIN(value) OVER (PARTITION BY series_key) AS rng FROM series), "
    "pr AS (SELECT series_key, MIN(value) AS mu, ANY_VALUE(rng) AS rng "
    "FROM m WHERE vr = (n + 1) // 2 GROUP BY series_key), "
    "st AS (SELECT series_key, ts_ms, value, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY ts_ms, seq) AS rn "
    "FROM series), "
    "d AS (SELECT st.series_key, st.ts_ms, st.value, st.rn, pr.rng, "
    f"(st.value - pr.mu) - {flit(_CUSUM_ALLOWANCE)} * pr.rng AS dp, "
    f"(pr.mu - st.value) - {flit(_CUSUM_ALLOWANCE)} * pr.rng AS dn "
    "FROM st JOIN pr USING (series_key)), "
    "r AS (SELECT series_key, ts_ms, value, rn, rng, "
    "GREATEST(0.0 + dp, 0.0) AS sp, GREATEST(0.0 + dn, 0.0) AS sn "
    "FROM d WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.value, o.rn, o.rng, "
    "GREATEST(r.sp + o.dp, 0.0), GREATEST(r.sn + o.dn, 0.0) "
    "FROM d o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, value, "
    "CASE WHEN rng > 0 THEN GREATEST(sp, sn) / rng ELSE 0.0 END AS score "
    "FROM r"
)

QUERIES["stream_cusum_replay"] = QuerySpec(_stream_cusum_fn, _STREAM_CUSUM_SQL)


def _stream_macd_fn(spark, sf_dir):
    from ..streaming import streaming_macd

    return _replay(streaming_macd(_events_stream(spark, sf_dir)), "append")


from .common import flit as _flm  # noqa: E402
from ..detectors.sequential import (  # noqa: E402
    MACD_A_FAST as _SMAF, MACD_B_FAST as _SMBF,
    MACD_A_SLOW as _SMAS, MACD_B_SLOW as _SMBS,
    MACD_A_SIG as _SMAG, MACD_B_SIG as _SMBG,
)

# Causal streaming MACD over RAW events: the (ef, es, sig) recurrence
# as a recursive CTE in (ts_ms, seq) order; constants through flit()
# (correctly-rounded string→double parse — the bare-literal path is a
# 1-ulp trap, see catalog/detectors._MACD_SQL).
_STREAM_MACD_SQL = (
    f"WITH RECURSIVE series AS ({EVENTS_SQL}), "
    "o AS (SELECT series_key, ts_ms, value AS v, ROW_NUMBER() OVER "
    "(PARTITION BY series_key ORDER BY ts_ms, seq) AS rn FROM series), "
    "r AS (SELECT series_key, ts_ms, v, rn, v AS ef, v AS es, "
    "CAST(0.0 AS DOUBLE) AS sig FROM o WHERE rn = 1 "
    "UNION ALL "
    "SELECT o.series_key, o.ts_ms, o.v, o.rn, "
    f"{_flm(_SMAF)} * o.v + {_flm(_SMBF)} * r.ef, "
    f"{_flm(_SMAS)} * o.v + {_flm(_SMBS)} * r.es, "
    f"{_flm(_SMAG)} * (({_flm(_SMAF)} * o.v + {_flm(_SMBF)} * r.ef) - "
    f"({_flm(_SMAS)} * o.v + {_flm(_SMBS)} * r.es)) + {_flm(_SMBG)} * r.sig "
    "FROM o JOIN r ON o.series_key = r.series_key AND o.rn = r.rn + 1) "
    "SELECT series_key, ts_ms, v AS value, ef - es AS macd, sig AS signal, "
    "(ef - es) - sig AS histogram FROM r"
)

QUERIES["stream_macd_replay"] = QuerySpec(_stream_macd_fn, _STREAM_MACD_SQL)
