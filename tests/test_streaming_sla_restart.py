"""Fault tolerance for the streaming heartbeat SLA: the running
counters (first/last ts, violations, downtime) live in the checkpointed
state store, so a restarted replay must continue the SLA curve exactly
where it left off — and the final row per series must equal the batch
heartbeat_sla summary over all rows."""

from __future__ import annotations

import time

from potoos_spark.streaming.stateful import streaming_heartbeat_sla

SCHEMA = "series_key string, ts_ms bigint, value double, seq bigint"
BASE = 1_700_000_000_000
TH = 60_000  # 1-minute heartbeat


def _rows(lo, hi):
    # normal cadence 10s, with silences >TH injected at i=40 (pre-restart)
    # and i=120 (post-restart, so downtime accrues on BOTH sides of the
    # checkpoint boundary)
    out = []
    t = BASE
    for i in range(lo, hi):
        if i in (40, 120):
            t += 150_000  # 2.5 min silence: violation, 90s downtime
        else:
            t += 10_000
        out.append(("a", t, 1.0, i))
    return out


def _reference(rows):
    first = last = None
    viol = down = n = 0
    out = {}
    for _, t, _, _ in rows:
        if last is not None:
            gap = t - last
            if gap > TH:
                viol += 1
                down += gap - TH
        else:
            first = t
        last = t
        n += 1
        span = last - first
        out[t] = (n, viol, down, 1.0 - down / span if span > 0 else None)
    return out


def test_sla_counters_resume_from_checkpoint(spark, tmp_path):
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_available():
        sdf = streaming_heartbeat_sla(
            spark.readStream.schema(SCHEMA).parquet(str(src)), TH
        )
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)

    all_rows = _rows(0, 200)
    spark.createDataFrame(all_rows[:100], SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()
    time.sleep(1.1)
    spark.createDataFrame(all_rows[100:], SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    run_available()

    got = {
        r["ts_ms"]: (
            r["n_points"], r["n_violations"], r["downtime_ms"], r["uptime_ratio"]
        )
        for r in spark.read.parquet(out).collect()
    }
    assert got == _reference(all_rows)
    # the final emitted row equals the batch heartbeat_sla summary
    from potoos_spark.operators.rate import heartbeat_sla

    batch = heartbeat_sla(
        spark.createDataFrame(all_rows, SCHEMA), TH
    ).collect()[0]
    last_ts = max(got)
    n, viol, down, ratio = got[last_ts]
    assert (n, viol, down) == (
        batch["n_points"], batch["n_violations"], batch["downtime_ms"]
    )
    assert ratio == batch["uptime_ratio"]
