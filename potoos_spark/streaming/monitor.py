"""Streaming monitor: the reference's polling ``monitor()``
(/root/reference/potoos/client.py:113-139) as a continuously-running
incremental query.

Two layers:

* ``monitor_stream`` — full-fidelity: each micro-batch runs the exact
  batch pipeline (retrieval → detector → window extraction → metadata)
  via ``foreachBatch`` and hands the ``AnomalyResult`` to a callback.
  This is the reference's poll loop with Spark managing the trigger
  cadence, exactly-once sink semantics, and restart checkpointing —
  scores within a micro-batch match batch detection bit-for-bit.
* ``score_stream`` — incremental: watermarked bucket aggregation +
  stateful prefix-causal EMA scoring + absolute-threshold flagging as
  one end-to-end streaming plan (no per-batch recomputation; state
  lives in the state store). Use this shape at scale where re-running
  a detector over a widening window per poll is unaffordable.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import DetectorConfig, TimeSeriesConfig
from .stateful import streaming_bucket_scores, streaming_scores


def monitor_stream(
    sdf: DataFrame,
    on_result: Callable[..., None],
    ts_cfg: Optional[TimeSeriesConfig] = None,
    det_cfg: Optional[DetectorConfig] = None,
    checkpoint_dir: Optional[str] = None,
    **trigger_kwargs,
) -> StreamingQuery:
    """Run the batch monitor per micro-batch. ``on_result(result,
    batch_id)`` receives an ``AnomalyResult`` (anomalies/scores/meta
    DataFrames, already computed for the batch's rows)."""
    from ..api import PotoosSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = PotoosSession(batch_df.sparkSession)
        result = sess.monitor(batch_df, ts_cfg, det_cfg)
        if result is not None:
            on_result(result, batch_id)

    writer = sdf.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    return writer.start()


def score_stream(
    sdf: DataFrame,
    ts_cfg: Optional[TimeSeriesConfig] = None,
    det_cfg: Optional[DetectorConfig] = None,
) -> DataFrame:
    """Incremental scoring plan: bucket aggregation + stateful EMA
    scoring fused into ONE stateful pass (``streaming_bucket_scores``),
    then an anomaly flag at ``det_cfg.score_threshold`` (percent-of-max
    thresholds need the future; at stream time an absolute threshold is
    the meaningful contract)."""
    ts_cfg = ts_cfg or TimeSeriesConfig()
    det_cfg = det_cfg or DetectorConfig()
    algorithm = det_cfg.algorithm_name or "derivative_detector"
    alpha = float(det_cfg.algorithm_params.get("smoothing_factor", 0.2))
    if ts_cfg.aggregation_type is not None:
        scored = streaming_bucket_scores(sdf, ts_cfg, algorithm, alpha)
    else:
        scored = streaming_scores(sdf, algorithm, alpha)
    thr = det_cfg.score_threshold
    if thr is not None:
        scored = scored.withColumn("is_anomaly", F.col("score") >= float(thr))
    return scored
