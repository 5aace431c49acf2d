"""Structured-Streaming tier: the batch surface over unbounded streams.

``aggregate`` — watermarked tumbling/sliding/session windows + latest
dedup sharing the batch aggregator table; ``stateful`` — cross-batch
EMA detector state via applyInPandasWithState; ``monitor`` — the
reference's polling monitor as foreachBatch, plus a fully incremental
scoring plan.
"""

from .aggregate import (
    DEFAULT_WATERMARK,
    stream_anomaly_windows,
    stream_bucket_agg,
    stream_latest_dedup,
    stream_m4,
    stream_session_agg,
    with_event_time,
)
from .monitor import monitor_stream, score_stream
from .rollup_sink import compact_rollup_log, read_rollup_log, rollup_log_sink
from .stateful import (
    streaming_bucket_scores,
    streaming_counter_rate,
    streaming_cusum,
    streaming_macd,
    streaming_debounce,
    streaming_page_hinkley,
    streaming_scores,
)

__all__ = [
    "DEFAULT_WATERMARK",
    "stream_anomaly_windows",
    "stream_bucket_agg",
    "stream_latest_dedup",
    "stream_m4",
    "stream_session_agg",
    "with_event_time",
    "monitor_stream",
    "score_stream",
    "rollup_log_sink",
    "read_rollup_log",
    "compact_rollup_log",
    "streaming_bucket_scores",
    "streaming_counter_rate",
    "streaming_cusum",
    "streaming_macd",
    "streaming_debounce",
    "streaming_page_hinkley",
    "streaming_scores",
]
