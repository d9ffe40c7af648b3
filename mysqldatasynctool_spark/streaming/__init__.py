from .jobs import (
    read_events_stream,
    streaming_tumbling_counts,
    streaming_sliding_counts,
    streaming_session_windows,
    streaming_dedup_within_watermark,
    streaming_anomaly_zscore,
    streaming_stateful_user_counts,
    streaming_topk_transform_with_state,
    streaming_funnel_join,
    streaming_static_enrichment,
    run_to_memory_sink,
    foreach_batch_parquet_sink,
)

__all__ = [
    "read_events_stream",
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_windows",
    "streaming_dedup_within_watermark",
    "streaming_anomaly_zscore",
    "streaming_stateful_user_counts",
    "streaming_topk_transform_with_state",
    "streaming_funnel_join",
    "streaming_static_enrichment",
    "run_to_memory_sink",
    "foreach_batch_parquet_sink",
]
