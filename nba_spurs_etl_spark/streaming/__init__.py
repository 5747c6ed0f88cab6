from .events import (
    read_events_stream,
    stream_click_purchase_join,
    stream_click_purchase_left_join,
    run_stream_to_table,
    stream_dedup,
    stream_dedup_within_watermark,
    stream_session_agg,
    stream_sliding_agg,
    stream_static_enrich,
    stream_tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "stream_click_purchase_join",
    "stream_click_purchase_left_join",
    "run_stream_to_table",
    "stream_dedup",
    "stream_dedup_within_watermark",
    "stream_session_agg",
    "stream_sliding_agg",
    "stream_static_enrich",
    "stream_tumbling_agg",
]
