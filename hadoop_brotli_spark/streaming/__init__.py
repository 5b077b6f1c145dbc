"""Structured Streaming surface: watermarked tumbling/sliding/session
windows and custom stateful operators over the ``events`` stream."""

from .jobs import (  # noqa: F401
    click_purchase_join,
    purchase_click_left_join,
    dedup_events,
    dedup_events_within_watermark,
    read_events_stream,
    session_aggregate,
    sliding_counts,
    stateful_user_counts,
    stateful_user_counts_tws,
    tumbling_counts,
)
