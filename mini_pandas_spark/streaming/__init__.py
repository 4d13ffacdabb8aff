"""Structured Streaming variants of the event-time operators."""

from .windows import (
    read_events_stream,
    session_window_agg,
    streaming_hourly_counts,
)

__all__ = [
    "read_events_stream",
    "streaming_hourly_counts",
    "session_window_agg",
]
