"""Structured Streaming operators (extension surface; SURVEY §2.9 X6)."""

from data_toolz_spark.streaming.events import (
    read_events_stream,
    windowed_event_counts,
    sessionize_stream,
    running_user_totals_stream,
    run_to_memory_sink,
)

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "sessionize_stream",
    "running_user_totals_stream",
    "run_to_memory_sink",
]
