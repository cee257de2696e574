"""Structured Streaming surface: live event-time binning (SURVEY
§2.8). See :mod:`mpes_spark.streaming.live` — windowed N-D histogram,
live count rate, and the foreachBatch densify sink.
"""

from mpes_spark.streaming.live import (
    densify_sink,
    live_binning,
    live_count_rate,
    read_event_stream,
    scan_sessions,
    with_event_time,
)
from mpes_spark.streaming.stateful import cumulative_histogram

__all__ = [
    "cumulative_histogram",
    "densify_sink",
    "live_binning",
    "live_count_rate",
    "read_event_stream",
    "scan_sessions",
    "with_event_time",
]
