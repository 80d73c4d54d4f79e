"""Streaming surface: event-time windows + the reference's count-or-time
hybrid windowed publisher (SURVEY.md §2 Part A A5-A8, Part B keys 40-45)."""

from reactor_window_like_flink_spark.streaming.publisher import WindowedPublisher
from reactor_window_like_flink_spark.streaming.stateful import (
    count_or_time_stateful,
)
from reactor_window_like_flink_spark.streaming.windows import REG as STREAMING_REG

__all__ = ["STREAMING_REG", "WindowedPublisher", "count_or_time_stateful"]
