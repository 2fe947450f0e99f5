"""Structured Streaming equivalents of the reference's streaming
semantics (SURVEY.md §2.C, §2.I)."""

from connect_spark.streaming.window import system_window_stream
from connect_spark.streaming.dedupe import streaming_dedupe

__all__ = ["system_window_stream", "streaming_dedupe"]
