"""Structured Streaming shaped behaviors (SURVEY.md section 2.7)."""

from .events import streaming_event_counts, streaming_session_counts

__all__ = ["streaming_event_counts", "streaming_session_counts"]
