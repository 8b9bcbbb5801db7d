"""Structured Streaming shaped behaviors (SURVEY.md section 2.7)."""

from .events import (
    run_to_memory,
    streaming_event_counts,
    streaming_hopping_counts,
    streaming_session_counts,
    streaming_user_quota,
)

__all__ = [
    "run_to_memory",
    "streaming_event_counts",
    "streaming_hopping_counts",
    "streaming_session_counts",
    "streaming_user_quota",
]
