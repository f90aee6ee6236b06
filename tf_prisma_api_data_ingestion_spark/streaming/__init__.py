"""Structured Streaming layer (SURVEY §7.5 north-star; the reference is a
scheduled batch job with no streaming machinery — §2.4)."""

from .windows import sliding_event_counts, windowed_event_counts  # noqa: F401
