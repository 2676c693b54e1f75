from sopspark.streaming.pipeline import (
    stream_parse_nquads,
    stream_canonical_lines,
    windowed_event_counts,
    stateful_turn_progress,
)

__all__ = [
    "stream_parse_nquads",
    "stream_canonical_lines",
    "windowed_event_counts",
    "stateful_turn_progress",
]
