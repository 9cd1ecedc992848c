"""Structured Streaming programs (reference Phase 3: streaming parity)."""

from .core import run_to_completion, stream_table
from .identity import identity_pipe_json
from .windows import session_counts, sliding_counts, tumbling_counts, with_event_time
from .wordcount_stream import chained_aggregation, start_update_query, streaming_word_counts

__all__ = [
    "run_to_completion", "stream_table", "identity_pipe_json",
    "session_counts", "sliding_counts", "tumbling_counts", "with_event_time",
    "chained_aggregation", "start_update_query", "streaming_word_counts",
]
