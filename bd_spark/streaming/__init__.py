"""Structured Streaming surface.

The reference's only streaming capability is the incremental
multi-document JSON reader (json.rs:123-160) — it has no watermarks,
windows, or state (SURVEY.md §2.6). Here the same document-stream
model runs on Structured Streaming, plus the windowed / sessionized /
stateful operators a 100 TB event pipeline needs.
"""

from bd_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    read_rate_events,
    run_to_memory,
    sessionized_stats,
    stream_documents,
    stream_interval_join,
    stream_static_enrich,
    user_running_totals,
    user_running_totals_builtin,
    windowed_event_stats,
)
