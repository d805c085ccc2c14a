"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §1.3 — its
streaming test trees are forked non-regression suites); streaming
queries simply fell back to vanilla Spark. Here streaming is
first-class and beyond-parity: watermarked windowed aggregation,
declarative session windows, and a custom stateful sessionizer via
applyInPandasWithState (the pattern for operators Spark lacks).
"""

from gazelle_plugin_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    dedup_stream,
    enrich_stream,
    interval_join,
    sessionize,
    sessionize_stateful,
    stream_events,
    windowed_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "stream_events",
    "windowed_counts",
    "sessionize",
    "sessionize_stateful",
    "dedup_stream",
    "enrich_stream",
    "interval_join",
]
