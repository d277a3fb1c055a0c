"""Structured Streaming surface — continuous group statistics.

The reference is batch-only (SURVEY §2.8: no streaming, no watermarks).
This module gives the engine a streaming ingest path: the same group
keyers + group-count aggregations over an unbounded source, with
event-time windows and late-data handling.
"""

from dataset_grouper_spark.streaming.group_counts import (
    session_group_counts,
    streaming_group_counts,
    windowed_group_counts,
)
from dataset_grouper_spark.streaming.joins import stream_interval_attribution

__all__ = [
    "streaming_group_counts",
    "windowed_group_counts",
    "session_group_counts",
    "stream_interval_attribution",
]
