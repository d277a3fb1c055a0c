"""Streaming group counts — group statistics over an unbounded source.

Same semantics as operators/group_counts.py but over a readStream
DataFrame: per-group running (num_examples, num_bytes, num_words), or
event-time-windowed counts with a watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.functions import textstats


def streaming_group_counts(
    stream: DataFrame,
    key: Column,
    count_cols: list[str] | None = None,
) -> DataFrame:
    """Running per-group totals (complete/update output modes)."""
    keyed = keys.with_group_key(stream, key)
    return keyed.groupBy(keys.GROUP_COL).agg(
        F.count(F.lit(1)).alias("num_examples"),
        F.sum(textstats.row_bytes_expr(stream, count_cols)).alias("num_bytes"),
        F.sum(textstats.row_words_expr(stream, count_cols)).alias("num_words"),
    )


def session_group_counts(
    stream: DataFrame,
    key: Column,
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session-window group counts on a stream: per (group, session)
    where a session closes after ``gap`` of silence. Spark's native
    session_window state merges windows as events arrive; the watermark
    bounds state. The streaming twin of operators/sessions.sessionize.
    """
    keyed = keys.with_group_key(stream, key).withWatermark(time_col, watermark)
    return keyed.groupBy(
        keys.GROUP_COL,
        F.session_window(F.col(time_col), gap).alias("session"),
    ).agg(
        F.count(F.lit(1)).alias("num_examples"),
    )


def windowed_group_counts(
    stream: DataFrame,
    key: Column,
    time_col: str,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    count_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling-window group counts with late-data handling.

    Append-mode capable: the watermark bounds state, so this runs
    indefinitely on an unbounded stream (state per (window, group)).
    """
    keyed = keys.with_group_key(stream, key).withWatermark(time_col, watermark)
    return keyed.groupBy(
        F.window(F.col(time_col), window).alias("time_window"),
        keys.GROUP_COL,
    ).agg(
        F.count(F.lit(1)).alias("num_examples"),
        F.sum(textstats.row_bytes_expr(stream, count_cols)).alias("num_bytes"),
        F.sum(textstats.row_words_expr(stream, count_cols)).alias("num_words"),
    )
