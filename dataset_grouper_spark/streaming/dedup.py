"""Streaming exact dedup — continuous content-hash deduplication.

Batch exact_dedup (operators/dedup.py) keeps one canonical row per
content hash. On an unbounded stream, unbounded dedup state is
impossible; the standard contract is dedup-within-watermark: a
duplicate arriving within the watermark horizon of its original is
dropped, and state for expired windows is reclaimed. Built directly on
``dropDuplicatesWithinWatermark`` so the state store handles TTL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    content_col: str,
    time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose content hash was already seen within the
    watermark horizon. Adds ``_h`` internally; output schema equals the
    input schema."""
    hashed = stream.withColumn(
        "_h", F.md5(F.col(content_col))
    ).withWatermark(time_col, watermark)
    return hashed.dropDuplicatesWithinWatermark(["_h"]).drop("_h")
