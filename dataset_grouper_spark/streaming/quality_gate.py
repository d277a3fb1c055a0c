"""Streaming ingest gate: dead-letter routing on a live stream.

``quarantine_batch_writer`` turns a constraint suite
(`operators.expectations`) into a ``foreachBatch`` hook: every
micro-batch splits row-level into good/bad (ONE projection — see
``expectations.quarantine``), good rows flow to the main sink, bad
rows land in a quarantine directory WITH the names of the checks they
violated — the triage loop every production ingest pipeline runs.

Honest contract: the parquet appends here are AT-LEAST-ONCE across
crash replays (a batch that commits one side and crashes before the
other, or before the stream checkpoint, re-appends on recovery).
When exactly-once matters, point the good side at the Delta/Iceberg
epoch sinks (``delta_append_txn`` / ``iceberg_append_epoch``) — the
split composes with any sink.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.operators.expectations import (
    Check,
    quarantine,
)

__all__ = ["quarantine_batch_writer"]


def quarantine_batch_writer(
    checks: list[Check], good_path: str, bad_path: str
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function routing each micro-batch through
    the row-level suite: passing rows append under ``good_path``,
    failing rows under ``bad_path`` with ``failed_checks`` flattened
    to a ``|``-joined string (parquet-friendly, ordered by suite
    declaration)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        good, bad = quarantine(batch_df, checks)
        good.write.mode("append").parquet(good_path)
        (
            bad.withColumn(
                "failed_checks", F.concat_ws("|", "failed_checks")
            )
            .write.mode("append")
            .parquet(bad_path)
        )

    return write
