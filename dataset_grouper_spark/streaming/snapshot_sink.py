"""Streaming ingestion into the versioned snapshot store.

The missing piece incremental.py's docstring names explicitly: parquet
append inside ``foreachBatch`` is not transactional with the stream
checkpoint, so a crash between append and checkpoint-commit replays the
epoch and duplicates rows — "a table format (Delta/Iceberg) would seal
it properly". The snapshot store IS that table format here: every
micro-batch commits as one atomic manifest version TAGGED with its
epoch id, and ``snapshot_append`` treats an already-committed tag as a
no-op — so an epoch replay after a crash lands zero duplicate rows.
Result: exactly-once ingestion (per epoch) into a time-travelable
corpus, with every micro-batch a pinnable version.

At 100 TB: each epoch writes only its own files (O(batch)); the
manifest grows by one entry per epoch — compact the version history
with ``vacuum_snapshots`` on whatever retention the audit needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from dataset_grouper_spark.sinks import snapshots as snap


def stream_append_snapshots(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a streaming DataFrame into the snapshot store at ``path``
    (which must already exist — create it with ``snapshot_write``; the
    schema footer written there is what keeps an all-deleted version
    readable). One snapshot version per non-empty micro-batch, tagged
    ``epoch-<id>`` for replay idempotence."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        snap.snapshot_append(batch, path, tag=f"epoch-{epoch_id}")

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
