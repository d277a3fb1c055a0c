"""Streaming ingestion into a Delta table, exactly-once per epoch.

The Delta-protocol twin of ``snapshot_sink``: every micro-batch
commits its data AND a ``txn {appId, version=epoch}`` action in ONE
atomic log entry (``delta_append_txn``), so a foreachBatch crash
between commit and stream-checkpoint replays the epoch into a no-op —
zero duplicate rows, the same idempotent-writer contract delta-spark's
own streaming sink uses. Every epoch is a time-travelable version any
Delta reader (ours, Spark, Trino, delta-rs) can pin.

At 100 TB: each epoch writes only its own files (O(batch)); the log
grows one JSON entry per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from dataset_grouper_spark.sources.delta import delta_append_txn


def stream_append_delta(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str = "dataset-grouper-stream",
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """One Delta commit per non-empty micro-batch, epoch-stamped via
    the protocol's ``txn`` action for replay idempotence. The table is
    created on the first batch when absent."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        delta_append_txn(
            batch.sparkSession,
            batch,
            table_path,
            app_id=app_id,
            txn_version=epoch_id,
            partition_by=partition_by,
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
