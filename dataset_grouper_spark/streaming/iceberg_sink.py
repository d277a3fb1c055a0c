"""Streaming ingestion into an Iceberg table, exactly-once per epoch.

The Iceberg twin of ``delta_sink``: every micro-batch commits one
snapshot whose SUMMARY carries ``{app-id, epoch}`` atomically with the
commit (``iceberg_append_epoch``), so a foreachBatch crash between
commit and stream-checkpoint replays the epoch into a no-op — zero
duplicate rows. Every epoch is a time-travelable snapshot any Iceberg
reader can pin; the per-app epoch ledger keeps the replay guard alive
past snapshot expiry.

At 100 TB: each epoch writes only its own files (O(batch)); metadata
grows one snapshot + one manifest per epoch (compact with
``iceberg_expire_snapshots`` + ``iceberg_remove_orphans``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from dataset_grouper_spark.sources.iceberg import iceberg_append_epoch


def stream_append_iceberg(
    stream_df: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str = "dataset-grouper-stream",
    partition_spec: list[tuple[str, str]] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """One Iceberg snapshot per non-empty micro-batch, epoch-stamped
    in the snapshot summary for replay idempotence. The table is
    created on the first batch when absent."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        iceberg_append_epoch(
            batch.sparkSession,
            batch,
            table_path,
            app_id=app_id,
            epoch=epoch_id,
            partition_spec=partition_spec,
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
