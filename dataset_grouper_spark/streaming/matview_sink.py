"""Streaming materialized views: exactly-once incremental folds.

``refresh_materialized_sums`` keeps an additive rollup fresh at
O(batch + groups); this sink drives it from Structured Streaming —
each micro-batch folds once, per-epoch tagged, so a crash-replayed
epoch is a no-op (the tag commits atomically WITH the folded data in
the same directory swap — see operators/matview.py). The result: a
continuously-maintained aggregate table whose value always equals the
batch GROUP BY over everything ingested, exactly once, across
crashes — the streaming twin of the matview contract, closing the
replay-idempotence gap the r5 advisor flagged (matview.py:96).

At 100 TB: the fold cost per epoch is O(batch + groups), never
O(corpus); group cardinality bounds the stored table, and the swap is
two renames regardless of size.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

from dataset_grouper_spark.operators import matview


def stream_refresh_materialized_sums(
    stream_df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, Column],
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Fold every micro-batch into the materialized rollup at ``path``
    with per-epoch exactly-once semantics. Creates the table on the
    first non-empty epoch (empty, so a replayed first epoch stays
    idempotent through the normal tag path)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not os.path.isdir(path):
            # empty initial table: the first epoch folds through the
            # SAME tagged path as every other epoch, so a crash between
            # create and fold replays safely
            matview.create_materialized_sums(
                batch.limit(0), key_cols, sum_cols, path
            )
        matview.refresh_materialized_sums(
            spark, batch, key_cols, sum_cols, path, tag=f"epoch-{epoch_id}"
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
