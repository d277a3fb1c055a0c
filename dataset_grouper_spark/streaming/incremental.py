"""Continuous-ingest incremental dedup: foreachBatch + survivor store.

``streaming_exact_dedup`` (dropDuplicatesWithinWatermark) bounds its
state by TIME — a duplicate arriving after the watermark horizon gets
through.  Training-corpus ingestion needs the opposite contract:
duplicates must be dropped against EVERYTHING ever admitted, horizon be
damned.  That state can't live in a streaming state store (it grows
with the corpus), but it can live where it already has to go: the
survivor dataset itself.

This operator runs the batch incremental-dedup screen
(operators/dedup.py:incremental_dedup's anti-join shape) inside
``foreachBatch``:

  per micro-batch:
    1. hash content, dedup WITHIN the batch (deterministic min of
       ``order_col`` per hash — same survivor rule as batch
       ``exact_dedup``);
    2. anti-join the batch against the survivor store's hash column
       (a parquet scan — at 100 TB this is a hash-bucketed layout and
       the anti-join prunes to matching buckets; the batch side is
       small, so AQE broadcasts it);
    3. append the new survivors (rows + hash) to the store.

Exactly-once caveat, stated honestly: parquet append in foreachBatch is
NOT transactional with the checkpoint.  A crash between append and
commit can re-run step 3 for the same epoch; the ``_epoch`` column
written with every row makes re-runs idempotent to detect (dedup on
(_h, _epoch) at read) and is how a table format (Delta/Iceberg) would
seal it properly.  The semantics here: every input row appears in the
store EXACTLY once per content hash under normal operation, at-least-
once across crashes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HASH_COL = "_h"
EPOCH_COL = "_epoch"


def _screen_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    content_col: str,
    order_col: str,
    epoch_id: int,
) -> DataFrame:
    """One micro-batch through the survivor screen; returns the rows to
    admit (already hashed + epoch-stamped)."""
    from pyspark.sql import Window

    hashed = batch.withColumn(HASH_COL, F.md5(F.col(content_col)))
    # full-tie break on a content digest of the whole row: order_col
    # alone is not unique (two same-content rows with equal timestamps)
    # and an arbitrary pick could persist DIFFERENT non-content columns
    # on a task retry — the survivor must be deterministic, like batch
    # exact_dedup's id tiebreak
    w = Window.partitionBy(HASH_COL).orderBy(
        F.col(order_col),
        F.md5(F.to_json(F.struct(*batch.columns))),
    )
    in_batch = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # local-path existence probe; an object-store deployment swaps this
    # for the pyarrow.fs dispatch in compat.fs
    if os.path.isdir(store_path) and any(
        f.endswith(".parquet")
        for _, _, fs in os.walk(store_path)
        for f in fs
    ):
        # distinct BEFORE the anti-join: the store holds one row per
        # hash today, but joining against raw rows would degrade
        # linearly if that invariant ever slips (and the exchange
        # ships less either way)
        seen = spark.read.parquet(store_path).select(HASH_COL).distinct()
        in_batch = in_batch.join(seen, HASH_COL, "left_anti")
    return in_batch.withColumn(EPOCH_COL, F.lit(epoch_id))


def streaming_incremental_dedup(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    content_col: str,
    order_col: str,
):
    """Start a foreachBatch query that admits only never-seen content
    into the parquet survivor store at ``store_path``.  Returns the
    StreamingQuery; the caller drains/stops it.  Read the corpus back
    with ``spark.read.parquet(store_path)``."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        admitted = _screen_batch(
            spark, batch, store_path, content_col, order_col, epoch_id
        )
        admitted.write.mode("append").parquet(store_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
