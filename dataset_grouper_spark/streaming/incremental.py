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
       (at 100 TB this is a hash-bucketed layout and the anti-join
       prunes to matching buckets; the batch side is small, so AQE
       broadcasts it);
    3. append the new survivors (rows + hash) to the store.

Exactly-once: the survivor store is a SNAPSHOT TABLE
(sinks/snapshots.py), not a bare parquet directory.  Step 3 commits
one atomic manifest version per epoch, tagged ``epoch-<id>`` — a
crash between append and checkpoint commit replays the epoch, and the
replay is harmless twice over: the re-screen now finds every replayed
hash in the store (anti-join admits nothing), and even if it admitted
something, ``snapshot_append`` treats the already-committed epoch tag
as a no-op.  Every row therefore lands EXACTLY once per content hash,
across crashes — closing the at-least-once caveat the plain-parquet
version of this file documented (the plumbing
streaming/snapshot_sink.py already proved for the non-dedup sink).
The store is also time-travelable: each epoch is a pinnable version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.sinks import snapshots as snap

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
    if snap.snapshot_versions(store_path):
        # distinct BEFORE the anti-join: the store holds one row per
        # hash today, but joining against raw rows would degrade
        # linearly if that invariant ever slips (and the exchange
        # ships less either way). read_snapshot pins the manifest's
        # file list — a concurrent epoch commit can't shift the scan.
        seen = (
            snap.read_snapshot(spark, store_path)
            .select(HASH_COL)
            .distinct()
        )
        in_batch = in_batch.join(seen, HASH_COL, "left_anti")
    return in_batch.withColumn(EPOCH_COL, F.lit(epoch_id))


def ingest_batch(
    batch: DataFrame,
    epoch_id: int,
    store_path: str,
    content_col: str,
    order_col: str,
) -> None:
    """Screen + commit ONE epoch into the snapshot survivor store.
    Idempotent per epoch — safe to replay after a crash at any point
    between screen and checkpoint commit (module docstring). Exposed
    so crash-replay tests can drive it directly."""
    spark = batch.sparkSession
    admitted = _screen_batch(
        spark, batch, store_path, content_col, order_col, epoch_id
    )
    if not snap.snapshot_versions(store_path):
        # first epoch creates the table (schema footer + empty v1);
        # guarded by existence, so a replayed first epoch skips it
        snap.snapshot_write(admitted.limit(0), store_path)
    if not admitted.isEmpty():
        snap.snapshot_append(admitted, store_path, tag=f"epoch-{epoch_id}")


def read_survivors(spark: SparkSession, store_path: str) -> DataFrame:
    """The deduped corpus (latest snapshot version). Pass a pinned
    ``version`` via ``snapshots.read_snapshot`` directly for
    time-travel reads of the corpus as of an earlier epoch."""
    return snap.read_snapshot(spark, store_path)


def streaming_incremental_dedup(
    stream: DataFrame,
    store_path: str,
    checkpoint: str,
    content_col: str,
    order_col: str,
):
    """Start a foreachBatch query that admits only never-seen content
    into the snapshot survivor store at ``store_path``.  Returns the
    StreamingQuery; the caller drains/stops it.  Read the corpus back
    with :func:`read_survivors`."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        ingest_batch(batch, epoch_id, store_path, content_col, order_col)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
