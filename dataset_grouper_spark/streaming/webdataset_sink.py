"""Streaming ingestion into WebDataset tar shards, exactly-once.

The batch writer (sources/webdataset.py) is deterministic by
construction — pinned tar metadata, sorted members, hash-stable shard
assignment — which is exactly what makes an exactly-once STREAMING
sink cheap: each micro-batch writes its own shard set under
``epoch=<id>/`` and then commits a marker file; a crash-replay of the
epoch either finds the marker (no-op) or rewrites byte-identical
shards before re-attempting the marker, so readers can never observe
duplicated or torn samples. This is the same epoch-tag idempotence
contract as the snapshot/Delta/Iceberg/Hudi sinks (streaming/
snapshot_sink.py), applied to the tar interchange format a training
loader consumes directly.

Readers consume only COMMITTED epochs: :func:`read_webdataset_epochs`
lists the marker directory (a metadata touch), then fans out the
usual one-task-per-shard streamed tar reads.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dataset_grouper_spark.compat import fs
from dataset_grouper_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)

__all__ = ["stream_webdataset_sink", "read_webdataset_epochs"]


def _marker(path: str, epoch_id: int) -> str:
    return f"{path.rstrip('/')}/_epochs/{epoch_id}.json"


def stream_webdataset_sink(
    stream_df: DataFrame,
    path: str,
    key_col: str,
    columns: dict,
    checkpoint: str,
    num_shards: int = 4,
    compression: str = "none",
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch sink: one WebDataset shard set per epoch under
    ``epoch=<id>/``, committed by an ``_epochs/<id>.json`` marker
    written strictly AFTER every shard byte landed. Marker present =
    epoch replay is a no-op; marker absent = the deterministic writer
    reproduces identical shard bytes, so the retry converges instead
    of corrupting."""
    fs.makedirs(f"{path.rstrip('/')}/_epochs")

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        marker = _marker(path, epoch_id)
        if fs.exists(marker):
            return  # exactly-once: this epoch already committed
        dst = f"{path.rstrip('/')}/epoch={epoch_id}"
        manifest = write_webdataset(
            batch, dst, key_col, columns, num_shards,
            compression=compression,
        ).collect()
        fs.write_text(
            marker,
            json.dumps(
                {
                    "epoch": epoch_id,
                    "n_samples": sum(r.n_samples for r in manifest),
                    "shards": sorted(r.path for r in manifest),
                },
                sort_keys=True,
            ),
        )

    writer = stream_df.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_webdataset_epochs(spark: SparkSession, path: str) -> DataFrame:
    """Long-form members of every COMMITTED epoch (uncommitted/torn
    epoch directories are invisible), tagged with their epoch id."""
    edir = f"{path.rstrip('/')}/_epochs"
    try:
        names = fs.listdir(edir)
    except FileNotFoundError:
        names = []
    epochs = sorted(
        int(n[: -len(".json")])
        for n in names
        if n.endswith(".json") and n[: -len(".json")].isdigit()
    )
    frames = [
        read_webdataset(spark, f"{path.rstrip('/')}/epoch={e}")
        .withColumn("epoch", F.lit(e).cast("long"))
        for e in epochs
    ]
    if not frames:
        return spark.createDataFrame(
            [],
            "key string, ext string, data binary, shard string, "
            "epoch long",
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out
