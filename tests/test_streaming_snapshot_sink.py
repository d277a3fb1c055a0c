"""Streaming -> snapshot store: one version per epoch, replay-safe."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sinks import snapshots as snap
from dataset_grouper_spark.streaming.snapshot_sink import (
    stream_append_snapshots,
)


def _drain(q, timeout=120):
    assert q.awaitTermination(timeout), "stream did not drain in time"


@pytest.fixture()
def dirs(spark):
    src = tempfile.mkdtemp(prefix="ss_src_")
    table = tempfile.mkdtemp(prefix="ss_tbl_")
    ckpt = tempfile.mkdtemp(prefix="ss_ck_")
    batches = [
        [(1, "a"), (2, "b")],
        [(3, "c")],
        [(4, "d"), (5, "e"), (6, "f")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))
    # v1: empty table shell carrying the schema
    empty = spark.createDataFrame([], "doc_id long, text string")
    snap.snapshot_write(empty, table)
    return src, table, ckpt


def test_stream_appends_one_version_per_batch(spark, dirs):
    src, table, ckpt = dirs
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    _drain(stream_append_snapshots(stream, table, ckpt))
    versions = snap.snapshot_versions(table)
    assert len(versions) == 4  # v1 shell + 3 epochs
    out = snap.read_snapshot(spark, table)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 4, 5, 6]
    # every epoch version is tagged
    tags = snap.committed_tags(table)
    assert len(tags) == 3 and all(t.startswith("epoch-") for t in tags)
    # intermediate versions are pinnable prefixes of the ingest
    assert snap.read_snapshot(spark, table, versions[1]).count() in (1, 2, 3)


def test_epoch_replay_is_noop(spark, dirs):
    src, table, ckpt = dirs
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    _drain(stream_append_snapshots(stream, table, ckpt))
    n_versions = len(snap.snapshot_versions(table))
    n_rows = snap.read_snapshot(spark, table).count()
    # simulate the crash-replay: re-commit an epoch that already landed
    replay = spark.createDataFrame([(99, "dup")], "doc_id long, text string")
    tag = sorted(snap.committed_tags(table))[0]
    v = snap.snapshot_append(replay, table, tag=tag)
    assert v <= n_versions  # returned the existing version
    assert len(snap.snapshot_versions(table)) == n_versions
    assert snap.read_snapshot(spark, table).count() == n_rows  # no dup rows


def test_restarted_stream_skips_committed_epochs(spark, dirs):
    # drain, then restart the SAME stream+checkpoint: no new input ->
    # no new versions (the checkpoint says all epochs are done)
    src, table, ckpt = dirs
    def mk():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
    _drain(stream_append_snapshots(mk(), table, ckpt))
    before = snap.snapshot_versions(table)
    _drain(stream_append_snapshots(mk(), table, ckpt))
    assert snap.snapshot_versions(table) == before
