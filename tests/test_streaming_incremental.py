"""foreachBatch incremental dedup: snapshot-store survivor corpus."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sinks import snapshots as snap
from dataset_grouper_spark.streaming.incremental import (
    EPOCH_COL,
    HASH_COL,
    ingest_batch,
    read_survivors,
    streaming_incremental_dedup,
)


def _drain(q, timeout=120):
    assert q.awaitTermination(timeout), "stream did not drain in time"


@pytest.fixture()
def filestream_dirs(spark):
    src = tempfile.mkdtemp(prefix="inc_src_")
    store = tempfile.mkdtemp(prefix="inc_store_")
    ckpt = tempfile.mkdtemp(prefix="inc_ck_")
    # three input files; duplicates within file 0 and across files
    batches = [
        [(1, "alpha"), (2, "beta"), (3, "alpha")],
        [(4, "beta"), (5, "gamma")],
        [(6, "gamma"), (7, "delta"), (8, "alpha")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))
    return src, store, ckpt


def test_incremental_dedup_survivor_store(spark, filestream_dirs):
    src, store, ckpt = filestream_dirs
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = streaming_incremental_dedup(
        stream, store, ckpt, content_col="text", order_col="doc_id"
    )
    _drain(q)
    out = read_survivors(spark, store)
    rows = out.collect()
    # exactly one survivor per distinct text, all texts present
    texts = sorted(r["text"] for r in rows)
    assert texts == ["alpha", "beta", "delta", "gamma"]
    assert out.select(HASH_COL).distinct().count() == 4
    # within-batch survivor rule: min doc_id per hash in its batch
    by_text = {r["text"]: r for r in rows}
    assert by_text["alpha"]["doc_id"] == 1  # not 3 (same batch), not 8
    assert by_text["delta"]["doc_id"] == 7
    # epoch stamps recorded
    assert all(r[EPOCH_COL] is not None for r in rows)
    # each non-empty epoch committed one tagged, time-travelable version
    assert len(snap.snapshot_versions(store)) >= 2


def test_incremental_dedup_restart_adds_nothing(spark, filestream_dirs):
    src, store, ckpt = filestream_dirs
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = streaming_incremental_dedup(
        stream, store, ckpt, content_col="text", order_col="doc_id"
    )
    _drain(q)
    n1 = read_survivors(spark, store).count()
    # restart over the same checkpoint: no new files -> no new rows
    q2 = streaming_incremental_dedup(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*"),
        store,
        ckpt,
        content_col="text",
        order_col="doc_id",
    )
    _drain(q2)
    assert read_survivors(spark, store).count() == n1


def test_new_file_after_restart_screens_against_store(spark, filestream_dirs):
    src, store, ckpt = filestream_dirs
    mk = lambda: spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = streaming_incremental_dedup(
        mk(), store, ckpt, content_col="text", order_col="doc_id"
    )
    _drain(q)
    spark.createDataFrame(
        [(9, "alpha"), (10, "epsilon")], "doc_id long, text string"
    ).coalesce(1).write.parquet(os.path.join(src, "b9"))
    q2 = streaming_incremental_dedup(
        mk(), store, ckpt, content_col="text", order_col="doc_id"
    )
    _drain(q2)
    out = read_survivors(spark, store)
    texts = sorted(r["text"] for r in out.collect())
    assert texts == ["alpha", "beta", "delta", "epsilon", "gamma"]


def test_crash_replay_same_epoch_lands_zero_duplicates(spark):
    # simulate: epoch 0 ingests, epoch 1 ingests, then the stream
    # CRASHES after the epoch-1 snapshot commit but BEFORE the
    # checkpoint commit — on restart Spark replays epoch 1 with the
    # same data. The replay must admit nothing and create no version.
    store = tempfile.mkdtemp(prefix="inc_replay_")
    b0 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(3, "beta"), (4, "gamma")], "doc_id long, text string"
    )
    ingest_batch(b0, 0, store, "text", "doc_id")
    ingest_batch(b1, 1, store, "text", "doc_id")
    rows_before = sorted(
        (r["doc_id"], r["text"]) for r in read_survivors(spark, store).collect()
    )
    versions_before = snap.snapshot_versions(store)
    assert rows_before == [(1, "alpha"), (2, "beta"), (4, "gamma")]
    # the replay
    ingest_batch(b1, 1, store, "text", "doc_id")
    rows_after = sorted(
        (r["doc_id"], r["text"]) for r in read_survivors(spark, store).collect()
    )
    assert rows_after == rows_before
    assert snap.snapshot_versions(store) == versions_before


def test_replayed_epoch_tag_is_noop_even_if_screen_missed(spark):
    # belt-and-suspenders layer: even if a replayed epoch somehow
    # re-admitted rows (screen bypassed), the epoch tag alone must
    # reject the duplicate commit.
    store = tempfile.mkdtemp(prefix="inc_tag_")
    b0 = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    ingest_batch(b0, 7, store, "text", "doc_id")
    v = snap.latest_version(store)
    dup = spark.createDataFrame(
        [(9, "alpha-different-row")], "doc_id long, text string"
    ).withColumn("_h", F.lit("x")).withColumn(EPOCH_COL, F.lit(7))
    got = snap.snapshot_append(dup, store, tag="epoch-7")
    assert got == v
    assert read_survivors(spark, store).count() == 1
