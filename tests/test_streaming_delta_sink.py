"""Streaming -> Delta: one commit per epoch, txn-action exactly-once."""

import json
import os
import tempfile

import pytest

from dataset_grouper_spark.sources.delta import (
    delta_append_txn,
    delta_last_txn_version,
    delta_versions,
    read_delta,
)
from dataset_grouper_spark.streaming.delta_sink import stream_append_delta


def _drain(q, timeout=120):
    assert q.awaitTermination(timeout), "stream did not drain in time"


@pytest.fixture()
def dirs(spark):
    src = tempfile.mkdtemp(prefix="ds_src_")
    table = tempfile.mkdtemp(prefix="ds_tbl_") + "/tbl"
    ckpt = tempfile.mkdtemp(prefix="ds_ck_")
    batches = [[(1, "a"), (2, "b")], [(3, "c")], [(4, "d"), (5, "e")]]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))
    return src, table, ckpt


def test_one_commit_per_epoch_and_txn_recorded(spark, dirs):
    src, table, ckpt = dirs
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    _drain(stream_append_delta(stream, table, ckpt))
    assert len(delta_versions(table)) == 3
    out = read_delta(spark, table)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 4, 5]
    assert (
        delta_last_txn_version(spark, table, "dataset-grouper-stream") == 2
    )
    # the txn action rides the SAME commit as its data
    log = os.path.join(table, "_delta_log", f"{1:020d}.json")
    kinds = {
        next(iter(json.loads(line)))
        for line in open(log)
        if line.strip()
    }
    assert "txn" in kinds and "add" in kinds


def test_epoch_replay_is_noop(spark, dirs):
    src, table, ckpt = dirs
    df = spark.createDataFrame([(9, "z")], "doc_id long, text string")
    assert delta_append_txn(spark, df, table, "app", 0) == 0
    # crash-replay of the SAME epoch: no version, no duplicate rows
    assert delta_append_txn(spark, df, table, "app", 0) is None
    assert delta_versions(table) == [0]
    assert read_delta(spark, table).count() == 1
    # the next epoch commits normally
    assert delta_append_txn(spark, df, table, "app", 1) == 1
    assert read_delta(spark, table).count() == 2


def test_restart_skips_committed_epochs(spark, dirs):
    src, table, ckpt = dirs
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    _drain(stream_append_delta(stream, table, ckpt))
    n_versions = len(delta_versions(table))
    # restart over the same checkpoint: nothing new to process,
    # nothing recommitted
    stream2 = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    _drain(stream_append_delta(stream2, table, ckpt))
    assert len(delta_versions(table)) == n_versions
    assert read_delta(spark, table).count() == 5


def test_independent_app_ids_interleave(spark, dirs):
    src, table, ckpt = dirs
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    delta_append_txn(spark, df, table, "app-A", 0)
    delta_append_txn(spark, df, table, "app-B", 0)  # same epoch id, other app
    assert read_delta(spark, table).count() == 2
    assert delta_last_txn_version(spark, table, "app-A") == 0
    assert delta_last_txn_version(spark, table, "app-B") == 0
    assert delta_last_txn_version(spark, table, "app-C") is None
