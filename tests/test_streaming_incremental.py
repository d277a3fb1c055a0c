"""foreachBatch incremental dedup: unbounded-horizon survivor store."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.streaming.incremental import (
    EPOCH_COL,
    HASH_COL,
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
    out = spark.read.parquet(store)
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


def test_incremental_dedup_restart_adds_nothing(spark, filestream_dirs):
    src, store, ckpt = filestream_dirs
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = streaming_incremental_dedup(
        stream, store, ckpt, content_col="text", order_col="doc_id"
    )
    _drain(q)
    n1 = spark.read.parquet(store).count()
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
    assert spark.read.parquet(store).count() == n1


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
    out = spark.read.parquet(store)
    texts = sorted(r["text"] for r in out.collect())
    assert texts == ["alpha", "beta", "delta", "epsilon", "gamma"]
