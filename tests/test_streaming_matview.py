"""Streaming materialized views: exactly-once epoch folds."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import matview
from dataset_grouper_spark.streaming.matview_sink import (
    stream_refresh_materialized_sums,
)


def _drain(q, timeout=120):
    assert q.awaitTermination(timeout), "stream did not drain in time"


def _table(spark, path):
    return {
        r["source"]: (r["n"], r["total_len"])
        for r in spark.read.parquet(path).collect()
    }


def test_tagged_refresh_is_replay_idempotent(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="mv_tag_"), "mv")
    base = spark.createDataFrame(
        [("a", 3), ("b", 5)], "source string, v long"
    )
    matview.create_materialized_sums(
        base, ["source"], {"n": F.lit(1), "total": F.col("v")}, path
    )
    batch = spark.createDataFrame([("a", 7), ("c", 1)], "source string, v long")
    folded = matview.refresh_materialized_sums(
        spark, batch, ["source"], {"n": F.lit(1), "total": F.col("v")},
        path, tag="epoch-1",
    )
    assert folded is True
    snap = {
        r["source"]: (r["n"], r["total"])
        for r in spark.read.parquet(path).collect()
    }
    assert snap == {"a": (2, 10), "b": (1, 5), "c": (1, 1)}
    # the replay: same batch, same tag -> no-op, values unchanged
    again = matview.refresh_materialized_sums(
        spark, batch, ["source"], {"n": F.lit(1), "total": F.col("v")},
        path, tag="epoch-1",
    )
    assert again is False
    snap2 = {
        r["source"]: (r["n"], r["total"])
        for r in spark.read.parquet(path).collect()
    }
    assert snap2 == snap
    assert matview.folded_tags(path) == {"epoch-1"}
    # untagged refresh still folds (legacy contract unchanged)
    assert matview.refresh_materialized_sums(
        spark, batch, ["source"], {"n": F.lit(1), "total": F.col("v")}, path
    ) is True


def test_tag_survives_crash_recovery(spark):
    import shutil

    path = os.path.join(tempfile.mkdtemp(prefix="mv_crash_"), "mv")
    base = spark.createDataFrame([("a", 1)], "source string, v long")
    matview.create_materialized_sums(
        base, ["source"], {"n": F.lit(1)}, path
    )
    batch = spark.createDataFrame([("a", 1)], "source string, v long")
    matview.refresh_materialized_sums(
        spark, batch, ["source"], {"n": F.lit(1)}, path, tag="e0"
    )
    # simulate a crash INSIDE the swap window: table gone, _old present
    shutil.move(path, path + "_old")
    # recovery restores the PRE-state of whatever _old holds — here the
    # post-fold state — and its tags file travels with the data, so the
    # replay decision stays consistent with the data
    assert matview.recover_materialized(path)
    assert matview.folded_tags(path) == {"e0"}
    assert matview.refresh_materialized_sums(
        spark, batch, ["source"], {"n": F.lit(1)}, path, tag="e0"
    ) is False


@pytest.fixture()
def doc_stream_dirs(spark):
    src = tempfile.mkdtemp(prefix="mvs_src_")
    ckpt = tempfile.mkdtemp(prefix="mvs_ck_")
    path = os.path.join(tempfile.mkdtemp(prefix="mvs_tbl_"), "mv")
    batches = [
        [("a", "xx"), ("b", "yyy")],
        [("a", "z")],
        [("c", "wwww"), ("a", "v")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "source string, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, f"b{i}"))
    return src, ckpt, path


def test_stream_folds_equal_batch_group_by(spark, doc_stream_dirs):
    src, ckpt, path = doc_stream_dirs
    mk = lambda: spark.readStream.schema("source string, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = stream_refresh_materialized_sums(
        mk(),
        ["source"],
        {"n": F.lit(1), "total_len": F.length("text")},
        path,
        ckpt,
    )
    _drain(q)
    assert _table(spark, path) == {"a": (3, 4), "b": (1, 3), "c": (1, 4)}
    # restart over the same checkpoint: no new files -> no change
    q2 = stream_refresh_materialized_sums(
        mk(), ["source"],
        {"n": F.lit(1), "total_len": F.length("text")}, path, ckpt,
    )
    _drain(q2)
    assert _table(spark, path) == {"a": (3, 4), "b": (1, 3), "c": (1, 4)}
    # late-arriving file folds incrementally
    spark.createDataFrame(
        [("b", "qqqqq")], "source string, text string"
    ).coalesce(1).write.parquet(os.path.join(src, "b9"))
    q3 = stream_refresh_materialized_sums(
        mk(), ["source"],
        {"n": F.lit(1), "total_len": F.length("text")}, path, ckpt,
    )
    _drain(q3)
    assert _table(spark, path) == {"a": (3, 4), "b": (2, 8), "c": (1, 4)}
