"""Exactly-once streaming ingestion into Iceberg via epoch-stamped
snapshot summaries."""

from pyspark.sql import functions as F

from dataset_grouper_spark.sources.iceberg import (
    iceberg_append_epoch,
    iceberg_expire_snapshots,
    iceberg_last_epoch,
    iceberg_remove_orphans,
    read_iceberg,
)
from dataset_grouper_spark.streaming.iceberg_sink import stream_append_iceberg


def _batch(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


class TestEpochAppend:
    def test_replay_is_noop(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        assert iceberg_append_epoch(
            spark, _batch(spark, 0, 10), t, "app", 0
        ) is not None
        # exact replay: no snapshot, no duplicate rows
        assert iceberg_append_epoch(
            spark, _batch(spark, 0, 10), t, "app", 0
        ) is None
        assert read_iceberg(spark, t).count() == 10
        assert iceberg_last_epoch(t, "app") == 0

    def test_independent_app_ids(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        iceberg_append_epoch(spark, _batch(spark, 0, 5), t, "a", 0)
        assert iceberg_append_epoch(
            spark, _batch(spark, 5, 10), t, "b", 0
        ) is not None
        assert read_iceberg(spark, t).count() == 10

    def test_guard_survives_expiry(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        iceberg_append_epoch(spark, _batch(spark, 0, 5), t, "app", 0)
        iceberg_append_epoch(spark, _batch(spark, 5, 10), t, "app", 1)
        iceberg_expire_snapshots(t, keep_last=1)
        iceberg_remove_orphans(t)
        # epoch 0's snapshot (and its summary) are gone; the ledger
        # still blocks the replay
        assert iceberg_append_epoch(
            spark, _batch(spark, 0, 5), t, "app", 0
        ) is None
        assert read_iceberg(spark, t).count() == 10


class TestStreamSink:
    def test_stream_then_resume(self, spark, tmp_path):
        src = str(tmp_path / "src")
        t = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "ckpt")
        _batch(spark, 0, 50).write.parquet(src)
        stream = spark.readStream.schema("id long, v long").parquet(src)
        q = stream_append_iceberg(stream, t, ckpt, app_id="s1")
        q.awaitTermination(120)
        assert read_iceberg(spark, t).count() == 50
        # new source file, SAME checkpoint: only the delta lands
        _batch(spark, 50, 70).write.mode("append").parquet(src)
        stream = spark.readStream.schema("id long, v long").parquet(src)
        q = stream_append_iceberg(stream, t, ckpt, app_id="s1")
        q.awaitTermination(120)
        assert read_iceberg(spark, t).count() == 70
        # deliberate epoch replay outside the stream: no-op
        assert iceberg_append_epoch(
            spark, _batch(spark, 0, 50), t, "s1", 0
        ) is None
        assert read_iceberg(spark, t).count() == 70
