"""Metadata tables: delta_history, iceberg_history, iceberg_files."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.delta import (
    delta_append,
    delta_checkpoint,
    delta_delete_where,
    delta_history,
    delta_optimize,
    delta_truncate_log,
)
from dataset_grouper_spark.sources.iceberg import (
    iceberg_append,
    iceberg_delete_values,
    iceberg_files,
    iceberg_history,
)


class TestDeltaHistory:
    def test_commit_rows(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        delta_append(spark, df.coalesce(1), t)
        delta_append(spark, df.coalesce(1), t)
        delta_delete_where(spark, t, "id % 2 = 0")
        delta_optimize(spark, t, target_file_bytes=1 << 30)
        h = {r["version"]: r for r in delta_history(spark, t).collect()}
        assert sorted(h) == [0, 1, 2, 3]
        assert h[0]["n_adds"] == 1 and h[0]["data_change"]
        assert h[2]["has_dv"] and h[2]["n_removes"] == 2
        assert h[3]["data_change"] is False  # OPTIMIZE
        assert h[3]["bytes_added"] > 0

    def test_truncated_log_shows_checkpoint_row(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("v", F.col("id"))
        delta_append(spark, df.coalesce(1), t)
        delta_append(spark, df.coalesce(1), t)
        delta_checkpoint(spark, t)
        delta_truncate_log(t)
        delta_append(spark, df.coalesce(1), t)
        h = delta_history(spark, t).collect()
        versions = sorted(r["version"] for r in h)
        assert versions == [1, 2]
        ckpt_row = next(r for r in h if r["version"] == 1)
        assert ckpt_row["checkpoint"] and ckpt_row["n_adds"] is None


class TestIcebergMetaTables:
    def test_history_and_files(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "id long, v string"
        )
        iceberg_append(spark, df.coalesce(1), t)
        iceberg_delete_values(
            spark, spark.createDataFrame([(3,)], "id long"), t
        )
        hist = iceberg_history(spark, t).collect()
        assert [(r["snapshot_id"], r["sequence_number"]) for r in hist] == [
            (1, 1), (2, 2)
        ]
        assert [r["is_current"] for r in hist] == [False, True]
        files = iceberg_files(spark, t).collect()
        by_content = {}
        for r in files:
            by_content.setdefault(r["content"], []).append(r)
        assert len(by_content[0]) == 1  # one data file
        assert len(by_content[2]) == 1  # one equality-delete file
        assert by_content[0][0]["sequence_number"] == 1
        assert by_content[2][0]["sequence_number"] == 2
        assert by_content[2][0]["record_count"] == 1

    def test_files_with_partitions(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(40).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        )
        iceberg_append(
            spark, df.coalesce(1), t, partition_spec=[("lang", "identity")]
        )
        files = iceberg_files(spark, t).collect()
        parts = sorted(r["partition"] for r in files)
        assert parts == ['{"lang": "de"}', '{"lang": "en"}']

    def test_files_unknown_snapshot_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        iceberg_append(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        with pytest.raises(ValueError, match="not in table"):
            iceberg_files(spark, t, snapshot_id=99)
