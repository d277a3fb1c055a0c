"""Delta data skipping: footer-derived add.stats envelopes,
file-level skip planning, OPTIMIZE ZORDER BY layout."""

import json

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.delta import (
    _replay,
    delta_append,
    delta_delete_where,
    delta_optimize,
    delta_skip_plan,
    read_delta,
)


def _clustered(spark, tmp_path, n=10_000, files=8):
    t = str(tmp_path / "tbl")
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 37) % 1000)
        .withColumn("lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de"))
    )
    delta_append(
        spark, df.repartitionByRange(files, "id").sortWithinPartitions("id"), t
    )
    return t


class TestStats:
    def test_appends_record_stats(self, spark, tmp_path):
        t = _clustered(spark, tmp_path)
        adds, _ = _replay(spark, t, 0)
        for a in adds.values():
            s = json.loads(a["stats"])
            assert s["numRecords"] > 0
            assert set(s["minValues"]) == {"id", "x", "lang"}
            assert s["minValues"]["id"] <= s["maxValues"]["id"]

    def test_partitioned_appends_skip_partition_cols(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(100).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        )
        delta_append(spark, df, t, partition_by=["lang"])
        adds, _ = _replay(spark, t, 0)
        for a in adds.values():
            s = json.loads(a["stats"])
            assert "lang" not in s["minValues"]  # lives in partitionValues


class TestSkipPlan:
    def test_range_prunes_clustered_layout(self, spark, tmp_path):
        t = _clustered(spark, tmp_path)
        kept, total = delta_skip_plan(spark, t, [("id", "<", 1000)])
        assert total == 8
        assert len(kept) <= 2
        # exactness: skipping + row filter == plain filter
        got = (
            read_delta(spark, t, skip_filters=[("id", "<", 1000)])
            .filter("id < 1000")
            .count()
        )
        assert got == 1000

    def test_equality_and_bounds(self, spark, tmp_path):
        t = _clustered(spark, tmp_path)
        kept, total = delta_skip_plan(spark, t, [("id", "=", 5555)])
        assert len(kept) == 1
        kept, _ = delta_skip_plan(spark, t, [("id", ">=", 9999)])
        assert len(kept) == 1
        kept, _ = delta_skip_plan(
            spark, t, [("id", ">", 2000), ("id", "<", 3000)]
        )
        assert len(kept) <= 2

    def test_partition_values_prune(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(100).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        )
        delta_append(spark, df, t, partition_by=["lang"])
        kept, total = delta_skip_plan(spark, t, [("lang", "=", "en")])
        assert 0 < len(kept) < total
        got = read_delta(spark, t, skip_filters=[("lang", "=", "en")])
        assert got.select("lang").distinct().collect()[0]["lang"] == "en"

    def test_unsupported_op_raises(self, spark, tmp_path):
        t = _clustered(spark, tmp_path, n=100, files=1)
        with pytest.raises(ValueError, match="unsupported op"):
            delta_skip_plan(spark, t, [("id", "!=", 5)])

    def test_stats_survive_dv_delete(self, spark, tmp_path):
        # delete_where re-adds files with the SAME add payload + a DV:
        # stats must still prune afterwards
        t = _clustered(spark, tmp_path)
        delta_delete_where(spark, t, "id % 100 = 0")
        kept, total = delta_skip_plan(spark, t, [("id", "<", 1000)])
        assert len(kept) < total


class TestZorder:
    def test_either_dimension_prunes(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = (
            spark.range(40_000)
            .withColumn("x", (F.col("id") * 37) % 1000)
            .withColumn("y", (F.col("id") * 91) % 1000)
        )
        # id-sorted layout: y-filters prune NOTHING
        delta_append(
            spark,
            df.repartitionByRange(8, "id").sortWithinPartitions("id"),
            t,
        )
        before, total0 = delta_skip_plan(spark, t, [("y", "<", 50)])
        assert len(before) == total0
        delta_optimize(
            spark, t, target_file_bytes=40_000, zorder_by=("x", "y")
        )
        ky, total = delta_skip_plan(spark, t, [("y", "<", 50)])
        kx, _ = delta_skip_plan(spark, t, [("x", "<", 50)])
        assert total >= 4
        assert len(ky) < total and len(kx) < total
        # content identical after re-layout
        s = read_delta(spark, t).agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
        ).collect()[0]
        e = df.agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
        ).collect()[0]
        assert tuple(s) == tuple(e)
