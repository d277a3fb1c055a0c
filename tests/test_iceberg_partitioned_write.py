"""Partitioned iceberg_append: transform specs, manifest partition
metadata, and write/read transform agreement."""

import datetime

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.iceberg import (
    _expected_partition,
    _live_files,
    _load_metadata,
    _transform_value,
    iceberg_append,
    read_iceberg,
)


def _files(t, partition_filter=None):
    meta = _load_metadata(t)
    snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]
    ]
    expected = (
        _expected_partition(meta, partition_filter)
        if partition_filter
        else None
    )
    data, _pd, _pr, _eq = _live_files(t, snap, expected)
    return data


class TestPartitionedAppend:
    def test_identity_and_bucket_prune(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = (
            spark.range(500)
            .withColumn(
                "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
            )
            .withColumn("v", F.col("id") * 2)
        )
        iceberg_append(
            spark,
            df.coalesce(4),
            t,
            partition_spec=[("lang", "identity"), ("id", "bucket[4]")],
        )
        total = _files(t)
        assert 0 < len(_files(t, {"lang": "de"})) < len(total)
        assert 0 < len(_files(t, {"id": 7})) < len(total)
        # pruned read is still exact with the row filter
        got = read_iceberg(
            spark, t, partition_filter={"lang": "de", "id": 7}
        ).filter("id = 7")
        assert [(r["id"], r["v"]) for r in got.collect()] == [(7, 14)]
        assert read_iceberg(spark, t).count() == 500

    def test_append_reuses_table_spec(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(100).withColumn(
            "lang", F.when(F.col("id") % 2 == 0, "en").otherwise("de")
        )
        iceberg_append(
            spark, df.coalesce(1), t, partition_spec=[("lang", "identity")]
        )
        iceberg_append(spark, df.coalesce(1), t)  # spec inherited
        assert read_iceberg(spark, t).count() == 200
        assert 0 < len(_files(t, {"lang": "en"})) < len(_files(t))

    def test_spec_mismatch_raises(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.range(10).withColumn("lang", F.lit("en"))
        iceberg_append(
            spark, df, t, partition_spec=[("lang", "identity")]
        )
        with pytest.raises(ValueError, match="spec mismatch"):
            iceberg_append(
                spark, df, t, partition_spec=[("id", "bucket[4]")]
            )

    def test_truncate_and_temporal_transforms(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.createDataFrame(
            [
                (i, f"w{i:03d}", datetime.date(2020 + i % 3, 1 + i % 12, 5))
                for i in range(60)
            ],
            "id long, w string, d date",
        )
        iceberg_append(
            spark,
            df.coalesce(1),
            t,
            partition_spec=[
                ("id", "truncate[10]"),
                ("w", "truncate[2]"),
                ("d", "month"),
            ],
        )
        total = _files(t)
        assert len(_files(t, {"id": 37})) < len(total)
        assert len(
            _files(t, {"d": datetime.date(2021, 3, 5)})
        ) < len(total)
        got = read_iceberg(
            spark, t, partition_filter={"id": 37}
        ).filter("id = 37")
        assert got.count() == 1

    def test_write_read_transform_agreement(self, spark, tmp_path):
        # every file's recorded partition value == what the PRUNING
        # side computes for the rows inside: write/read twin property
        t = str(tmp_path / "tbl")
        df = spark.range(200).withColumn("s", F.concat(F.lit("k"), F.col("id")))
        iceberg_append(
            spark,
            df.coalesce(2),
            t,
            partition_spec=[("id", "bucket[8]"), ("s", "truncate[2]")],
        )
        meta = _load_metadata(t)
        snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
            meta["current-snapshot-id"]
        ]
        from dataset_grouper_spark.sources.avro import read_avro_file
        import os

        ml = snap["manifest-list"]
        _s, manifests = read_avro_file(ml)
        for m in manifests:
            _s2, entries = read_avro_file(m["manifest_path"])
            for e in entries:
                part = e["data_file"]["partition"]
                rows = spark.read.parquet(
                    e["data_file"]["file_path"]
                ).collect()
                for r in rows:
                    assert _transform_value(
                        "bucket[8]", r["id"], "long"
                    ) == part["id_bucket"]
                    assert _transform_value(
                        "truncate[2]", r["s"], "string"
                    ) == part["s_trunc"]
