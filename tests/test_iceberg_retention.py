"""Iceberg retention: expire_snapshots (metadata-only) +
remove_orphans (file reaping limited to unreferenced files)."""

import os

import pytest

from dataset_grouper_spark.sources.iceberg import (
    _load_metadata,
    iceberg_append,
    iceberg_delete_values,
    iceberg_delete_where,
    iceberg_expire_snapshots,
    iceberg_remove_orphans,
    read_iceberg,
)


def _fresh(spark, tmp_path, n_appends=3):
    t = str(tmp_path / "ret_tbl")
    for i in range(n_appends):
        iceberg_append(
            spark,
            spark.createDataFrame(
                [(i * 10 + j, f"s{i}") for j in range(5)], "id long, v string"
            ),
            t,
        )
    return t


class TestExpire:
    def test_expire_keeps_current(self, spark, tmp_path):
        t = _fresh(spark, tmp_path)
        expired = iceberg_expire_snapshots(t, keep_last=1)
        assert expired == [1, 2]
        meta = _load_metadata(t)
        assert [s["snapshot-id"] for s in meta["snapshots"]] == [3]
        assert read_iceberg(spark, t).count() == 15
        with pytest.raises(ValueError, match="not in table"):
            read_iceberg(spark, t, snapshot_id=1)

    def test_expire_noop(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, n_appends=2)
        assert iceberg_expire_snapshots(t, keep_last=5) == []

    def test_keep_last_validated(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, n_appends=1)
        with pytest.raises(ValueError):
            iceberg_expire_snapshots(t, keep_last=0)


class TestRemoveOrphans:
    def test_nothing_orphaned_while_retained(self, spark, tmp_path):
        t = _fresh(spark, tmp_path)
        assert iceberg_remove_orphans(t, dry_run=True) == []

    def test_reaps_only_after_expire(self, spark, tmp_path):
        t = _fresh(spark, tmp_path)
        # rewrite-free history: expire makes snapshot-1/2's manifest
        # LISTS orphans, but their data files are still referenced by
        # snapshot 3's carried-over manifests
        iceberg_expire_snapshots(t, keep_last=1)
        doomed = iceberg_remove_orphans(t)
        assert doomed  # old manifest lists at minimum
        assert all(d.endswith(".avro") for d in doomed)
        assert read_iceberg(spark, t).count() == 15

    def test_reaps_replaced_delete_state(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        iceberg_append(
            spark,
            spark.createDataFrame(
                [(i, "x") for i in range(10)], "id long, v string"
            ),
            t,
        )
        iceberg_delete_values(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        survivors = sorted(
            r["id"] for r in read_iceberg(spark, t).collect()
        )
        iceberg_expire_snapshots(t, keep_last=1)
        doomed = iceberg_remove_orphans(t)
        assert doomed
        assert sorted(
            r["id"] for r in read_iceberg(spark, t).collect()
        ) == survivors
        # idempotent
        assert iceberg_remove_orphans(t) == []

    def test_dry_run_deletes_nothing(self, spark, tmp_path):
        t = _fresh(spark, tmp_path)
        iceberg_expire_snapshots(t, keep_last=1)
        doomed = iceberg_remove_orphans(t, dry_run=True)
        assert doomed
        for rel in doomed:
            assert os.path.exists(os.path.join(t, rel))
