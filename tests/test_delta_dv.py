"""Delta deletion vectors: merge-on-read delete lifecycle + read-side
application of all three descriptor storage types."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources import roaring as R
from dataset_grouper_spark.sources.delta import (
    delta_append,
    delta_delete_where,
    delta_versions,
    read_delta,
    read_delta_changes,
)


def _fresh(spark, tmp_path, rows, schema="id long, v string", **kw):
    t = str(tmp_path / "tbl")
    delta_append(spark, spark.createDataFrame(rows, schema), t, **kw)
    return t


class TestDeleteWhere:
    def test_roundtrip(self, spark, tmp_path):
        t = _fresh(
            spark, tmp_path,
            [(i, "odd" if i % 2 else "even") for i in range(20)],
        )
        v = delta_delete_where(spark, t, "v = 'odd'")
        assert v == 1
        assert sorted(r["id"] for r in read_delta(spark, t).collect()) == list(
            range(0, 20, 2)
        )
        # time travel to the pre-delete version still sees every row
        assert read_delta(spark, t, version=0).count() == 20
        # no data file was rewritten: only DV sidecars + the log grew
        assert any(
            n.startswith("deletion_vector_") for n in os.listdir(t)
        )

    def test_deletes_compose_via_union(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        delta_append(
            spark,
            spark.createDataFrame(
                [(i, "x") for i in range(10)], "id long, v string"
            ).coalesce(1),  # ONE data file: both deletes hit the same DV
            t,
        )
        delta_delete_where(spark, t, "id < 3")
        delta_delete_where(spark, t, "id >= 8")
        assert sorted(
            r["id"] for r in read_delta(spark, t).collect()
        ) == [3, 4, 5, 6, 7]
        # second commit's DV must carry the union (old ⊆ new)
        with open(
            os.path.join(t, "_delta_log", f"{2:020d}.json")
        ) as f:
            cards = [
                json.loads(line)["add"]["deletionVector"]["cardinality"]
                for line in f
                if line.strip() and "add" in json.loads(line)
            ]
        assert sum(cards) == 5

    def test_noop_when_nothing_matches(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a")])
        assert delta_delete_where(spark, t, "id = 99") == 0
        assert delta_versions(t) == [0]

    def test_noop_when_rematching_deleted_rows(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a"), (2, "b")])
        v1 = delta_delete_where(spark, t, "id = 1")
        v2 = delta_delete_where(spark, t, "id = 1")
        assert (v1, v2) == (1, 1)
        assert [r["id"] for r in read_delta(spark, t).collect()] == [2]

    def test_partitioned_table_predicate_on_partition_col(
        self, spark, tmp_path
    ):
        t = _fresh(
            spark, tmp_path,
            [(i, "a" if i < 5 else "b") for i in range(10)],
            partition_by=["v"],
        )
        delta_delete_where(spark, t, (F.col("v") == "a") & (F.col("id") < 2))
        got = sorted(r["id"] for r in read_delta(spark, t).collect())
        assert got == [2, 3, 4, 5, 6, 7, 8, 9]

    def test_delete_all_rows_of_a_file(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a"), (2, "a")])
        delta_delete_where(spark, t, "true")
        assert read_delta(spark, t).count() == 0
        assert read_delta(spark, t, version=0).count() == 2

    def test_append_after_delete(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a"), (2, "b")])
        delta_delete_where(spark, t, "id = 1")
        delta_append(
            spark, spark.createDataFrame([(3, "c")], "id long, v string"), t
        )
        assert sorted(
            r["id"] for r in read_delta(spark, t).collect()
        ) == [2, 3]

    def test_change_feed_refuses_delete_commits(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a"), (2, "b")])
        delta_delete_where(spark, t, "id = 1")
        with pytest.raises(ValueError, match="removes data"):
            read_delta_changes(spark, t, from_version=0)


class TestDescriptorStorageTypes:
    def _single_file_table(self, spark, tmp_path):
        t = str(tmp_path / "tbl")
        df = spark.createDataFrame(
            [(i, f"r{i}") for i in range(6)], "id long, v string"
        ).coalesce(1)
        delta_append(spark, df, t)
        with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as f:
            adds = [
                json.loads(line)["add"]
                for line in f
                if line.strip() and "add" in json.loads(line)
            ]
        assert len(adds) == 1
        return t, adds[0]

    def _commit_dv(self, t, add, dv):
        new_add = dict(add)
        new_add["deletionVector"] = dv
        new_add["dataChange"] = True
        with open(
            os.path.join(t, "_delta_log", f"{1:020d}.json"), "w"
        ) as f:
            f.write(json.dumps({"remove": {
                "path": add["path"], "dataChange": True,
                "partitionValues": {}}}) + "\n")
            f.write(json.dumps({"add": new_add}) + "\n")

    def test_inline_dv(self, spark, tmp_path):
        t, add = self._single_file_table(spark, tmp_path)
        data = R.dv_data_encode([0, 2, 4])
        pad = (-len(data)) % 4  # z85 alignment; reader strips via size
        self._commit_dv(t, add, {
            "storageType": "i",
            "pathOrInlineDv": R.z85_encode(data + b"\x00" * pad),
            "sizeInBytes": len(data),
            "cardinality": 3,
        })
        got = sorted(r["id"] for r in read_delta(spark, t).collect())
        assert got == [1, 3, 5]

    def test_absolute_path_dv(self, spark, tmp_path):
        t, add = self._single_file_table(spark, tmp_path)
        p = str(tmp_path / "dv_abs.bin")
        offset, size, card = R.dv_file_write(p, [1, 3, 5])
        self._commit_dv(t, add, {
            "storageType": "p", "pathOrInlineDv": p,
            "offset": offset, "sizeInBytes": size, "cardinality": card,
        })
        got = sorted(r["id"] for r in read_delta(spark, t).collect())
        assert got == [0, 2, 4]

    def test_relative_uuid_dv(self, spark, tmp_path):
        import uuid as _uuid

        t, add = self._single_file_table(spark, tmp_path)
        u = _uuid.uuid4()
        p = os.path.join(t, f"deletion_vector_{u}.bin")
        offset, size, card = R.dv_file_write(p, [0])
        self._commit_dv(t, add, {
            "storageType": "u", "pathOrInlineDv": R.z85_encode(u.bytes),
            "offset": offset, "sizeInBytes": size, "cardinality": card,
        })
        got = sorted(r["id"] for r in read_delta(spark, t).collect())
        assert got == [1, 2, 3, 4, 5]

    def test_broadcast_when_cardinality_bounded(self, spark, tmp_path):
        t, add = self._single_file_table(spark, tmp_path)
        p = str(tmp_path / "dv.bin")
        offset, size, card = R.dv_file_write(p, [0])
        self._commit_dv(t, add, {
            "storageType": "p", "pathOrInlineDv": p,
            "offset": offset, "sizeInBytes": size, "cardinality": card,
        })
        plan = (
            read_delta(spark, t)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestCheckpointWriter:
    def test_checkpoint_bounds_replay_and_survives_truncation(
        self, spark, tmp_path
    ):
        from dataset_grouper_spark.sources.delta import (
            delta_append_txn,
            delta_checkpoint,
            delta_last_txn_version,
            delta_truncate_log,
        )

        t = str(tmp_path / "cp")
        for i in range(4):
            delta_append_txn(
                spark,
                spark.createDataFrame([(i, f"r{i}")], "id long, v string"),
                t, "app", i,
            )
        delta_delete_where(spark, t, "id = 1")
        v = delta_checkpoint(spark, t)
        assert v == 4
        removed = delta_truncate_log(t)
        assert removed == [0, 1, 2, 3, 4]
        # latest state reads purely from the checkpoint: adds, the
        # deletion vector, and txn marks all survive
        assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [
            0, 2, 3,
        ]
        assert delta_last_txn_version(spark, t, "app") == 3
        # an epoch replay is STILL a no-op after truncation
        df = spark.createDataFrame([(9, "z")], "id long, v string")
        assert delta_append_txn(spark, df, t, "app", 3) is None
        # and the next epoch appends on top of the checkpoint
        assert delta_append_txn(spark, df, t, "app", 4) == 5
        assert read_delta(spark, t).count() == 4
        # truncated versions are honestly unavailable
        with pytest.raises(ValueError, match="missing commits"):
            read_delta(spark, t, version=2)

    def test_checkpoint_requires_commits(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_checkpoint

        with pytest.raises(FileNotFoundError):
            delta_checkpoint(spark, str(tmp_path / "nope"))
