"""Iceberg v2 EQUALITY deletes: sequence-number-ordered delete-by-key
(write via iceberg_delete_values, apply in read_iceberg)."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.iceberg import (
    _load_metadata,
    iceberg_append,
    iceberg_delete_values,
    iceberg_delete_where,
    read_iceberg,
)


def _ids(spark, t, **kw):
    return sorted(r["id"] for r in read_iceberg(spark, t, **kw).collect())


def _fresh(spark, tmp_path, rows, name="eq_tbl"):
    t = str(tmp_path / name)
    iceberg_append(spark, spark.createDataFrame(rows, "id long, v string"), t)
    return t


class TestDeleteValues:
    def test_delete_by_key(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(i, f"v{i}") for i in range(10)])
        snap = iceberg_delete_values(
            spark, spark.createDataFrame([(3,), (7,)], "id long"), t
        )
        assert _ids(spark, t) == [0, 1, 2, 4, 5, 6, 8, 9]
        # the pre-delete snapshot is untouched (time travel)
        assert _ids(spark, t, snapshot_id=snap - 1) == list(range(10))

    def test_reinsert_after_delete_survives(self, spark, tmp_path):
        # the CDC convergence property: delete key, append key again —
        # the new row's data sequence number EXCEEDS the delete's
        t = _fresh(spark, tmp_path, [(1, "old"), (2, "keep")])
        iceberg_delete_values(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        iceberg_append(
            spark, spark.createDataFrame([(1, "new")], "id long, v string"), t
        )
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "new"), (2, "keep")}

    def test_delete_applies_to_all_older_files(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a")])
        iceberg_append(
            spark, spark.createDataFrame([(1, "b"), (2, "c")],
                                         "id long, v string"), t
        )
        iceberg_delete_values(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        # BOTH older copies of id=1 (different appends) are removed
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(2, "c")}

    def test_multi_column_key(self, spark, tmp_path):
        t = _fresh(
            spark, tmp_path,
            [(1, "a"), (1, "b"), (2, "a"), (2, "b")],
        )
        iceberg_delete_values(
            spark,
            spark.createDataFrame([(1, "b"), (2, "a")], "id long, v string"),
            t,
        )
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "a"), (2, "b")}

    def test_null_keys_match_null_safe(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(None, "x"), (1, "y")])
        iceberg_delete_values(
            spark,
            spark.createDataFrame([(None,)], "id long"),
            t,
        )
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "y")}

    def test_composes_with_position_deletes(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(i, "odd" if i % 2 else "even")
                                     for i in range(10)])
        iceberg_delete_where(spark, t, "v = 'odd'")
        iceberg_delete_values(
            spark, spark.createDataFrame([(4,), (5,)], "id long"), t
        )
        assert _ids(spark, t) == [0, 2, 6, 8]

    def test_empty_key_frame_is_noop(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a")])
        meta0 = _load_metadata(t)
        snap = iceberg_delete_values(
            spark,
            spark.createDataFrame([], "id long"),
            t,
        )
        assert snap == meta0["current-snapshot-id"]
        assert _ids(spark, t) == [1]

    def test_unknown_key_column_raises(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a")])
        with pytest.raises(ValueError, match="not in the"):
            iceberg_delete_values(
                spark, spark.createDataFrame([(1,)], "nope long"), t
            )

    def test_position_delete_stacks_on_equality(self, spark, tmp_path):
        # the Flink-CDC + GDPR composition: equality-delete a key, then
        # predicate-delete on the CURRENT view
        t = _fresh(spark, tmp_path, [(1, "a"), (2, "b"), (3, "b")])
        iceberg_delete_values(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        iceberg_delete_where(spark, t, "v = 'b' AND id = 2")
        assert _ids(spark, t) == [3]

    def test_position_delete_over_equality_rerun_noop(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a"), (2, "b"), (3, "b")])
        iceberg_delete_values(
            spark, spark.createDataFrame([(3,)], "id long"), t
        )
        s1 = iceberg_delete_where(spark, t, "v = 'b'")  # kills only id=2
        assert _ids(spark, t) == [1]
        # re-run: every 'b' row is already dead (one by equality, one by
        # position) — no new snapshot
        s2 = iceberg_delete_where(spark, t, "v = 'b'")
        assert s2 == s1
        assert _ids(spark, t) == [1]

    def test_position_delete_respects_equality_sequence(self, spark, tmp_path):
        # a key re-inserted AFTER its equality delete is live again; a
        # predicate delete must see (and be able to kill) the NEW row
        t = _fresh(spark, tmp_path, [(1, "old"), (2, "keep")])
        iceberg_delete_values(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        iceberg_append(
            spark,
            spark.createDataFrame([(1, "new")], "id long, v string"),
            t,
        )
        iceberg_delete_where(spark, t, "v = 'new'")
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(2, "keep")}

    def test_sequence_numbers_recorded(self, spark, tmp_path):
        t = _fresh(spark, tmp_path, [(1, "a")])
        iceberg_delete_values(
            spark, spark.createDataFrame([(1,)], "id long"), t
        )
        iceberg_append(
            spark, spark.createDataFrame([(2, "b")], "id long, v string"), t
        )
        meta = _load_metadata(t)
        assert meta["last-sequence-number"] == 3
        seqs = [s.get("sequence-number") for s in meta["snapshots"]]
        assert seqs == [1, 2, 3]


class TestUpsert:
    def test_upsert_converges(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_upsert

        t = _fresh(spark, tmp_path, [(1, "a"), (2, "b")])
        iceberg_upsert(
            spark,
            spark.createDataFrame([(2, "B2"), (3, "c")], "id long, v string"),
            t,
            on=["id"],
        )
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "a"), (2, "B2"), (3, "c")}
        # second upsert of the same batch is idempotent in content
        iceberg_upsert(
            spark,
            spark.createDataFrame([(2, "B2"), (3, "c")], "id long, v string"),
            t,
            on=["id"],
        )
        got = {(r["id"], r["v"]) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "a"), (2, "B2"), (3, "c")}

    def test_missing_key_column_raises(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_upsert

        t = _fresh(spark, tmp_path, [(1, "a")])
        with pytest.raises(ValueError, match="key column"):
            iceberg_upsert(
                spark,
                spark.createDataFrame([(1, "a")], "id long, v string"),
                t,
                on=["nope"],
            )
