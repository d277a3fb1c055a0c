"""Iceberg reader: hand-built spec-shaped metadata + Avro manifests."""

import glob
import json
import os
import shutil

import pytest

from dataset_grouper_spark.sources.avro import write_avro_file
from dataset_grouper_spark.sources.iceberg import (
    iceberg_snapshots,
    read_iceberg,
)

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}

TABLE_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "string"},
    ],
}


def _write_data(spark, rows, table, name):
    tmp = os.path.join(table, "_tmp")
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(os.path.join(table, "data"), exist_ok=True)
    dst = os.path.join(table, "data", name)
    shutil.move(src, dst)
    shutil.rmtree(tmp)
    return dst


def _manifest(table, name, entries):
    p = os.path.join(table, "metadata", name)
    write_avro_file(p, MANIFEST_SCHEMA, entries)
    return p


def _mlist(table, name, manifest_paths, snap_id, content=0):
    p = os.path.join(table, "metadata", name)
    write_avro_file(
        p,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "content": content,
                "added_snapshot_id": snap_id,
            }
            for mp in manifest_paths
        ],
    )
    return p


def _entry(path, status=1):
    return {
        "status": status,
        "snapshot_id": None,
        "data_file": {
            "content": 0,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(path),
        },
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "iceberg_tbl")
    os.makedirs(os.path.join(t, "metadata"))
    f0 = _write_data(spark, [(1, "a"), (2, "b")], t, "f0.parquet")
    f1 = _write_data(spark, [(3, "c")], t, "f1.parquet")
    f2 = _write_data(spark, [(1, "a"), (2, "b"), (3, "c")], t, "f2.parquet")
    m0 = _manifest(t, "m0.avro", [_entry(f0)])
    m1 = _manifest(t, "m1.avro", [_entry(f1)])
    # snapshot 300 rewrites everything as f2, marking old files deleted
    m2 = _manifest(
        t, "m2.avro",
        [_entry(f0, status=2), _entry(f1, status=2), _entry(f2)],
    )
    ml100 = _mlist(t, "snap-100.avro", [m0], 100)
    ml200 = _mlist(t, "snap-200.avro", [m0, m1], 200)
    ml300 = _mlist(t, "snap-300.avro", [m2], 300)
    meta = {
        "format-version": 2,
        "table-uuid": "0" * 36,
        "location": t,
        "current-snapshot-id": 300,
        "schemas": [TABLE_SCHEMA],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "snapshots": [
            {"snapshot-id": 100, "timestamp-ms": 1, "manifest-list": ml100},
            {"snapshot-id": 200, "timestamp-ms": 2, "manifest-list": ml200},
            {"snapshot-id": 300, "timestamp-ms": 3, "manifest-list": ml300},
        ],
    }
    with open(os.path.join(t, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    return t


def test_current_and_time_travel(spark, table):
    assert [s["snapshot-id"] for s in iceberg_snapshots(table)] == [100, 200, 300]
    assert sorted(r["id"] for r in read_iceberg(spark, table).collect()) == [1, 2, 3]
    assert sorted(
        r["id"] for r in read_iceberg(spark, table, snapshot_id=100).collect()
    ) == [1, 2]
    assert sorted(
        r["id"] for r in read_iceberg(spark, table, snapshot_id=200).collect()
    ) == [1, 2, 3]
    # snapshot 200 reads the pre-rewrite files
    from pyspark.sql import functions as F

    files = {
        os.path.basename(r[0])
        for r in read_iceberg(spark, table, snapshot_id=200)
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert files == {"f0.parquet", "f1.parquet"}


def test_unknown_snapshot(spark, table):
    with pytest.raises(ValueError, match="snapshot"):
        read_iceberg(spark, table, snapshot_id=999)


def _delete_entry(path, content=1):
    import pyarrow.parquet as pq

    return {
        "status": 1,
        "snapshot_id": None,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": pq.ParquetFile(path).metadata.num_rows,
            "file_size_in_bytes": os.path.getsize(path),
        },
    }


def _add_delete_snapshot(spark, table, pairs, snap_id, content=1):
    """Commit a hand-built position-delete snapshot: parquet of
    (file_path, pos) rows + a content=1 delete manifest appended to
    the current snapshot's manifest list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dpath = os.path.join(table, "data", f"del-{snap_id}.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": [p for p, _ in pairs],
                "pos": pa.array([x for _, x in pairs], pa.int64()),
            }
        ),
        dpath,
    )
    meta = json.load(open(os.path.join(table, "metadata", "v2.metadata.json")))
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    from dataset_grouper_spark.sources.avro import read_avro_file

    _s, prev = read_avro_file(cur["manifest-list"])
    dm = _manifest(table, f"dm-{snap_id}.avro", [_delete_entry(dpath, content)])
    ml_rows = [
        {k: m[k] for k in ("manifest_path", "manifest_length",
                           "partition_spec_id", "content",
                           "added_snapshot_id")}
        for m in prev
    ] + [
        {
            "manifest_path": dm,
            "manifest_length": os.path.getsize(dm),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snap_id,
        }
    ]
    ml = os.path.join(table, "metadata", f"snap-{snap_id}.avro")
    write_avro_file(ml, MANIFEST_LIST_SCHEMA, ml_rows)
    meta["snapshots"].append(
        {"snapshot-id": snap_id, "timestamp-ms": snap_id, "manifest-list": ml}
    )
    meta["current-snapshot-id"] = snap_id
    with open(os.path.join(table, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)


class TestPositionDeletes:
    def test_read_applies_hand_built_position_deletes(self, spark, table):
        # current snapshot 300 reads f2.parquet = rows (1,a)(2,b)(3,c);
        # delete ordinals 0 and 2 of f2 -> only (2,b) survives
        f2 = os.path.join(table, "data", "f2.parquet")
        _add_delete_snapshot(spark, table, [(f2, 0), (f2, 2)], 400)
        got = read_iceberg(spark, table).collect()
        assert [(r["id"], r["v"]) for r in got] == [(2, "b")]

    def test_time_travel_before_deletes_sees_all_rows(self, spark, table):
        f2 = os.path.join(table, "data", "f2.parquet")
        _add_delete_snapshot(spark, table, [(f2, 1)], 400)
        pre = read_iceberg(spark, table, snapshot_id=300)
        assert sorted(r["id"] for r in pre.collect()) == [1, 2, 3]
        post = read_iceberg(spark, table, snapshot_id=400)
        assert sorted(r["id"] for r in post.collect()) == [1, 3]

    def test_scheme_insensitive_paths(self, spark, table):
        # delete rows recorded as file:// URIs must still match the
        # scan's file:/ metadata paths
        f2 = "file://" + os.path.join(table, "data", "f2.parquet")
        _add_delete_snapshot(spark, table, [(f2, 0)], 400)
        assert sorted(
            r["id"] for r in read_iceberg(spark, table).collect()
        ) == [2, 3]

    def test_equality_delete_without_ids_raises(self, spark, table):
        # content=2 entries MUST declare equality_ids; a malformed
        # delete file fails loudly instead of silently not applying
        f2 = os.path.join(table, "data", "f2.parquet")
        _add_delete_snapshot(spark, table, [(f2, 0)], 400, content=2)
        with pytest.raises(ValueError, match="equality_ids"):
            read_iceberg(spark, table)


class TestDeleteWhere:
    def _fresh(self, spark, tmp_path, rows):
        from dataset_grouper_spark.sources.iceberg import iceberg_append

        t = str(tmp_path / "mor_tbl")
        iceberg_append(
            spark, spark.createDataFrame(rows, "id long, v string"), t
        )
        return t

    def test_delete_where_roundtrip(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_delete_where

        t = self._fresh(
            spark, tmp_path, [(i, "even" if i % 2 == 0 else "odd")
                              for i in range(20)]
        )
        pre = read_iceberg(spark, t)
        snap = iceberg_delete_where(spark, t, "v = 'odd'")
        got = read_iceberg(spark, t)
        assert sorted(r["id"] for r in got.collect()) == list(range(0, 20, 2))
        # no data file rewritten: pre-delete snapshot still intact
        assert sorted(
            r["id"]
            for r in read_iceberg(spark, t, snapshot_id=snap - 1).collect()
        ) == list(range(20))
        assert pre.count() == 20

    def test_delete_composes_and_null_safe(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_delete_where

        t = self._fresh(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
        iceberg_delete_where(spark, t, "id = 1")
        iceberg_delete_where(spark, t, "id = 3")
        assert [r["id"] for r in read_iceberg(spark, t).collect()] == [2]

    def test_repeat_delete_is_noop(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import (
            iceberg_delete_where,
            iceberg_snapshots,
        )

        t = self._fresh(spark, tmp_path, [(1, "a"), (2, "b")])
        s1 = iceberg_delete_where(spark, t, "id = 1")
        s2 = iceberg_delete_where(spark, t, "id = 1")
        assert s2 == s1  # already-deleted rows never re-match
        assert len(iceberg_snapshots(t)) == 2  # append + one delete
        assert [r["id"] for r in read_iceberg(spark, t).collect()] == [2]

    def test_nothing_matches_is_noop(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_delete_where

        t = self._fresh(spark, tmp_path, [(1, "a")])
        s = iceberg_delete_where(spark, t, "id = 99")
        assert s == 1  # current snapshot unchanged
        assert read_iceberg(spark, t).count() == 1

    def test_bounded_delete_set_broadcasts(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_delete_where

        t = self._fresh(spark, tmp_path, [(i, "x") for i in range(10)])
        iceberg_delete_where(spark, t, "id < 3")
        plan = read_iceberg(spark, t)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_extra_manifest_fields_tolerated(spark, table):
    # real manifests carry stats columns; the reader must ignore them
    schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": MANIFEST_SCHEMA["fields"]
        + [{"name": "extra_stat", "type": ["null", "long"]}],
    }
    f3 = _write_data(spark, [(9, "z")], table, "f3.parquet")
    p = os.path.join(table, "metadata", "m3.avro")
    e = _entry(f3)
    e["extra_stat"] = 42
    write_avro_file(p, schema, [e])
    ml = _mlist(table, "snap-500.avro", [p], 500)
    meta = json.load(open(os.path.join(table, "metadata", "v2.metadata.json")))
    meta["snapshots"].append(
        {"snapshot-id": 500, "timestamp-ms": 5, "manifest-list": ml}
    )
    with open(os.path.join(table, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)
    got = read_iceberg(spark, table, snapshot_id=500)
    assert [r["id"] for r in got.collect()] == [9]


def test_not_an_iceberg_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, str(tmp_path / "nope"))


def test_time_travel_uses_snapshot_schema(spark, table):
    # schema evolution: current schema renames v -> txt; snapshot 200
    # (pre-rename) must still read with the OLD schema
    mpath = os.path.join(table, "metadata", "v2.metadata.json")
    meta = json.load(open(mpath))
    new_schema = {
        "type": "struct",
        "schema-id": 1,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "txt", "required": False, "type": "string"},
        ],
    }
    meta["schemas"].append(new_schema)
    meta["current-schema-id"] = 1
    for s in meta["snapshots"]:
        s["schema-id"] = 0 if s["snapshot-id"] < 300 else 1
    json.dump(meta, open(mpath, "w"))
    old = read_iceberg(spark, table, snapshot_id=200)
    assert old.columns == ["id", "v"]
    assert sorted(r["v"] for r in old.collect()) == ["a", "b", "c"]
    cur = read_iceberg(spark, table)
    assert cur.columns == ["id", "txt"]


def test_partition_filter_prunes_files(spark, tmp_path):
    t = str(tmp_path / "ptbl")
    os.makedirs(os.path.join(t, "metadata"))
    f_en = _write_data(spark, [(1, "en-doc")], t, "en.parquet")
    f_de = _write_data(spark, [(2, "de-doc")], t, "de.parquet")
    schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": MANIFEST_SCHEMA["fields"][:2]
        + [
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2p",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                        {
                            "name": "partition",
                            "type": {
                                "type": "map",
                                "values": ["null", "string"],
                            },
                        },
                    ],
                },
            }
        ],
    }
    entries = []
    for path, lang in ((f_en, "en"), (f_de, "de")):
        e = _entry(path)
        e["data_file"]["partition"] = {"lang": lang}
        entries.append(e)
    p = os.path.join(t, "metadata", "m.avro")
    write_avro_file(p, schema, entries)
    ml = _mlist(t, "snap-1.avro", [p], 1)
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "schemas": [TABLE_SCHEMA],
        "current-schema-id": 0,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}
        ],
    }
    json.dump(meta, open(os.path.join(t, "metadata", "v1.metadata.json"), "w"))
    from pyspark.sql import functions as F

    pruned = read_iceberg(spark, t, partition_filter={"lang": "en"})
    files = {
        os.path.basename(r[0])
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files == {"en.parquet"}  # de.parquet never scanned
    assert [r["id"] for r in pruned.collect()] == [1]
    # unfiltered read still sees both; unknown filter keys keep all
    assert read_iceberg(spark, t).count() == 2
    assert read_iceberg(spark, t, partition_filter={"zzz": "x"}).count() == 2


class TestIcebergAppend:
    def test_create_append_time_travel(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_append

        t = str(tmp_path / "wtbl")
        s1 = iceberg_append(
            spark,
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            t,
        )
        s2 = iceberg_append(
            spark, spark.createDataFrame([(3, "c")], "id long, v string"), t
        )
        assert [s["snapshot-id"] for s in iceberg_snapshots(t)] == [s1, s2]
        assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) == [1, 2, 3]
        assert sorted(
            r["id"] for r in read_iceberg(spark, t, snapshot_id=s1).collect()
        ) == [1, 2]

    def test_schema_mismatch_rejected(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import iceberg_append

        t = str(tmp_path / "mtbl")
        iceberg_append(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        with pytest.raises(ValueError, match="schema mismatch"):
            iceberg_append(
                spark, spark.createDataFrame([(1,)], "only long"), t
            )

    def test_writer_output_read_by_fixture_reader_paths(self, spark, tmp_path):
        # the writer's manifests ride the same reader as hand-built
        # fixtures: mixed history (hand fixture snapshot after writer
        # snapshots) still reads coherently
        from dataset_grouper_spark.sources.iceberg import iceberg_append

        t = str(tmp_path / "xtbl")
        iceberg_append(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        df = read_iceberg(spark, t)
        assert df.columns == ["id", "v"]
        assert df.count() == 1


class TestTransformPruning:
    """Partition-spec transforms: raw filter values translate through
    bucket/truncate/day before manifest-level file pruning."""

    def _table(self, spark, tmp_path, spec_fields, files, pv_type="long"):
        # files: [(name, rows, partition_dict)]
        t = str(tmp_path / "ttbl")
        os.makedirs(os.path.join(t, "metadata"))
        schema = {
            "type": "record",
            "name": "manifest_entry",
            "fields": MANIFEST_SCHEMA["fields"][:2]
            + [
                {
                    "name": "data_file",
                    "type": {
                        "type": "record",
                        "name": "r2t",
                        "fields": [
                            {"name": "content", "type": "int"},
                            {"name": "file_path", "type": "string"},
                            {"name": "file_format", "type": "string"},
                            {"name": "record_count", "type": "long"},
                            {"name": "file_size_in_bytes", "type": "long"},
                            {
                                "name": "partition",
                                "type": {
                                    "type": "map",
                                    "values": ["null", pv_type],
                                },
                            },
                        ],
                    },
                }
            ],
        }
        entries = []
        for name, rows, part in files:
            p = _write_data(spark, rows, t, name)
            e = _entry(p)
            e["data_file"]["partition"] = part
            entries.append(e)
        mp = os.path.join(t, "metadata", "m.avro")
        write_avro_file(mp, schema, entries)
        ml = _mlist(t, "snap-1.avro", [mp], 1)
        meta = {
            "format-version": 2,
            "current-snapshot-id": 1,
            "schemas": [TABLE_SCHEMA],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "default-spec-id": 0,
            "snapshots": [
                {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}
            ],
        }
        json.dump(
            meta, open(os.path.join(t, "metadata", "v1.metadata.json"), "w")
        )
        return t

    def _scanned(self, df):
        from pyspark.sql import functions as F

        return {
            os.path.basename(r[0])
            for r in df.select(F.input_file_name()).distinct().collect()
        }

    def test_bucket_transform_prunes(self, spark, tmp_path):
        from dataset_grouper_spark.sources.iceberg import _murmur3_32
        import struct

        want_bucket = (_murmur3_32(struct.pack("<q", 34)) & 0x7FFFFFFF) % 4
        other = (want_bucket + 1) % 4
        t = self._table(
            spark, tmp_path,
            [{"name": "id_bucket", "transform": "bucket[4]",
              "source-id": 1, "field-id": 1000}],
            [
                ("hit.parquet", [(34, "x")], {"id_bucket": want_bucket}),
                ("miss.parquet", [(7, "y")], {"id_bucket": other}),
            ],
        )
        pruned = read_iceberg(spark, t, partition_filter={"id": 34})
        assert self._scanned(pruned) == {"hit.parquet"}

    def test_truncate_transform_prunes(self, spark, tmp_path):
        t = self._table(
            spark, tmp_path,
            [{"name": "v_trunc", "transform": "truncate[2]",
              "source-id": 2, "field-id": 1000}],
            [
                ("ab.parquet", [(1, "abc")], {"v_trunc": "ab"}),
                ("zz.parquet", [(2, "zzz")], {"v_trunc": "zz"}),
            ],
            pv_type="string",
        )
        pruned = read_iceberg(spark, t, partition_filter={"v": "abq"})
        assert self._scanned(pruned) == {"ab.parquet"}

    def test_unknown_transform_never_prunes(self, spark, tmp_path):
        t = self._table(
            spark, tmp_path,
            [{"name": "id_void", "transform": "void",
              "source-id": 1, "field-id": 1000}],
            [
                ("a.parquet", [(1, "a")], {"id_void": 0}),
                ("b.parquet", [(2, "b")], {"id_void": 0}),
            ],
        )
        # void transform carries no information: both files scanned
        assert read_iceberg(
            spark, t, partition_filter={"id": 1}
        ).count() == 2
