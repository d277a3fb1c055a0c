"""Delta Lake reader: hand-rolled transaction logs per the public
protocol — commits, removes, time travel, partition restoration,
checkpoints, and the honest gates."""

import glob
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources.delta import (
    delta_versions,
    read_delta,
)

SCHEMA_JSON = {
    "type": "struct",
    "fields": [
        {"name": "id", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ],
}


def _write_data_file(spark, rows, table, name):
    tmp = os.path.join(table, "_tmp_write")
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(os.path.join(table, name)), exist_ok=True)
    shutil.move(src, os.path.join(table, name))
    shutil.rmtree(tmp)


def _commit(table, version, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _meta(partition_cols=()):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000001",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(SCHEMA_JSON),
            "partitionColumns": list(partition_cols),
            "configuration": {},
        }
    }


def _add(path, pv=None):
    return {
        "add": {
            "path": path,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    os.makedirs(t)
    _write_data_file(spark, [(1, "a"), (2, "b")], t, "f0.parquet")
    _write_data_file(spark, [(3, "c")], t, "f1.parquet")
    _write_data_file(spark, [(1, "a"), (2, "b"), (3, "c")], t, "f2.parquet")
    _commit(t, 0, [_meta(), _add("f0.parquet")])
    _commit(t, 1, [_add("f1.parquet")])
    # compaction: f0+f1 rewritten as f2
    _commit(
        t,
        2,
        [
            {"remove": {"path": "f0.parquet", "dataChange": False}},
            {"remove": {"path": "f1.parquet", "dataChange": False}},
            _add("f2.parquet"),
        ],
    )
    return t


def test_latest_and_time_travel(spark, table):
    assert delta_versions(table) == [0, 1, 2]
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == [1, 2, 3]
    assert sorted(
        r["id"] for r in read_delta(spark, table, version=0).collect()
    ) == [1, 2]
    assert sorted(
        r["id"] for r in read_delta(spark, table, version=1).collect()
    ) == [1, 2, 3]
    # pinned snapshot: v1 reads f0+f1, not the compacted f2
    v1 = read_delta(spark, table, version=1)
    files = {
        os.path.basename(r[0])
        for r in v1.select(F.input_file_name()).distinct().collect()
    }
    assert files == {"f0.parquet", "f1.parquet"}


def test_partition_columns_restored(spark, tmp_path):
    t = str(tmp_path / "ptbl")
    os.makedirs(t)
    # Delta stores partition columns OUTSIDE the data files
    schema = {
        "type": "struct",
        "fields": SCHEMA_JSON["fields"]
        + [{"name": "lang", "type": "string", "nullable": True, "metadata": {}}],
    }
    _write_data_file(spark, [(1, "a")], t, "lang=en/f0.parquet")
    _write_data_file(spark, [(2, "b")], t, "lang=de/f1.parquet")
    meta = _meta(("lang",))
    meta["metaData"]["schemaString"] = json.dumps(schema)
    _commit(
        t,
        0,
        [
            meta,
            _add("lang=en/f0.parquet", {"lang": "en"}),
            _add("lang=de/f1.parquet", {"lang": "de"}),
        ],
    )
    got = {
        (r["id"], r["lang"]) for r in read_delta(spark, t).collect()
    }
    assert got == {(1, "en"), (2, "de")}


def test_checkpoint_replaces_early_commits(spark, table):
    # checkpoint at v1, then DELETE commits 0 and 1 (vacuumed log)
    log = os.path.join(table, "_delta_log")
    lines = [
        json.dumps(_meta()),
        json.dumps(_add("f0.parquet")),
        json.dumps(_add("f1.parquet")),
    ]
    cp = spark.read.json(spark.sparkContext.parallelize(lines))
    cp.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(log, "_cp_tmp")
    )
    src = glob.glob(os.path.join(log, "_cp_tmp", "part-*.parquet"))[0]
    shutil.move(src, os.path.join(log, f"{1:020d}.checkpoint.parquet"))
    shutil.rmtree(os.path.join(log, "_cp_tmp"))
    os.remove(os.path.join(log, f"{0:020d}.json"))
    os.remove(os.path.join(log, f"{1:020d}.json"))
    # latest still resolves through checkpoint + commit 2
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == [1, 2, 3]
    v1 = read_delta(spark, table, version=1)  # checkpoint alone
    assert sorted(r["id"] for r in v1.collect()) == [1, 2, 3]
    files = {
        os.path.basename(r[0])
        for r in v1.select(F.input_file_name()).distinct().collect()
    }
    assert files == {"f0.parquet", "f1.parquet"}


def test_missing_commit_detected(spark, table):
    os.remove(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="missing commits"):
        read_delta(spark, table)


def test_unknown_dv_storage_type_raises(spark, table):
    # deletion vectors are applied for real now (tests/test_delta_dv.py);
    # an unrecognized storage type must still fail loudly, not
    # over-return rows
    _write_data_file(spark, [(9, "z")], table, "f3.parquet")
    a = _add("f3.parquet")
    a["add"]["deletionVector"] = {
        "storageType": "z",
        "pathOrInlineDv": "x",
        "cardinality": 1,
    }
    _commit(table, 3, [a])
    with pytest.raises(Exception, match="storageType"):
        read_delta(spark, table).collect()


def test_empty_active_set_returns_schema(spark, tmp_path):
    t = str(tmp_path / "etbl")
    os.makedirs(t)
    _write_data_file(spark, [(1, "a")], t, "f0.parquet")
    _commit(t, 0, [_meta(), _add("f0.parquet")])
    _commit(t, 1, [{"remove": {"path": "f0.parquet", "dataChange": True}}])
    df = read_delta(spark, t)
    assert df.count() == 0
    assert df.columns == ["id", "v"]


def test_not_a_delta_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_delta(spark, str(tmp_path / "nope"))


class TestDeltaAppend:
    def test_create_and_append_roundtrip(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import (
            delta_append,
            delta_versions,
        )

        t = str(tmp_path / "wtbl")
        d0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        d1 = spark.createDataFrame([(3, "c")], "id long, v string")
        assert delta_append(spark, d0, t) == 0
        assert delta_append(spark, d1, t) == 1
        assert delta_versions(t) == [0, 1]
        assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 2, 3]
        assert sorted(
            r["id"] for r in read_delta(spark, t, version=0).collect()
        ) == [1, 2]
        # v0 carries protocol + metaData; v1 only adds
        import json as _json

        lines0 = [
            _json.loads(ln)
            for ln in open(os.path.join(t, "_delta_log", f"{0:020d}.json"))
        ]
        assert any("protocol" in a for a in lines0)
        assert any("metaData" in a for a in lines0)

    def test_partitioned_append(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_append

        t = str(tmp_path / "ptbl")
        d = spark.createDataFrame(
            [(1, "en"), (2, "de"), (3, "en")], "id long, lang string"
        )
        delta_append(spark, d, t, partition_by=["lang"])
        got = {(r["id"], r["lang"]) for r in read_delta(spark, t).collect()}
        assert got == {(1, "en"), (2, "de"), (3, "en")}
        # partition column stored OUTSIDE the data files
        files = glob.glob(os.path.join(t, "lang=en", "*.parquet"))
        assert files
        cols = spark.read.parquet(files[0]).columns
        assert "lang" not in cols

    def test_commit_race_retries(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_append

        t = str(tmp_path / "rtbl")
        d = spark.createDataFrame([(1, "a")], "id long, v string")
        delta_append(spark, d, t)
        # a concurrent writer claimed version 1 already
        with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
            f.write(json.dumps({"commitInfo": {}}) + "\n")
        v = delta_append(spark, d, t)
        assert v == 2
        assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 1]

    def test_schema_mismatch_rejected(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_append

        t = str(tmp_path / "mtbl")
        delta_append(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        with pytest.raises(ValueError, match="schema mismatch"):
            delta_append(
                spark, spark.createDataFrame([(1,)], "only long"), t
            )


def test_null_partition_value_sorts(spark, tmp_path):
    t = str(tmp_path / "ntbl")
    os.makedirs(t)
    schema = {
        "type": "struct",
        "fields": SCHEMA_JSON["fields"]
        + [{"name": "lang", "type": "string", "nullable": True, "metadata": {}}],
    }
    _write_data_file(spark, [(1, "a")], t, "lang=en/f0.parquet")
    _write_data_file(spark, [(2, "b")], t, "lang=null/f1.parquet")
    meta = _meta(("lang",))
    meta["metaData"]["schemaString"] = json.dumps(schema)
    _commit(
        t, 0,
        [meta, _add("lang=en/f0.parquet", {"lang": "en"}),
         _add("lang=null/f1.parquet", {"lang": None})],
    )
    got = {(r["id"], r["lang"]) for r in read_delta(spark, t).collect()}
    assert got == {(1, "en"), (2, None)}


def test_checkpoint_only_log_reads_latest(spark, table):
    # checkpoint at v2 and EVERY json removed: latest = checkpoint state
    log = os.path.join(table, "_delta_log")
    lines = [json.dumps(_meta()), json.dumps(_add("f2.parquet"))]
    cp = spark.read.json(spark.sparkContext.parallelize(lines))
    cp.coalesce(1).write.mode("overwrite").parquet(os.path.join(log, "_t"))
    src = glob.glob(os.path.join(log, "_t", "part-*.parquet"))[0]
    shutil.move(src, os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    shutil.rmtree(os.path.join(log, "_t"))
    for v in (0, 1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert sorted(r["id"] for r in read_delta(spark, table).collect()) == [1, 2, 3]


def test_creation_race_does_not_duplicate_metadata(spark, tmp_path):
    from dataset_grouper_spark.sources.delta import delta_append

    t = str(tmp_path / "racetbl")
    # the "winner" created the table between our existence check and
    # our commit claim: pre-create an EMPTY log dir (exists=False for
    # the loser) holding the winner's v0
    os.makedirs(os.path.join(t, "_delta_log"))
    _write_data_file(spark, [(9, "w")], t, "winner.parquet")
    _commit(t, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        _meta(),
        _add("winner.parquet"),
    ])
    # loser appends; must NOT re-commit protocol/metaData at v1
    v = delta_append(
        spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
    )
    assert v == 1
    lines1 = [
        json.loads(ln)
        for ln in open(os.path.join(t, "_delta_log", f"{1:020d}.json"))
    ]
    assert not any("metaData" in a or "protocol" in a for a in lines1)
    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 9]
    # and a loser with a MISMATCHED schema is rejected, not committed
    with pytest.raises(ValueError, match="schema mismatch"):
        # fresh empty-log race with wrong schema
        t2 = str(tmp_path / "racetbl2")
        os.makedirs(os.path.join(t2, "_delta_log"))
        _write_data_file(spark, [(9, "w")], t2, "winner.parquet")
        _commit(t2, 0, [_meta(), _add("winner.parquet")])
        delta_append(spark, spark.createDataFrame([(1,)], "only long"), t2)


class TestDeltaChanges:
    def test_incremental_reads_and_matview_composition(self, spark, tmp_path):
        """read_delta_changes feeds a matview fold incrementally: after
        consuming every commit's change set, the rollup equals the
        full-table GROUP BY — the CDC-lite contract."""
        from pyspark.sql import functions as F

        from dataset_grouper_spark.operators import matview
        from dataset_grouper_spark.sources.delta import (
            delta_append,
            read_delta_changes,
        )

        t = str(tmp_path / "cdc")
        batches = [
            [(1, "en"), (2, "de")],
            [(3, "en")],
            [(4, "fr"), (5, "en")],
        ]
        for rows in batches:
            delta_append(
                spark,
                spark.createDataFrame(rows, "id long, lang string"),
                t,
            )
        mv = os.path.join(str(tmp_path), "mv")
        sums = {"n": F.lit(1), "sum_ids": F.col("id")}
        matview.create_materialized_sums(
            read_delta_changes(spark, t, -1, 0), ["lang"], sums, mv
        )
        for v in (1, 2):
            batch = read_delta_changes(spark, t, v - 1, v)
            matview.refresh_materialized_sums(
                spark, batch, ["lang"], sums, mv, tag=f"v{v}"
            )
        got = {
            r["lang"]: (r["n"], r["sum_ids"])
            for r in spark.read.parquet(mv).collect()
        }
        assert got == {"en": (3, 9), "de": (1, 2), "fr": (1, 4)}

    def test_empty_range_and_missing_commits(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import (
            delta_append,
            read_delta_changes,
        )

        t = str(tmp_path / "cdc2")
        for rows in ([(1, "a")], [(2, "b")]):
            delta_append(
                spark, spark.createDataFrame(rows, "id long, v string"), t
            )
        assert read_delta_changes(spark, t, 1).count() == 0  # no new commits
        os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
        with pytest.raises(ValueError, match="missing commits"):
            read_delta_changes(spark, t, -1)

    def test_data_removing_commit_rejected(self, spark, table):
        from dataset_grouper_spark.sources.delta import read_delta_changes

        # fixture commit 2 removes with dataChange=False (compaction):
        # allowed — the change set is the compacted add? No: compaction
        # adds carry dataChange=True in the fixture, so range (1,2]
        # returns f2's rows; a TRUE delete (dataChange=true remove)
        # must raise
        _commit(table, 3, [
            {"remove": {"path": "f2.parquet", "dataChange": True}},
        ])
        with pytest.raises(ValueError, match="append-only"):
            read_delta_changes(spark, table, 2)


class TestColumnMapping:
    """delta.columnMapping.mode=name: data lives under physical
    col-<uuid> names; the reader must scan physical, return logical."""

    MAPPED_SCHEMA = {
        "type": "struct",
        "fields": [
            {
                "name": "id", "type": "long", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaa",
                },
            },
            {
                "name": "v", "type": "string", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbb",
                },
            },
        ],
    }

    def _mapped_meta(self, partition_cols=()):
        return {
            "metaData": {
                "id": "00000000-0000-0000-0000-000000000002",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(self.MAPPED_SCHEMA),
                "partitionColumns": list(partition_cols),
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }

    def _write_physical(self, spark, rows, table, name, cols):
        tmp = os.path.join(table, "_tmp_write")
        (
            spark.createDataFrame(rows, "id long, v string")
            .toDF(*cols)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.makedirs(
            os.path.dirname(os.path.join(table, name)), exist_ok=True
        )
        shutil.move(src, os.path.join(table, name))
        shutil.rmtree(tmp)

    def test_unpartitioned_mapped_read(self, spark, tmp_path):
        t = str(tmp_path / "mtbl")
        self._write_physical(
            spark, [(1, "a"), (2, "b")], t, "f0.parquet",
            ["col-aaa", "col-bbb"],
        )
        _commit(t, 0, [self._mapped_meta(), _add("f0.parquet")])
        df = read_delta(spark, t)
        assert df.columns == ["id", "v"]
        assert sorted((r["id"], r["v"]) for r in df.collect()) == [
            (1, "a"), (2, "b"),
        ]

    def test_partitioned_mapped_read(self, spark, tmp_path):
        # partition column v: physical key col-bbb in partitionValues,
        # data files carry only col-aaa
        t = str(tmp_path / "ptbl")
        tmp = os.path.join(t, "_tmp_write")
        spark.createDataFrame([(1,)], "id long").toDF("col-aaa").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.makedirs(t, exist_ok=True)
        shutil.move(src, os.path.join(t, "fa.parquet"))
        shutil.rmtree(tmp)
        _commit(
            t, 0,
            [
                self._mapped_meta(partition_cols=["v"]),
                _add("fa.parquet", pv={"col-bbb": "en"}),
            ],
        )
        got = read_delta(spark, t).collect()
        assert [(r["id"], r["v"]) for r in got] == [(1, "en")]

    def test_delete_where_on_mapped_table(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_delete_where

        t = str(tmp_path / "dtbl")
        self._write_physical(
            spark, [(i, f"r{i}") for i in range(6)], t, "f0.parquet",
            ["col-aaa", "col-bbb"],
        )
        _commit(t, 0, [self._mapped_meta(), _add("f0.parquet")])
        v = delta_delete_where(spark, t, "id % 2 = 0")
        assert v == 1
        assert sorted(
            r["id"] for r in read_delta(spark, t).collect()
        ) == [1, 3, 5]

    def test_change_feed_on_mapped_table(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import read_delta_changes

        t = str(tmp_path / "ctbl")
        self._write_physical(
            spark, [(1, "a")], t, "f0.parquet", ["col-aaa", "col-bbb"]
        )
        _commit(t, 0, [self._mapped_meta(), _add("f0.parquet")])
        self._write_physical(
            spark, [(2, "b")], t, "f1.parquet", ["col-aaa", "col-bbb"]
        )
        _commit(t, 1, [_add("f1.parquet")])
        got = read_delta_changes(spark, t, from_version=0)
        assert [(r["id"], r["v"]) for r in got.collect()] == [(2, "b")]

    def test_append_writes_physical_names(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_append

        t = str(tmp_path / "watbl")
        self._write_physical(
            spark, [(1, "a")], t, "f0.parquet", ["col-aaa", "col-bbb"]
        )
        _commit(t, 0, [self._mapped_meta(), _add("f0.parquet")])
        delta_append(
            spark, spark.createDataFrame([(2, "b")], "id long, v string"), t
        )
        got = read_delta(spark, t)
        assert sorted((r["id"], r["v"]) for r in got.collect()) == [
            (1, "a"), (2, "b"),
        ]
        # the appended file itself carries PHYSICAL column names
        import pyarrow.parquet as pq

        new_files = [
            p
            for p in glob.glob(os.path.join(t, "*.parquet"))
            if os.path.basename(p) != "f0.parquet"
        ]
        assert new_files
        for p in new_files:
            assert set(pq.read_schema(p).names) == {"col-aaa", "col-bbb"}

    def test_merge_schema_assigns_field_ids(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import (
            _latest_version,
            _replay,
            delta_append,
        )

        t = str(tmp_path / "wstbl")
        self._write_physical(
            spark, [(1, "a")], t, "f0.parquet", ["col-aaa", "col-bbb"]
        )
        meta = self._mapped_meta()
        meta["metaData"]["configuration"][
            "delta.columnMapping.maxColumnId"
        ] = "2"
        _commit(t, 0, [meta, _add("f0.parquet")])
        delta_append(
            spark,
            spark.createDataFrame(
                [(2, "b", 7.5)], "id long, v string, score double"
            ),
            t,
            merge_schema=True,
        )
        _adds2, m2 = _replay(spark, t, _latest_version(t))
        fields = json.loads(m2["schemaString"])["fields"]
        new = next(f for f in fields if f["name"] == "score")
        assert new["metadata"]["delta.columnMapping.id"] == 3
        assert new["metadata"]["delta.columnMapping.physicalName"].startswith(
            "col-"
        )
        assert m2["configuration"]["delta.columnMapping.maxColumnId"] == "3"
        got = read_delta(spark, t)
        rows = sorted(
            (r["id"], r["v"], r["score"]) for r in got.collect()
        )
        assert rows == [(1, "a", None), (2, "b", 7.5)]
        # a SECOND append with the evolved schema writes the new
        # column under its assigned physical name
        delta_append(
            spark,
            spark.createDataFrame(
                [(3, "c", 1.25)], "id long, v string, score double"
            ),
            t,
        )
        assert read_delta(spark, t).filter("score = 1.25").count() == 1

    def test_merge_into_mapped_table(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_merge

        t = str(tmp_path / "wmtbl")
        self._write_physical(
            spark, [(i, f"r{i}") for i in range(6)], t, "f0.parquet",
            ["col-aaa", "col-bbb"],
        )
        self._write_physical(
            spark, [(i, f"r{i}") for i in range(6, 10)], t, "f1.parquet",
            ["col-aaa", "col-bbb"],
        )
        _commit(
            t, 0,
            [self._mapped_meta(), _add("f0.parquet"), _add("f1.parquet")],
        )
        src = spark.createDataFrame(
            [(2, "UPD"), (99, "NEW")], "id long, v string"
        )
        delta_merge(spark, src, t, on=["id"])
        got = {(r["id"], r["v"]) for r in read_delta(spark, t).collect()}
        want = {(i, f"r{i}") for i in range(10) if i != 2}
        want |= {(2, "UPD"), (99, "NEW")}
        assert got == want
        # untouched file f1 survives by reference; rewrites physical
        import pyarrow.parquet as pq

        for p in glob.glob(os.path.join(t, "*.parquet")):
            assert set(pq.read_schema(p).names) == {"col-aaa", "col-bbb"}

    def test_merge_into_mapped_partitioned_table(self, spark, tmp_path):
        from dataset_grouper_spark.sources.delta import delta_merge

        t = str(tmp_path / "wptbl")
        tmp = os.path.join(t, "_tmp_write")
        for name, ids, lang in (
            ("fa.parquet", [1, 2], "en"), ("fb.parquet", [3, 4], "de"),
        ):
            spark.createDataFrame(
                [(i,) for i in ids], "id long"
            ).toDF("col-aaa").coalesce(1).write.mode("overwrite").parquet(tmp)
            src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(src, os.path.join(t, name))
            shutil.rmtree(tmp)
        _commit(
            t, 0,
            [
                self._mapped_meta(partition_cols=["v"]),
                _add("fa.parquet", pv={"col-bbb": "en"}),
                _add("fb.parquet", pv={"col-bbb": "de"}),
            ],
        )
        src = spark.createDataFrame(
            [(2, "en"), (9, "fr")], "id long, v string"
        )
        delta_merge(spark, src, t, on=["id"])
        got = {(r["id"], r["v"]) for r in read_delta(spark, t).collect()}
        assert got == {(1, "en"), (2, "en"), (3, "de"), (4, "de"), (9, "fr")}
        # new partition dirs carry the PHYSICAL key name
        from dataset_grouper_spark.sources.delta import (
            _latest_version,
            _replay,
        )

        adds, _m = _replay(spark, t, _latest_version(t))
        langs = {
            (a.get("partitionValues") or {}).get("col-bbb")
            for a in adds.values()
        }
        assert langs == {"en", "de", "fr"}
