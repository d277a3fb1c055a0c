"""Metadata-only table conversion (sources/convert.py): the same
parquet files exposed through another format's metadata — zero data
movement, shallow-clone semantics, honest gates."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources import convert, delta, hudi, iceberg


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_to_iceberg_shares_files(spark, tmp_path):
    d = str(tmp_path / "dtbl")
    i = str(tmp_path / "itbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).coalesce(1)
    delta.delta_append(spark, df, d)
    delta.delta_append(
        spark,
        spark.createDataFrame([(4, "d")], "id long, v string").coalesce(1),
        d,
    )
    snap = convert.convert_delta_to_iceberg(spark, d, i)
    assert _rows(iceberg.read_iceberg(spark, i)) == _rows(
        delta.read_delta(spark, d)
    )
    # genuinely zero-copy: no data files under the target
    import os

    assert not os.path.isdir(os.path.join(i, "data"))
    # record counts rode over from Delta stats (manifest metadata)
    parts = iceberg.iceberg_partitions(spark, i).collect()
    assert sum(r["n_rows"] for r in parts) == 4
    # the target is a full Iceberg table: its own appends work
    iceberg.iceberg_append(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string").coalesce(1),
        i,
    )
    assert len(_rows(iceberg.read_iceberg(spark, i))) == 5
    # ...and do NOT leak back into the Delta source
    assert len(_rows(delta.read_delta(spark, d))) == 4
    assert snap == 1


def test_delta_to_iceberg_gates(spark, tmp_path):
    d = str(tmp_path / "dtbl2")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1)
    delta.delta_append(spark, df, d)
    delta.delta_delete_where(spark, d, F.col("id") == 1)
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        convert.convert_delta_to_iceberg(
            spark, d, str(tmp_path / "itbl2")
        )
    dp = str(tmp_path / "dtbl3")
    delta.delta_append(
        spark,
        spark.createDataFrame(
            [(1, "en"), (2, "de")], "id long, lang string"
        ),
        dp,
        partition_by=["lang"],
    )
    with pytest.raises(NotImplementedError, match="partitioned"):
        convert.convert_delta_to_iceberg(
            spark, dp, str(tmp_path / "itbl3")
        )


def test_iceberg_to_delta_shares_files(spark, tmp_path):
    i = str(tmp_path / "itbl4")
    d = str(tmp_path / "dtbl4")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).coalesce(1)
    iceberg.iceberg_append(spark, df, i)
    convert.convert_iceberg_to_delta(spark, i, d)
    assert _rows(delta.read_delta(spark, d)) == _rows(
        iceberg.read_iceberg(spark, i)
    )
    # numRecords stats rode over: delta_partitions sums exactly
    parts = delta.delta_partitions(spark, d).collect()
    assert sum(r["n_rows"] for r in parts) == 3
    # live MoR deletes gate
    iceberg.iceberg_delete_where(spark, i, F.col("id") == 2)
    with pytest.raises(NotImplementedError, match="deletes"):
        convert.convert_iceberg_to_delta(spark, i, str(tmp_path / "d5"))


def test_iceberg_identity_partitioned_to_delta(spark, tmp_path):
    i = str(tmp_path / "itbl6")
    d = str(tmp_path / "dtbl6")
    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], "id long, lang string"
    ).coalesce(1)
    iceberg.iceberg_append(spark, df, i, partition_spec=[("lang", "identity")])
    convert.convert_iceberg_to_delta(spark, i, d)
    # identity partitions: source columns live IN the files, so the
    # Delta view reads them as plain columns
    assert _rows(delta.read_delta(spark, d)) == _rows(df)


def test_hudi_to_delta_shares_files(spark, tmp_path):
    h = str(tmp_path / "htbl7")
    d = str(tmp_path / "dtbl7")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1)
    hudi.hudi_insert(spark, df, h, record_key="id")
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame([(2, "B")], "id long, v string").coalesce(1),
        h,
    )
    convert.convert_hudi_to_delta(spark, h, d)
    # _hoodie_* meta columns projected away by the Delta scan schema
    got = delta.read_delta(spark, d)
    assert sorted(got.columns) == ["id", "v"]
    assert _rows(got) == [(1, "a"), (2, "B")]


def test_hudi_mor_logs_gate_conversion(spark, tmp_path):
    h = str(tmp_path / "htbl8")
    df = spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1)
    hudi.hudi_insert(
        spark, df, h, record_key="id", table_type="MERGE_ON_READ"
    )
    hudi.hudi_mor_upsert(
        spark,
        spark.createDataFrame([(1, "A")], "id long, v string").coalesce(1),
        h,
    )
    with pytest.raises(NotImplementedError, match="MoR log"):
        convert.convert_hudi_to_delta(spark, h, str(tmp_path / "d8"))
    # after compaction the conversion goes through
    hudi.hudi_compact(spark, h)
    convert.convert_hudi_to_delta(spark, h, str(tmp_path / "d8"))
    assert _rows(delta.read_delta(spark, str(tmp_path / "d8"))) == [(1, "A")]


def test_hudi_to_iceberg_shares_files(spark, tmp_path):
    h = str(tmp_path / "htbl9")
    i = str(tmp_path / "itbl9")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1)
    hudi.hudi_insert(spark, df, h, record_key="id")
    convert.convert_hudi_to_iceberg(spark, h, i)
    got = iceberg.read_iceberg(spark, i)
    assert sorted(got.columns) == ["id", "v"]
    assert _rows(got) == [(1, "a"), (2, "b")]


def test_sync_delta_to_iceberg_incremental(spark, tmp_path):
    d = str(tmp_path / "dsync")
    i = str(tmp_path / "isync")
    mk = lambda rows: spark.createDataFrame(
        rows, "id long, v string"
    ).coalesce(1)
    delta.delta_append(spark, mk([(1, "a")]), d)
    convert.convert_delta_to_iceberg(spark, d, i)
    # nothing new: no-op
    assert convert.sync_delta_to_iceberg(spark, d, i) is None
    # two appends on the Delta side, one sync: ONLY the new files land
    delta.delta_append(spark, mk([(2, "b")]), d)
    delta.delta_append(spark, mk([(3, "c")]), d)
    snap = convert.sync_delta_to_iceberg(spark, d, i)
    assert snap == 2
    assert _rows(iceberg.read_iceberg(spark, i)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # the mirror keeps its own history: snapshot 1 is still the
    # original converted file set
    assert _rows(iceberg.read_iceberg(spark, i, snapshot_id=1)) == [(1, "a")]
    # a Delta-side remove breaks the append-only mirror contract loudly
    delta.delta_delete_where(spark, d, F.col("id") == 1)
    delta.delta_optimize(spark, d)  # purge the DV by rewrite
    with pytest.raises((ValueError, NotImplementedError)):
        convert.sync_delta_to_iceberg(spark, d, i)


def _mapped_delta_table(spark, path, rows=((1, "a"), (2, "b"))):
    """Hand-rolled column-mapped Delta table: metaData at v0 maps
    id->col-aaa / v->col-bbb (name mode), one physical-named file."""
    import glob as _glob
    import json
    import os
    import shutil as _shutil

    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema = {
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
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-00000000sync",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }
    }
    spark.createDataFrame(
        list(rows), "`col-aaa` long, `col-bbb` string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_stage")
    )
    src = _glob.glob(os.path.join(path, "_stage", "part-*.parquet"))[0]
    size = os.path.getsize(src)
    _shutil.move(src, os.path.join(path, "f0.parquet"))
    _shutil.rmtree(os.path.join(path, "_stage"))
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps(meta) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {}, "size": size,
            "modificationTime": 0, "dataChange": True,
        }}) + "\n")
    return path


def test_convert_column_mapped_via_name_mapping(spark, tmp_path):
    """r13 (VERDICT r12 task 4): a column-mapped Delta table converts
    WITHOUT rewriting data — the Iceberg metadata carries
    schema.name-mapping.default (spec "Column Projection") so the
    shared physical col-<n> parquet names resolve to logical, and a
    later logical-named iceberg_append mixes in the same scan."""
    import json
    import os

    from dataset_grouper_spark.sources import iceberg as ice

    dm = _mapped_delta_table(spark, str(tmp_path / "dm"))
    ip = str(tmp_path / "im")
    convert.convert_delta_to_iceberg(spark, dm, ip)
    meta = ice._load_metadata(ip)
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert {tuple(m["names"]) for m in nm} == {("col-aaa",), ("col-bbb",)}
    got = ice.read_iceberg(spark, ip)
    assert sorted(tuple(r) for r in got.collect()) == [(1, "a"), (2, "b")]
    # incremental sync keeps working: new CM delta file mirrors over
    delta.delta_append(
        spark,
        spark.createDataFrame([(5, "e")], "id long, v string"),
        dm,
    )
    assert convert.sync_delta_to_iceberg(spark, dm, ip) is not None
    assert sorted(
        tuple(r) for r in ice.read_iceberg(spark, ip).collect()
    ) == [(1, "a"), (2, "b"), (5, "e")]
    # mixed table: a logical-named append reads in the same scan
    # (after this the mirror is a superset — no further syncs)
    ice.iceberg_append(
        spark,
        spark.createDataFrame([(9, "z")], "id long, v string"),
        ip,
    )
    assert sorted(
        tuple(r) for r in ice.read_iceberg(spark, ip).collect()
    ) == [(1, "a"), (2, "b"), (5, "e"), (9, "z")]


def test_sync_gates_match_convert_gates(spark, tmp_path):
    """ADVICE r8 (narrowed r13): sync_delta_to_iceberg must enforce
    the SAME expressibility gates as convert_delta_to_iceberg — a
    partitioned Delta table cannot append into a flat Iceberg mirror,
    and a Delta table whose column mapping is NOT covered by the
    mirror's name mapping (mapping enabled AFTER an unmapped convert)
    would hand the reader unresolvable parquet names."""
    import json
    import os

    # partitioned Delta table: gate fires before any Iceberg IO
    dp = str(tmp_path / "dsync_part")
    delta.delta_append(
        spark,
        spark.createDataFrame([(1, "en"), (2, "de")], "id long, lang string"),
        dp,
        partition_by=["lang"],
    )
    with pytest.raises(NotImplementedError, match="partitioned"):
        convert.sync_delta_to_iceberg(spark, dp, str(tmp_path / "i_nope"))

    # mapping enabled AFTER the conversion: the mirror has no name
    # mapping for the new physical names — sync must raise
    du = str(tmp_path / "dsync_late")
    delta.delta_append(
        spark,
        spark.createDataFrame([(1, "a")], "id long, v string"),
        du,
    )
    iu = str(tmp_path / "i_late")
    convert.convert_delta_to_iceberg(spark, du, iu)
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "id", "type": "long", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-xxx",
                },
            },
            {
                "name": "v", "type": "string", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-yyy",
                },
            },
        ],
    }
    with open(
        os.path.join(du, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps({
            "metaData": {
                "id": "00000000-0000-0000-0000-00000000late",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }) + "\n")
    with pytest.raises(NotImplementedError, match="name-mapping"):
        convert.sync_delta_to_iceberg(spark, du, iu)


def test_sync_iceberg_to_delta_incremental(spark, tmp_path):
    i = str(tmp_path / "isync2")
    d = str(tmp_path / "dsync2")
    mk = lambda rows: spark.createDataFrame(
        rows, "id long, v string"
    ).coalesce(1)
    iceberg.iceberg_append(spark, mk([(1, "a")]), i)
    convert.convert_iceberg_to_delta(spark, i, d)
    assert convert.sync_iceberg_to_delta(spark, i, d) is None
    # two Iceberg appends, one sync: only the new files land, as ONE
    # new Delta version
    iceberg.iceberg_append(spark, mk([(2, "b")]), i)
    iceberg.iceberg_append(spark, mk([(3, "c")]), i)
    v = convert.sync_iceberg_to_delta(spark, i, d)
    assert v == 1
    assert _rows(delta.read_delta(spark, d)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    # the mirror keeps its own history
    assert _rows(delta.read_delta(spark, d, version=0)) == [(1, "a")]
    # stats rode over: numRecords per referenced file
    parts = delta.delta_partitions(spark, d).collect()
    assert sum(r["n_rows"] for r in parts) == 3
    # an Iceberg-side delete breaks the append-only mirror loudly
    iceberg.iceberg_delete_where(spark, i, F.col("id") == 2)
    with pytest.raises((ValueError, NotImplementedError)):
        convert.sync_iceberg_to_delta(spark, i, d)
    # not-a-mirror guard
    with pytest.raises(FileNotFoundError, match="not a Delta table"):
        convert.sync_iceberg_to_delta(spark, i, str(tmp_path / "nope"))


def test_sync_iceberg_to_delta_schema_drift_gate(spark, tmp_path):
    """r9 review: an Iceberg-side ADD COLUMN between syncs cannot land
    as a bare append — the mirror's pinned schema would silently drop
    the new column."""
    i = str(tmp_path / "isync3")
    d = str(tmp_path / "dsync3")
    mk = lambda rows, ddl: spark.createDataFrame(rows, ddl).coalesce(1)
    iceberg.iceberg_append(spark, mk([(1, "a")], "id long, v string"), i)
    convert.convert_iceberg_to_delta(spark, i, d)
    iceberg.iceberg_append(
        spark,
        mk([(2, "b", 7)], "id long, v string, extra long"),
        i,
        merge_schema=True,
    )
    with pytest.raises(NotImplementedError, match="schema changed"):
        convert.sync_iceberg_to_delta(spark, i, d)


def test_sync_hudi_to_delta_mirrors_upserts_and_inserts(spark, tmp_path):
    h = str(tmp_path / "htbl_sync")
    d = str(tmp_path / "dtbl_sync")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).coalesce(1)
    hudi.hudi_insert(spark, df, h, record_key="id")
    convert.convert_hudi_to_delta(spark, h, d)
    assert _rows(delta.read_delta(spark, d)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # upsert replaces the file group's base file AND inserts a new key
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame(
            [(2, "B"), (9, "z")], "id long, v string"
        ).coalesce(1),
        h,
    )
    v = convert.sync_hudi_to_delta(spark, h, d)
    assert v == 1
    assert _rows(delta.read_delta(spark, d)) == [
        (1, "a"), (2, "B"), (3, "c"), (9, "z")
    ]
    # time travel: version 0 still serves the pre-sync slice
    assert _rows(delta.read_delta(spark, d, version=0)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # idempotent when in sync
    assert convert.sync_hudi_to_delta(spark, h, d) is None


def test_sync_hudi_to_delta_gates(spark, tmp_path):
    h = str(tmp_path / "htbl_sync_g")
    df = spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1)
    hudi.hudi_insert(
        spark, df, h, record_key="id", table_type="MERGE_ON_READ"
    )
    d = str(tmp_path / "dtbl_sync_g")
    convert.convert_hudi_to_delta(spark, h, d)
    hudi.hudi_mor_upsert(
        spark,
        spark.createDataFrame([(1, "A")], "id long, v string").coalesce(1),
        h,
    )
    with pytest.raises(NotImplementedError, match="MoR log"):
        convert.sync_hudi_to_delta(spark, h, d)
    hudi.hudi_compact(spark, h)
    assert convert.sync_hudi_to_delta(spark, h, d) == 1
    assert _rows(delta.read_delta(spark, d)) == [(1, "A")]
    # not-a-mirror gate
    with pytest.raises(FileNotFoundError, match="not a Delta table"):
        convert.sync_hudi_to_delta(spark, h, str(tmp_path / "nope"))


def test_sync_hudi_to_iceberg_upserts_and_inserts(spark, tmp_path):
    h = str(tmp_path / "htbl_sync_i")
    i = str(tmp_path / "itbl_sync_i")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    ).coalesce(1)
    hudi.hudi_insert(spark, df, h, record_key="id")
    convert.convert_hudi_to_iceberg(spark, h, i)
    assert _rows(iceberg.read_iceberg(spark, i)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    pre = iceberg._load_metadata(i)["current-snapshot-id"]
    # upsert: replaces the file group AND inserts a new key
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame(
            [(2, "B"), (9, "z")], "id long, v string"
        ).coalesce(1),
        h,
    )
    sid = convert.sync_hudi_to_iceberg(spark, h, i)
    assert sid is not None
    assert _rows(iceberg.read_iceberg(spark, i)) == [
        (1, "a"), (2, "B"), (3, "c"), (9, "z")
    ]
    # the pre-sync snapshot still time-travels to the old slice
    assert _rows(iceberg.read_iceberg(spark, i, snapshot_id=pre)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # idempotent when in sync
    assert convert.sync_hudi_to_iceberg(spark, h, i) is None
    # pure insert (a brand-new key) takes the append shape
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame([(20, "t")], "id long, v string")
        .coalesce(1),
        h,
    )
    assert convert.sync_hudi_to_iceberg(spark, h, i) is not None
    assert (20, "t") in _rows(iceberg.read_iceberg(spark, i))


def test_sync_hudi_to_iceberg_gates(spark, tmp_path):
    h = str(tmp_path / "htbl_sync_ig")
    df = spark.createDataFrame([(1, "a")], "id long, v string").coalesce(1)
    hudi.hudi_insert(
        spark, df, h, record_key="id", table_type="MERGE_ON_READ"
    )
    i = str(tmp_path / "itbl_sync_ig")
    convert.convert_hudi_to_iceberg(spark, h, i)
    hudi.hudi_mor_upsert(
        spark,
        spark.createDataFrame([(1, "A")], "id long, v string").coalesce(1),
        h,
    )
    with pytest.raises(NotImplementedError, match="MoR log"):
        convert.sync_hudi_to_iceberg(spark, h, i)
    hudi.hudi_compact(spark, h)
    assert convert.sync_hudi_to_iceberg(spark, h, i) is not None
    assert _rows(iceberg.read_iceberg(spark, i)) == [(1, "A")]
    with pytest.raises(
        FileNotFoundError, match="no snapshot|not an Iceberg table"
    ):
        convert.sync_hudi_to_iceberg(spark, h, str(tmp_path / "nope2"))


def test_sync_hudi_to_iceberg_uri_manifests(spark, tmp_path):
    """ADVICE r10: the REPLACE path keyed carried-stats by RAW manifest
    file_path while have/want used localized absolutes — a mirror whose
    manifests store file:// URIs raised KeyError instead of syncing.
    Rewrite the mirror's manifest to the file:// dialect, then sync an
    upsert that carries one file group and replaces another."""
    from dataset_grouper_spark.sources.avro import (
        read_avro_file,
        write_avro_file,
    )

    h = str(tmp_path / "htbl_sync_uri")
    i = str(tmp_path / "itbl_sync_uri")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    hudi.hudi_insert(spark, a.coalesce(1), h, record_key="id")
    # second file group (second commit) that the upsert will NOT touch
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame([(7, "g")], "id long, v string").coalesce(1),
        h,
    )
    convert.convert_hudi_to_iceberg(spark, h, i)
    meta = iceberg._load_metadata(i)
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    ml = snap["manifest-list"]
    _s, manifests = read_avro_file(ml)
    # rewrite every data manifest's file_path to the file:// dialect
    for m in manifests:
        if m.get("content", 0) != 0:
            continue
        _s2, es = read_avro_file(m["manifest_path"])
        for e in es:
            fp = e["data_file"]["file_path"]
            if not fp.startswith("file://"):
                e["data_file"]["file_path"] = "file://" + fp
        write_avro_file(
            m["manifest_path"], iceberg._MANIFEST_SCHEMA, es
        )
    # sanity: the URI-dialect mirror still reads
    assert _rows(iceberg.read_iceberg(spark, i)) == [
        (1, "a"), (2, "b"), (7, "g")
    ]
    # upsert replaces group {1,2}; group {7} is CARRIED (stats lookup)
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame([(2, "B")], "id long, v string").coalesce(1),
        h,
    )
    sid = convert.sync_hudi_to_iceberg(spark, h, i)
    assert sid is not None
    assert _rows(iceberg.read_iceberg(spark, i)) == [
        (1, "a"), (2, "B"), (7, "g")
    ]
