"""Foreign-engine golden fixtures (VERDICT r9 task 2).

Every green lakehouse row before r10 round-tripped THIS engine's own
writers. The committed fixtures under ``tests/fixtures/foreign/`` are
hand-assembled to the published specs in the exact layout and metadata
shape the REAL engines emit (Spark-Delta 3.x, Spark-Iceberg/pyiceberg
v2, Hudi 0.14 CoW+MoR) — see ``tools/make_foreign_fixtures.py`` for
the field-by-field inventory of what each fixture carries that this
repo's own writers never produce (commitInfo riders, stats JSON
strings, data files missing the partition column, full manifest stats
blocks, file_sequence_number, UUID file ids, write tokens, foreign
.clean instants, archived/ residents, HoodieLogFormat logs, ...).

Rows are PINNED literally: these tests prove the readers' claimed
spec compliance against byte-committed foreign layouts, not against a
write-then-read of our own dialect. The runtime half builds the
absolute-``file://``-URI + v2-position-delete Iceberg variant (those
must embed the table's runtime location, so they cannot be committed)
into tmp and pins it too.
"""

import json
import os

import pytest

from dataset_grouper_spark.sources import open_table, table_format

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "foreign")

DELTA = os.path.join(FIX, "delta")
ICE = os.path.join(FIX, "iceberg")
COW = os.path.join(FIX, "hudi_cow")
MOR = os.path.join(FIX, "hudi_mor")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fixture_sniffing():
    assert table_format(DELTA) == "delta"
    assert table_format(ICE) == "iceberg"
    assert table_format(COW) == "hudi"
    assert table_format(MOR) == "hudi"


DELTA_LATEST = [
    (1, "alpha", "en"),
    (2, "bravo", "en"),
    # id=3 masked by the commit-3 deletion vector
    (6, "foxtrot", "de"),
    (7, "golf", "de"),
    (10, "kilo", "en"),
    (11, "lima", "en"),
]


def test_delta_foreign_latest(spark):
    # commit 1 overwrote the de partition (remove+add); replay runs
    # from the foreign MAP-typed checkpoint at v1 plus the JSON tail;
    # partition column restored from partitionValues (absent from the
    # data files); commit 3's 'u'-storage deletion vector (Z85 uuid
    # sidecar, roaring bitmap) masks id=3 without rewriting the file
    df = open_table(spark, DELTA)
    assert sorted(df.columns) == ["id", "lang", "txt"]
    assert _rows(df) == DELTA_LATEST


def test_delta_foreign_deletion_vector_travel(spark):
    # pre-DV version still serves the masked row from the SAME file
    df2 = open_table(spark, DELTA, version=2)
    assert (3, "charlie", "en") in _rows(df2)
    assert len(_rows(df2)) == len(DELTA_LATEST) + 1


def test_delta_foreign_time_travel(spark):
    df = open_table(spark, DELTA, version=0)
    assert _rows(df) == [
        (1, "alpha", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
    ]


def test_delta_foreign_stats_skipping(spark):
    # add.stats written as Spark-Delta's embedded JSON string drive
    # file skipping; results stay exact (pair with the row filter)
    from dataset_grouper_spark.sources.delta import read_delta

    df = read_delta(spark, DELTA, skip_filters=[("id", ">=", 6)])
    assert _rows(df.filter("id >= 6")) == [
        (6, "foxtrot", "de"),
        (7, "golf", "de"),
        (10, "kilo", "en"),
        (11, "lima", "en"),
    ]
    # the en0 file (ids 1-3) is disproved by its stats envelope
    from dataset_grouper_spark.sources.delta import delta_skip_plan

    kept, total = delta_skip_plan(spark, DELTA, [("id", ">=", 6)])
    assert total == 3 and len(kept) == 2


def test_delta_foreign_checkpoint_replay(spark, tmp_path):
    """Replay must run from the foreign MAP-typed checkpoint: a copy
    whose pre-checkpoint JSON commits are gone (the truncated-log
    state real tables reach after retention) still serves the latest
    snapshot; travel to the truncated versions raises."""
    import shutil

    t = str(tmp_path / "delta_truncated")
    shutil.copytree(DELTA, t)
    for v in (0, 1):
        os.remove(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert _rows(open_table(spark, t)) == DELTA_LATEST
    with pytest.raises(ValueError, match="missing commits"):
        open_table(spark, t, version=0).collect()


def test_delta_foreign_checkpoint_sessionless_replay():
    """The delta_lite planning path replays WITHOUT a SparkSession
    (pyarrow): parquet MAP columns (partitionValues et al) must
    normalize to dicts, not pyarrow's tuple lists."""
    from dataset_grouper_spark.sources.delta import _replay

    adds, meta = _replay(None, DELTA, 2)
    assert len(adds) == 3
    pvs = {a["partitionValues"]["lang"] for a in adds.values()}
    assert pvs == {"en", "de"}
    assert meta["partitionColumns"] == ["lang"]


def test_iceberg_foreign_latest(spark):
    df = open_table(spark, ICE)
    assert _rows(df) == [
        (1, "alpha", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
        (8, "hotel", "en"),
        (9, "india", "en"),
    ]


def test_iceberg_foreign_snapshot_travel(spark):
    df = open_table(spark, ICE, snapshot_id=4910972762596521298)
    assert _rows(df) == [
        (1, "alpha", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
    ]


def test_iceberg_foreign_partition_and_bound_pruning(spark):
    # identity-partition pruning from the foreign manifests' partition
    # structs (file-level == row-level for identity transforms)
    df = open_table(spark, ICE, partition_filter={"lang": "de"})
    assert _rows(df) == [(4, "delta", "de"), (5, "echo", "de")]
    # Appendix-D lower/upper bounds in the foreign stats block drive
    # file skipping: only the id>=8 file survives planning
    df2 = open_table(spark, ICE, skip_filters=[("id", ">=", 8)])
    assert _rows(df2.filter("id >= 8")) == [
        (8, "hotel", "en"),
        (9, "india", "en"),
    ]
    assert df2.count() == 2  # the other files' envelopes disprove


def test_iceberg_manifest_level_pruning_skips_unopened_manifests(
    spark, tmp_path
):
    """Planning-scale pruning: a manifest whose manifest-LIST field
    summaries exclude the filter must never be OPENED (at 100 TB the
    difference between touching thousands of manifest Avros and a
    handful). Proven with a poison manifest-list row pointing at a
    manifest file that does not exist, with bounds [fr, fr]: a
    lang='de' read must succeed (row pruned by its envelope), and the
    same read without summaries would have to open it and die."""
    import shutil

    from dataset_grouper_spark.sources.avro import (
        read_avro_file,
        write_avro_file,
    )

    t = str(tmp_path / "ice_poison")
    shutil.copytree(ICE, t)
    meta = json.load(open(os.path.join(t, "metadata", "v2.metadata.json")))
    snap = max(meta["snapshots"], key=lambda s: s["timestamp-ms"])
    ml_rel = snap["manifest-list"]
    ml = os.path.join(t, ml_rel)
    schema, rows = read_avro_file(ml)
    poison = dict(rows[0])
    poison["manifest_path"] = "metadata/does-not-exist-m9.avro"
    poison["partitions"] = [
        {
            "contains_null": False,
            "contains_nan": False,
            "lower_bound": b"fr",
            "upper_bound": b"fr",
        }
    ]
    write_avro_file(ml, schema, rows + [poison])
    df = open_table(spark, t, partition_filter={"lang": "de"})
    assert _rows(df) == [(4, "delta", "de"), (5, "echo", "de")]
    # a filter the poison row's envelope ADMITS must open it and fail
    # loudly (conservative: pruning never hides a broken table)
    with pytest.raises(Exception, match="does-not-exist|No such file"):
        open_table(spark, t, partition_filter={"lang": "fr"}).collect()
    # a manifest written under a DIFFERENT partition spec lays its
    # summaries out in THAT spec's order/types — its envelope must
    # never prune under the default spec's interpretation, so the
    # excluding-bounds poison row with a foreign spec id is OPENED
    # (and fails loudly on the missing file) instead of being skipped
    foreign_spec = dict(poison)
    foreign_spec["partition_spec_id"] = 7
    write_avro_file(ml, schema, rows + [foreign_spec])
    with pytest.raises(Exception, match="does-not-exist|No such file"):
        open_table(spark, t, partition_filter={"lang": "de"}).collect()


def test_iceberg_foreign_absolute_uris_and_position_deletes(
    spark, tmp_path
):
    """Runtime half: real engines store absolute file:// URIs and v2
    position-delete parquet embedding the table location — build that
    shape in tmp and pin it (id=2 deleted at snapshot 3)."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from make_foreign_fixtures import build_iceberg

    t = str(tmp_path / "ice_abs")
    os.makedirs(t)
    build_iceberg(t, absolute=True, with_deletes=True)
    df = open_table(spark, t)
    assert _rows(df) == [
        (1, "alpha", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
        (8, "hotel", "en"),
        (9, "india", "en"),
    ]
    # pre-delete snapshot still shows id=2
    df1 = open_table(spark, t, snapshot_id=6395864198392318822)
    assert (2, "bravo", "en") in _rows(df1)


def test_iceberg_timestamp_as_of(spark):
    """TIMESTAMP AS OF resolution via the foreign metadata's
    snapshot-log: between the two commits -> snapshot 1; after ->
    snapshot 2; before history -> raises."""
    from dataset_grouper_spark.sources.iceberg import (
        resolve_iceberg_snapshot,
    )

    t1, t2 = 1710500000000, 1710500060000
    assert resolve_iceberg_snapshot(ICE, t1 + 1) == 4910972762596521298
    assert resolve_iceberg_snapshot(ICE, t2 + 99) == 6395864198392318822
    df = open_table(spark, ICE, timestamp_ms=t1 + 30000)
    assert len(_rows(df)) == 5
    with pytest.raises(ValueError, match="predates"):
        resolve_iceberg_snapshot(ICE, t1 - 1)
    with pytest.raises(ValueError, match="exclusive"):
        open_table(
            spark, ICE, timestamp_ms=t1, snapshot_id=4910972762596521298
        )


def test_iceberg_timestamp_as_of_expired_raises(tmp_path):
    """The snapshot current at the instant was expired: resolving must
    raise, never silently serve an older retained snapshot."""
    import shutil

    from dataset_grouper_spark.sources.iceberg import (
        resolve_iceberg_snapshot,
    )

    t = str(tmp_path / "ice_exp")
    shutil.copytree(ICE, t)
    mp = os.path.join(t, "metadata", "v2.metadata.json")
    meta = json.load(open(mp))
    # expire snapshot 1 from the retained list; snapshot-log keeps it
    meta["snapshots"] = [
        s for s in meta["snapshots"]
        if s["snapshot-id"] != 4910972762596521298
    ]
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="expired"):
        resolve_iceberg_snapshot(t, 1710500000001)
    # instants at/after the retained snapshot still resolve
    assert (
        resolve_iceberg_snapshot(t, 1710500060000)
        == 6395864198392318822
    )


def test_iceberg_v1_format_minimal_metadata(spark, tmp_path):
    """format-version 1 tables (older pyiceberg/Spark writers): the
    singular 'schema' key, no sequence numbers anywhere, manifest
    entries without 'content'/'file_sequence_number', minimal
    manifest-list fields. The reader must serve them (sequence 0
    semantics per spec)."""
    from dataset_grouper_spark.sources.avro import write_avro_file

    t = str(tmp_path / "ice_v1")
    os.makedirs(os.path.join(t, "metadata"))
    os.makedirs(os.path.join(t, "data"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": [1, 2], "txt": ["a", "b"]}),
        os.path.join(t, "data", "f1.parquet"),
    )
    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    write_avro_file(
        os.path.join(t, "metadata", "m0.avro"),
        entry_schema,
        [
            {
                "status": 1,
                "snapshot_id": 99,
                "data_file": {
                    "file_path": "data/f1.parquet",
                    "file_format": "PARQUET",
                    "record_count": 2,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(t, "data", "f1.parquet")
                    ),
                },
            }
        ],
    )
    ml_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "added_snapshot_id", "type": ["null", "long"],
             "default": None},
        ],
    }
    write_avro_file(
        os.path.join(t, "metadata", "snap-99-1-x.avro"),
        ml_schema,
        [
            {
                "manifest_path": "metadata/m0.avro",
                "manifest_length": os.path.getsize(
                    os.path.join(t, "metadata", "m0.avro")
                ),
                "partition_spec_id": 0,
                "added_snapshot_id": 99,
            }
        ],
    )
    meta = {
        "format-version": 1,
        "table-uuid": "00000000-1111-2222-3333-444444444444",
        "location": t,
        "last-updated-ms": 1710500000000,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "fields": [
                {"id": 1, "name": "id", "required": False,
                 "type": "long"},
                {"id": 2, "name": "txt", "required": False,
                 "type": "string"},
            ],
        },
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": 99,
        "snapshots": [
            {
                "snapshot-id": 99,
                "timestamp-ms": 1710500000000,
                "manifest-list": "metadata/snap-99-1-x.avro",
            }
        ],
    }
    with open(
        os.path.join(t, "metadata", "v1.metadata.json"), "w"
    ) as f:
        json.dump(meta, f)
    df = open_table(spark, t)
    assert _rows(df) == [(1, "a"), (2, "b")]


def test_iceberg_foreign_schema_evolution_backfill(spark, tmp_path):
    """Foreign metadata with a NEWER schema (current-schema-id=1
    adding a column no data file carries): the reader must project the
    current schema and NULL-backfill old files — the additive
    evolution shape every long-lived foreign table reaches."""
    import shutil

    t = str(tmp_path / "ice_evo")
    shutil.copytree(ICE, t)
    mdir = os.path.join(t, "metadata")
    meta = json.load(open(os.path.join(mdir, "v2.metadata.json")))
    old = meta["schemas"][0]
    meta["schemas"].append(
        {
            "type": "struct",
            "schema-id": 1,
            "fields": old["fields"]
            + [
                {"id": 4, "name": "score", "required": False,
                 "type": "long"}
            ],
        }
    )
    meta["current-schema-id"] = 1
    meta["last-column-id"] = 4
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("3")
    df = open_table(spark, t)
    assert df.columns == ["id", "txt", "lang", "score"]
    rows = df.collect()
    assert len(rows) == 7
    assert all(r["score"] is None for r in rows)


def test_hudi_cow_foreign_latest_and_travel(spark):
    from dataset_grouper_spark.sources.hudi import hudi_timeline

    df = open_table(spark, COW)
    assert _rows(df) == [
        (1, "ALPHA!", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
    ]
    # time travel to the first 17-digit instant: pre-upsert slice
    df1 = open_table(spark, COW, as_of="20240315103000123")
    assert _rows(df1) == [
        (1, "alpha", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
    ]
    # the foreign .clean instant (Avro payload) is listed on the
    # timeline and never parsed by the read path
    tl = hudi_timeline(COW)
    assert ("20240315110000789", "clean", "completed") in tl


def test_hudi_cow_foreign_meta_columns(spark):
    df = open_table(spark, COW, keep_meta=True)
    metas = {
        r["_hoodie_record_key"]: r["_hoodie_commit_time"]
        for r in df.collect()
    }
    assert metas["1"] == "20240315104501456"  # rewritten slice
    assert metas["4"] == "20240315103000123"


def test_hudi_1x_completed_instant_naming(spark, tmp_path):
    """Hudi 1.x (table version 8) names completed markers
    <requestedTime>_<completionTime>.<action>; the reader must key
    instants on the REQUESTED time (base-file names carry it) and
    still find the metadata payload."""
    import shutil

    from dataset_grouper_spark.sources import hudi

    t = str(tmp_path / "cow_v8")
    shutil.copytree(COW, t)
    hp = os.path.join(t, ".hoodie")
    for ts, done in [
        ("20240315103000123", "20240315103001000"),
        ("20240315104501456", "20240315104502000"),
    ]:
        os.rename(
            os.path.join(hp, f"{ts}.commit"),
            os.path.join(hp, f"{ts}_{done}.commit"),
        )
    df = open_table(spark, t)
    assert _rows(df) == [
        (1, "ALPHA!", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
    ]
    # time travel keys on the requested time
    assert (1, "alpha", "en") in _rows(
        open_table(spark, t, as_of="20240315103000123")
    )
    tl = hudi.hudi_timeline(t)
    assert ("20240315103000123", "commit", "completed") in tl
    # an Avro-serialized completed payload (1.x for some actions)
    # raises the honest gate instead of a JSON traceback
    with open(
        os.path.join(hp, "20240315104501456_20240315104502000.commit"),
        "wb",
    ) as f:
        f.write(b"Obj\x01binary-avro-here")
    with pytest.raises(NotImplementedError, match="not JSON"):
        open_table(spark, t)


def test_hudi_mor_foreign_log_merge(spark):
    # base (1,2,3) + HoodieLogFormat log: upsert 2, insert 9, delete 3
    df = open_table(spark, MOR)
    assert _rows(df) == [
        (1, "alpha", "en"),
        (2, "BRAVO!", "en"),
        (9, "juliett", "en"),
    ]
    # pre-log instant: the base slice alone
    df1 = open_table(spark, MOR, as_of="20240315103000123")
    assert _rows(df1) == [
        (1, "alpha", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
    ]


def test_hudi_mor_foreign_compaction_folds_the_log(spark, tmp_path):
    """Compacting the COPY of a foreign MoR table folds the foreign
    log through the same stream semantics and re-reads identically."""
    import shutil

    from dataset_grouper_spark.sources import hudi

    t = str(tmp_path / "mor_copy")
    shutil.copytree(MOR, t)
    before = _rows(open_table(spark, t))
    assert hudi.hudi_compact(spark, t) is not None
    assert _rows(open_table(spark, t)) == before


def test_hudi_lite_batch_reads_foreign_cow(spark):
    """The registered hudi_lite format's batch reader serves the same
    snapshot read_hudi does — on the committed FOREIGN fixture (UUID
    file ids, write tokens, 17-digit instants)."""
    from dataset_grouper_spark.streaming.hudi_source import (
        HudiLiteDataSource,
    )

    spark.dataSource.register(HudiLiteDataSource)
    df = (
        spark.read.format("hudi_lite").option("path", COW).load()
    )
    assert _rows(df.select("id", "txt", "lang")) == [
        (1, "ALPHA!", "en"),
        (2, "bravo", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
    ]


def test_delta_lite_batch_gates_on_foreign_dv_table(spark):
    """The delta_lite batch reader's DV gate must fire on the FOREIGN
    fixture too (its latest version carries a deletion vector) —
    pointing users at read_delta, which applies DVs."""
    from dataset_grouper_spark.streaming.delta_source import (
        DeltaLiteDataSource,
    )

    spark.dataSource.register(DeltaLiteDataSource)
    with pytest.raises(Exception, match="deletion vector"):
        (
            spark.read.format("delta_lite")
            .option("path", DELTA)
            .load()
            .collect()
        )


def test_iceberg_lite_batch_reads_foreign_table(spark):
    """The registered iceberg_lite format's batch reader serves the
    committed foreign v2 fixture (full stats block manifests)."""
    from dataset_grouper_spark.streaming.iceberg_source import (
        IcebergLiteDataSource,
    )

    spark.dataSource.register(IcebergLiteDataSource)
    df = spark.read.format("iceberg_lite").option("path", ICE).load()
    assert len(_rows(df)) == 7
    assert (4, "delta", "de") in _rows(df)


def test_fixtures_stay_kb_scale():
    total = sum(
        os.path.getsize(os.path.join(d, f))
        for sub in os.listdir(FIX)
        for d, _s, fs in os.walk(os.path.join(FIX, sub))
        for f in fs
    )
    assert total < 200_000, f"foreign fixtures grew to {total} bytes"


def test_iceberg_runtime_foreign_v3_deletion_vector(spark, tmp_path):
    """Runtime half, v3: a foreign-flavored Puffin DV (Trino-style
    footer riders, full-stats DV manifest entry, format-version 3
    upgrade over live v2 position deletes). id=2 falls to the v2
    delete, id=8 to the DV; the pre-DV snapshot still serves id=8."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from make_foreign_fixtures import build_iceberg

    t = str(tmp_path / "ice_dv")
    os.makedirs(t)
    build_iceberg(t, absolute=True, with_deletes=True, with_dv=True)
    df = open_table(spark, t)
    assert _rows(df) == [
        (1, "alpha", "en"),
        (3, "charlie", "en"),
        (4, "delta", "de"),
        (5, "echo", "de"),
        (9, "india", "en"),
    ]
    # pre-DV snapshot: only the v2 position delete applies
    df3 = open_table(spark, t, snapshot_id=8123451122334455667)
    assert (8, "hotel", "en") in _rows(df3)
    # the sidecar really is a Puffin file with foreign rider props
    from dataset_grouper_spark.sources import puffin

    import glob as _glob

    (pf,) = _glob.glob(os.path.join(t, "data", "lang=en", "*.puffin"))
    meta = puffin.read_puffin_footer(pf)
    assert meta["properties"]["created-by"].startswith("Trino")
    assert meta["blobs"][0]["type"] == "deletion-vector-v1"


# ---------------- r11 nasty combinations (VERDICT r10 task 4) -------

DELTA_CM = os.path.join(FIX, "delta_cm")
MOR_ROLLOVER = os.path.join(FIX, "hudi_mor_rollover")


def test_delta_cm_dv_checkpoint_combination(spark):
    """Column mapping (name mode) + 'u'-storage DV + parquet
    checkpoint in ONE committed table — the DV descriptor lives
    INSIDE the checkpoint's add struct, the data files and
    partitionValues keys carry physical col-<uuid> names, and the JSON
    tail continues past the checkpoint."""
    assert table_format(DELTA_CM) == "delta"
    df = open_table(spark, DELTA_CM)
    # logical names restored from the column-mapping metadata
    assert df.columns == ["id", "txt", "lang"]
    assert _rows(df) == [
        (1, "alpha", "en"),
        (3, "charlie", "en"),  # id=2 fell to the checkpointed DV
        (4, "delta", "de"),
        (5, "echo", "de"),
        (8, "hotel", "en"),
        (9, "india", "en"),
    ]
    # time travel to v0 (before the DV): id=2 alive again
    v0 = open_table(spark, DELTA_CM, version=0)
    assert (2, "bravo", "en") in _rows(v0)
    # the checkpoint really is the replay source for v1+: its add
    # struct carries the DV descriptor
    import pyarrow.parquet as pq

    cp = pq.read_table(
        os.path.join(
            DELTA_CM, "_delta_log", f"{1:020d}.checkpoint.parquet"
        )
    ).to_pylist()
    dv_adds = [
        r["add"]
        for r in cp
        if r.get("add") and r["add"].get("deletionVector")
        and r["add"]["deletionVector"].get("storageType")
    ]
    assert len(dv_adds) == 1
    assert dv_adds[0]["deletionVector"]["storageType"] == "u"


def test_hudi_mor_rollover_rollback(spark):
    """The cross-file rollback case hudi.py:827/:894 claims: a failed
    T3 upsert's AVRO_DATA block sits in .log.1, the rollback
    COMMAND_BLOCK in the .log.2 ROLLOVER — the scanner must apply it
    across files or T3's records resurrect."""
    import glob as _glob

    from dataset_grouper_spark.sources import hudi_log

    assert table_format(MOR_ROLLOVER) == "hudi"
    logs = sorted(
        _glob.glob(os.path.join(MOR_ROLLOVER, "lang=en", ".*.log.*")),
        key=lambda p: int(p.rsplit(".log.", 1)[1].split("_")[0]),
    )
    assert len(logs) == 2 and ".log.2" in logs[1]
    # unit pin, NO completed-instant filter: the command block ALONE
    # must kill T3 — and reading only .log.1 (no command block) must
    # still see it, proving the kill is cross-file, not coincidental
    stream = hudi_log.read_log_stream_records(logs, completed=None)
    assert not any("SHOULD_NOT_SURVIVE" in str(r[3]) for r in stream)
    only1 = hudi_log.read_log_stream_records([logs[0]], completed=None)
    assert any("SHOULD_NOT_SURVIVE" in str(r[3]) for r in only1)
    # runtime: the merged view equals the plain hudi_mor fixture's
    assert _rows(open_table(spark, MOR_ROLLOVER)) == [
        (1, "alpha", "en"),
        (2, "BRAVO!", "en"),
        (9, "juliett", "en"),
    ]


def test_iceberg_runtime_foreign_v3_dv_plus_row_lineage(
    spark, tmp_path
):
    """Runtime half, v3 DV + ROW LINEAGE together: every data entry
    carries first_row_id (spec field-id 142), metadata records
    next-row-id, and the deletes (v2 position delete on en0, DV on
    en1) must never renumber survivors."""
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from make_foreign_fixtures import build_iceberg

    from dataset_grouper_spark.sources.iceberg import read_iceberg

    t = str(tmp_path / "ice_dv_rl")
    os.makedirs(t)
    build_iceberg(
        t, absolute=True, with_deletes=True, with_dv=True,
        with_lineage=True,
    )
    df = read_iceberg(spark, t, row_ids=True)
    got = sorted(
        (r.id, r.txt, r.lang, r._row_id) for r in df.collect()
    )
    assert got == [
        (1, "alpha", "en", 0),
        (3, "charlie", "en", 2),   # _row_id 1 (id=2) fell to v2 delete
        (4, "delta", "de", 3),
        (5, "echo", "de", 4),
        (9, "india", "en", 6),     # _row_id 5 (id=8) fell to the DV
    ]
    meta = json.load(
        open(os.path.join(t, "metadata", "v2.metadata.json"))
    )
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 7


MOR_ORDERING = os.path.join(FIX, "hudi_mor_ordering")


def test_hudi_mor_ordering_event_time_merge(spark):
    """hoodie.table.precombine.field (VERDICT r11 task 4): event-time
    ordering decides the merge — the T3 commit carries an OLDER
    evt_ts for id 1 (must lose to T2's), a delete with orderingVal
    below id 2's evt_ts (must not delete), and one above id 3's
    (deletes). A commit-time merge yields the wrong winner on all
    three. r13 (ADVICE): id 4's delete carries orderingVal 0 —
    DeleteRecord's NATURAL-ORDER default — so it applies by commit
    order and kills the evt_ts-500 base row; the data block written
    AFTER the sentinel re-inserts id 4 at evt_ts 10, which survives
    (event-time competition restarts past a natural-order delete)."""
    assert table_format(MOR_ORDERING) == "hudi"
    df = open_table(spark, MOR_ORDERING)
    rows = sorted(
        (r.id, r.evt_ts, r.txt) for r in df.collect()
    )
    assert rows == [
        (1, 300, "NEWEST"), (2, 250, "bravo"), (4, 10, "reborn")
    ]


def test_hudi_mor_ordering_compaction_agrees(spark, tmp_path):
    """Compaction resolves the SAME event-time winners as the
    snapshot read (both ride _mor_order), so the folded base slice
    reads identically."""
    import shutil as _sh

    from dataset_grouper_spark.sources.hudi import hudi_compact, read_hudi

    t = str(tmp_path / "mor_ord")
    _sh.copytree(MOR_ORDERING, t)
    before = sorted(
        (r.id, r.evt_ts, r.txt) for r in read_hudi(spark, t).collect()
    )
    assert hudi_compact(spark, t) is not None
    after = sorted(
        (r.id, r.evt_ts, r.txt) for r in read_hudi(spark, t).collect()
    )
    assert after == before == [
        (1, 300, "NEWEST"), (2, 250, "bravo"), (4, 10, "reborn")
    ]
