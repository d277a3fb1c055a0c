"""HoodieLogFormat block framing (sources/hudi_log.py, VERDICT r8 #3).

The framing test hand-crafts bytes per the public spec independently
of the module's own encoder, so the reader is pinned to the FORMAT,
not to a round-trip with itself.
"""

import json
import os
import struct

import pytest

from dataset_grouper_spark.sources import hudi, hudi_log

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "string"]},
    ],
}


def _hand_framed_avro_block(instant=b"101", records=()):
    """Spec bytes assembled by hand: magic, BE sizes, ordinals, header
    map, content, empty footer, reverse pointer."""
    from dataset_grouper_spark.sources.avro import _write_value

    body = bytearray(struct.pack(">ii", 3, len(records)))
    for rec in records:
        datum = bytearray()
        _write_value(datum, SCHEMA, rec)
        body += struct.pack(">i", len(datum)) + datum
    schema_raw = json.dumps(SCHEMA, separators=(",", ":")).encode()
    header = bytearray(struct.pack(">i", 2))
    header += struct.pack(">ii", 0, len(instant)) + instant  # INSTANT_TIME
    header += struct.pack(">ii", 2, len(schema_raw)) + schema_raw  # SCHEMA
    footer = struct.pack(">i", 0)
    block_size = 4 + 4 + len(header) + 8 + len(body) + len(footer) + 8
    out = bytearray(b"#HUDI#")
    out += struct.pack(">q", block_size)
    out += struct.pack(">ii", 1, 3)  # format v1, AVRO_DATA_BLOCK ordinal
    out += header
    out += struct.pack(">q", len(body)) + body
    out += footer
    out += struct.pack(">q", len(out) + 8)
    return bytes(out)


def test_reader_decodes_hand_framed_spec_bytes():
    raw = _hand_framed_avro_block(
        records=[{"id": 1, "v": "a"}, {"id": 2, "v": None}]
    )
    blocks = hudi_log.read_log_blocks(raw)
    assert [b["type"] for b in blocks] == ["AVRO_DATA_BLOCK"]
    b = blocks[0]
    assert b["format_version"] == 1
    assert b["header"]["INSTANT_TIME"] == "101"
    assert json.loads(b["header"]["SCHEMA"]) == SCHEMA
    assert hudi_log.decode_avro_data_block(b) == [
        {"id": 1, "v": "a"},
        {"id": 2, "v": None},
    ]


def test_encoder_bytes_match_hand_framing():
    recs = [{"id": 7, "v": "x"}]
    ours = hudi_log.encode_avro_data_block(recs, SCHEMA, "101")
    # identical framing when the header map is written in the same
    # (INSTANT_TIME, SCHEMA) order the hand builder uses
    assert ours == _hand_framed_avro_block(records=recs)


def test_corrupt_regions_are_skipped():
    good = _hand_framed_avro_block(records=[{"id": 1, "v": "a"}])
    junk = b"\x00\x01garbage-without-magic\x7f"
    truncated = good[: len(good) - 9]  # breaks the reverse pointer
    blocks = hudi_log.read_log_blocks(junk + good + truncated)
    types = [b["type"] for b in blocks]
    assert types.count("AVRO_DATA_BLOCK") == 1
    assert "CORRUPT_BLOCK" in types
    # records still come through the scanner
    recs = hudi_log.read_log_records(junk + good + truncated)
    assert [(op, rec["id"]) for op, _i, _s, rec in recs] == [("u", 1)]


def test_rollback_command_block_drops_target_instant():
    b1 = hudi_log.encode_avro_data_block([{"id": 1, "v": "a"}], SCHEMA, "101")
    b2 = hudi_log.encode_avro_data_block([{"id": 2, "v": "b"}], SCHEMA, "102")
    rb = hudi_log.encode_rollback_block("103", target_instant="102")
    recs = hudi_log.read_log_records(b1 + b2 + rb)
    assert [(i, r["id"]) for _op, i, _s, r in recs] == [("101", 1)]


def test_rollback_block_applies_across_stream_files():
    """r9 review: Hudi's scanner reads a file group's whole log stream,
    so a rollback COMMAND_BLOCK that landed in a rollover file (.log.2)
    must invalidate target blocks written to .log.1."""
    f1 = hudi_log.encode_avro_data_block(
        [{"id": 1, "v": "BAD"}, {"id": 2, "v": "GHOST"}], SCHEMA, "101"
    )
    f2 = hudi_log.encode_rollback_block(
        "102", target_instant="101"
    ) + hudi_log.encode_avro_data_block(
        [{"id": 1, "v": "GOOD"}], SCHEMA, "101"
    )
    recs = hudi_log.read_log_stream_records([f1, f2], completed={"101"})
    assert [(r["id"], r["v"]) for _op, _i, _s, r in recs] == [(1, "GOOD")]
    # single-file scan of f1 alone (the wrapper) still sees its blocks
    solo = hudi_log.read_log_records(f1, completed={"101"})
    assert [r["id"] for _op, _i, _s, r in solo] == [1, 2]


def test_uncommitted_blocks_invisible():
    b1 = hudi_log.encode_avro_data_block([{"id": 1, "v": "a"}], SCHEMA, "101")
    b2 = hudi_log.encode_avro_data_block([{"id": 2, "v": "b"}], SCHEMA, "999")
    recs = hudi_log.read_log_records(b1 + b2, completed={"101"})
    assert [r["id"] for _op, _i, _s, r in recs] == [1]


def test_delete_block_v3_roundtrip_and_v2_gate():
    dels = [{"recordKey": "2", "partitionPath": "", "orderingVal": None}]
    blk = hudi_log.encode_delete_block(dels, "105")
    recs = hudi_log.read_log_records(blk)
    assert recs == [
        ("d", "105", 0,
         {"recordKey": "2", "partitionPath": "", "orderingVal": None}),
    ]
    # a v2 (Kryo) payload raises with the version named
    v2 = hudi_log._frame_block(
        "DELETE_BLOCK",
        {"INSTANT_TIME": "105"},
        struct.pack(">ii", 2, 0),
    )
    with pytest.raises(NotImplementedError, match="v2"):
        hudi_log.read_log_records(v2)


def test_unsupported_data_block_type_raises():
    blk = hudi_log._frame_block(
        "HFILE_DATA_BLOCK", {"INSTANT_TIME": "101"}, b"\x00"
    )
    assert hudi_log.read_log_blocks(blk)[0]["type"] == "HFILE_DATA_BLOCK"
    with pytest.raises(NotImplementedError, match="HFILE"):
        hudi_log.read_log_records(blk)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string").coalesce(1)


def _complete_deltacommit(table, instant):
    hp = os.path.join(table, ".hoodie")
    for suffix in ("deltacommit.requested", "deltacommit.inflight"):
        with open(os.path.join(hp, f"{instant}.{suffix}"), "w") as f:
            f.write("{}")
    with open(os.path.join(hp, f"{instant}.deltacommit"), "w") as f:
        json.dump(
            {"partitionToWriteStats": {}, "operationType": "UPSERT"}, f
        )


FOREIGN_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "_hoodie_record_key", "type": ["null", "string"]},
        {"name": "_hoodie_partition_path", "type": ["null", "string"]},
        {"name": "id", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "string"]},
    ],
}


def _foreign_rec(key, id_, v):
    return {
        "_hoodie_record_key": key,
        "_hoodie_partition_path": "",
        "id": id_,
        "v": v,
    }


def test_foreign_mor_log_merges_through_read_and_compaction(spark, tmp_path):
    """End-to-end: a log written in REAL HoodieLogFormat framing (the
    r8 gate) merges through read_hudi and folds through hudi_compact —
    upserts, a same-instant block sequence, a new-key insert, and a v3
    delete block."""
    t = str(tmp_path / "mor_foreign")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    part, fid, base, _path = hudi.hudi_file_slices(t)[0]
    di = hudi._next_instant(t)
    blocks = [
        # upsert key 1, then a LATER block of the same instant wins
        hudi_log.encode_avro_data_block(
            [_foreign_rec("1", 1, "A!")], FOREIGN_SCHEMA, di
        ),
        hudi_log.encode_avro_data_block(
            [_foreign_rec("1", 1, "A2"), _foreign_rec("3", 3, "new")],
            FOREIGN_SCHEMA,
            di,
        ),
        # real v3 delete block for key 2
        hudi_log.encode_delete_block(
            [{"recordKey": "2", "partitionPath": ""}], di
        ),
    ]
    # Hudi's own naming: writeToken suffix with dashes
    hudi_log.write_log_file(
        os.path.join(t, f".{fid}_{base}.log.1_0-21-31"), blocks
    )
    _complete_deltacommit(t, di)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "A2"), (3, "new")]
    # compaction folds the foreign log into a new base slice
    assert hudi.hudi_compact(spark, t) is not None
    assert hudi.hudi_file_slices(t)[0][2] > base
    got2 = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got2 == [(1, "A2"), (3, "new")]
    # post-compaction reads touch no log files: clean reaps old slice+log
    doomed = hudi.hudi_clean(t, dry_run=True)
    assert any(".log." in d for d in doomed)


def test_foreign_log_uncommitted_blocks_stay_invisible(spark, tmp_path):
    t = str(tmp_path / "mor_foreign2")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    part, fid, base, _path = hudi.hudi_file_slices(t)[0]
    di = hudi._next_instant(t)
    committed = hudi_log.encode_avro_data_block(
        [_foreign_rec("1", 1, "A!")], FOREIGN_SCHEMA, di
    )
    uncommitted = hudi_log.encode_avro_data_block(
        [_foreign_rec("1", 1, "GHOST")], FOREIGN_SCHEMA, str(int(di) + 7)
    )
    hudi_log.write_log_file(
        os.path.join(t, f".{fid}_{base}.log.1_0-1-0"),
        [committed, uncommitted],
    )
    _complete_deltacommit(t, di)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "A!")]


def test_unrecognizable_log_file_still_raises(spark, tmp_path):
    """A .log. file matching neither dialect (bad name AND bad magic)
    raises rather than being silently skipped."""
    t = str(tmp_path / "mor_bad")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    with open(os.path.join(t, "weird.log.stuff"), "w") as f:
        f.write("not a log")
    with pytest.raises(NotImplementedError, match="neither"):
        hudi.read_hudi(spark, t)


def test_mor_writer_emits_real_hoodie_framing(spark, tmp_path):
    """log_format='hoodie': this engine's OWN MoR writes come out in
    real HoodieLogFormat block framing — meta-field-carrying AVRO_DATA
    blocks and v3 DELETE blocks — and merge back identically."""
    import glob as _glob

    t = str(tmp_path / "mor_hoodie_out")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(
        spark, _mk(spark, [(2, "B!"), (9, "new")]), t, log_format="hoodie"
    )
    hudi.hudi_mor_delete(
        spark, _mk(spark, [(3, "x")]).select("id"), t, log_format="hoodie"
    )
    logs = sorted(_glob.glob(os.path.join(t, ".*.log.*")))
    assert logs, "no log files written"
    kinds = []
    for p in logs:
        assert hudi_log.is_hoodie_log(p), p
        for b in hudi_log.read_log_blocks(p):
            kinds.append(b["type"])
            if b["type"] == "AVRO_DATA_BLOCK":
                recs = hudi_log.decode_avro_data_block(b)
                assert all("_hoodie_record_key" in r for r in recs)
    assert "AVRO_DATA_BLOCK" in kinds and "DELETE_BLOCK" in kinds
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "a"), (2, "B!"), (9, "new")]
    # compaction folds the self-written hoodie-framed logs too
    assert hudi.hudi_compact(spark, t) is not None
    got2 = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got2 == [(1, "a"), (2, "B!"), (9, "new")]


def test_mor_hoodie_framing_partitioned_identity(spark, tmp_path):
    """Partitioned MoR + hoodie framing: the delete block's
    partitionPath names the (key, partition) identity, so deleting
    (1, en) must not touch (1, de)."""
    t = str(tmp_path / "mor_hoodie_part")
    df = spark.createDataFrame(
        [(1, "en", "x"), (1, "de", "y"), (2, "en", "z")],
        "id long, lang string, v string",
    ).coalesce(1)
    hudi.hudi_insert(
        spark, df, t, record_key="id",
        partition_by=["lang"], table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(
        spark,
        spark.createDataFrame(
            [(2, "en", "Z!")], "id long, lang string, v string"
        ),
        t,
        log_format="hoodie",
    )
    hudi.hudi_mor_delete(
        spark,
        spark.createDataFrame([(1, "en")], "id long, lang string"),
        t,
        log_format="hoodie",
    )
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "de", "y"), (2, "en", "Z!")]


def test_mor_writer_rejects_unknown_log_format(spark, tmp_path):
    t = str(tmp_path / "mor_badfmt")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    with pytest.raises(ValueError, match="log_format"):
        hudi.hudi_mor_upsert(
            spark, _mk(spark, [(1, "b")]), t, log_format="parquet"
        )


def test_same_instant_log_rollover_later_file_wins(spark, tmp_path):
    """r9 review: Hudi rolls a group's log by size within one instant
    (.log.1 then .log.2, same writeToken) — the later FILE's write for
    a key must supersede the earlier file's."""
    t = str(tmp_path / "mor_rollover")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    part, fid, base, _path = hudi.hudi_file_slices(t)[0]
    di = hudi._next_instant(t)
    hudi_log.write_log_file(
        os.path.join(t, f".{fid}_{base}.log.1_0-1-0"),
        [hudi_log.encode_avro_data_block(
            [_foreign_rec("1", 1, "FIRST")], FOREIGN_SCHEMA, di)],
    )
    hudi_log.write_log_file(
        os.path.join(t, f".{fid}_{base}.log.2_0-1-0"),
        [hudi_log.encode_avro_data_block(
            [_foreign_rec("1", 1, "SECOND")], FOREIGN_SCHEMA, di)],
    )
    _complete_deltacommit(t, di)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "SECOND")]
    # compaction folds with the same ordering
    hudi.hudi_compact(spark, t)
    got2 = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got2 == [(1, "SECOND")]


def test_cross_file_rollback_no_resurrection(spark, tmp_path):
    """r9 review end-to-end: a failed task attempt's blocks in .log.1,
    rolled back by a COMMAND_BLOCK in .log.2 (rollover), must not
    resurrect records absent from the retry — the whole group's log
    files decode as one ordered stream."""
    t = str(tmp_path / "mor_xfile_rb")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    part, fid, base, _path = hudi.hudi_file_slices(t)[0]
    di = hudi._next_instant(t)
    # attempt 1 (rolled back) wrote keys 1 AND 2; the retry wrote only 1
    hudi_log.write_log_file(
        os.path.join(t, f".{fid}_{base}.log.1_0-1-0"),
        [hudi_log.encode_avro_data_block(
            [_foreign_rec("1", 1, "BAD"), _foreign_rec("2", 2, "GHOST")],
            FOREIGN_SCHEMA, di)],
    )
    hudi_log.write_log_file(
        os.path.join(t, f".{fid}_{base}.log.2_0-1-0"),
        [
            hudi_log.encode_rollback_block(str(int(di) + 1), di),
            hudi_log.encode_avro_data_block(
                [_foreign_rec("1", 1, "GOOD")], FOREIGN_SCHEMA, di
            ),
        ],
    )
    _complete_deltacommit(t, di)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "GOOD")]
    # compaction folds through the same stream semantics
    hudi.hudi_compact(spark, t)
    got2 = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got2 == [(1, "GOOD")]


def test_clean_spares_uncommitted_foreign_log(spark, tmp_path):
    """r9 review: a HoodieLogFormat file carrying an uncommitted block
    belongs to an in-flight writer — clean must not reap it even when
    its base slice is superseded."""
    t = str(tmp_path / "mor_clean_foreign")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    part, fid, base, _path = hudi.hudi_file_slices(t)[0]
    # an in-flight foreign writer's log: block instant NOT completed
    ghost = str(int(hudi._next_instant(t)) + 50)
    log_rel = f".{fid}_{base}.log.1_0-9-9"
    hudi_log.write_log_file(
        os.path.join(t, log_rel),
        [hudi_log.encode_avro_data_block(
            [_foreign_rec("1", 1, "GHOST")], FOREIGN_SCHEMA, ghost)],
    )
    # supersede the base slice so the group's old slice becomes doomed
    hudi.hudi_upsert(spark, _mk(spark, [(1, "A")]), t)
    doomed = hudi.hudi_clean(t, dry_run=True)
    assert all(log_rel not in d for d in doomed), doomed
    hudi.hudi_clean(t)
    assert os.path.exists(os.path.join(t, log_rel))
    # once the block's instant completes, the (now superseded-slice)
    # log becomes reapable
    _complete_deltacommit(t, ghost)
    # the ghost deltacommit upserts id=1 on the OLD base slice which is
    # superseded; clean may now reap its log
    doomed2 = hudi.hudi_clean(t, dry_run=True)
    assert any(log_rel in d for d in doomed2)


def test_parquet_data_block_roundtrip():
    """PARQUET_DATA_BLOCK (real Hudi's
    hoodie.logfile.data.block.format=parquet): records framed as one
    parquet file inside the block round-trip exactly, and the stream
    scanner surfaces them as upserts alongside avro blocks."""
    from dataset_grouper_spark.sources import hudi_log as hl

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "txt", "type": ["null", "string"]},
            {"name": "score", "type": ["null", "double"]},
        ],
    }
    recs = [
        {"id": 1, "txt": "a", "score": 0.5},
        {"id": 2, "txt": None, "score": -1.25},
    ]
    blk = hl.encode_parquet_data_block(recs, schema, "20240101000000000")
    parsed = hl.read_log_blocks(blk)
    assert len(parsed) == 1
    assert parsed[0]["type"] == "PARQUET_DATA_BLOCK"
    assert hl.decode_parquet_data_block(parsed[0]) == recs
    # stream composition: parquet upserts + avro delete in one file
    stream = hl.read_log_stream_records(
        [
            blk
            + hl.encode_delete_block(
                [{"recordKey": "1", "partitionPath": ""}],
                "20240101000000001",
            )
        ],
        completed=None,
    )
    ops = [(op, r.get("id") or r.get("recordKey")) for op, _i, _s, r in stream]
    assert ops == [("u", 1), ("u", 2), ("d", "1")]
