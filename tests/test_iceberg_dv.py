"""Iceberg v3 deletion vectors: Puffin codec + DV delete lifecycle."""

import json
import struct
import zlib

import pytest

from dataset_grouper_spark.sources import iceberg, puffin


class TestPuffinCodec:
    def test_dv_blob_roundtrip(self):
        pos = [0, 1, 5, 100_000, (3 << 32) + 7]
        blob = puffin.dv_blob_encode(pos)
        assert puffin.dv_blob_decode(blob) == sorted(pos)
        # spec framing: BE length, magic D1 D3 39 64, BE CRC-32
        (length,) = struct.unpack_from(">i", blob, 0)
        assert blob[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])
        (crc,) = struct.unpack_from(">I", blob, 4 + length)
        assert crc == zlib.crc32(blob[4 : 4 + length])

    def test_dv_blob_crc_and_magic_guards(self):
        blob = bytearray(puffin.dv_blob_encode([1, 2, 3]))
        bad = bytearray(blob)
        bad[-1] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-32"):
            puffin.dv_blob_decode(bytes(bad))
        bad = bytearray(blob)
        bad[4] = 0x00
        with pytest.raises(ValueError, match="magic"):
            puffin.dv_blob_decode(bytes(bad))

    def test_puffin_file_structure_and_footer(self, tmp_path):
        p = str(tmp_path / "x.puffin")
        b1 = puffin.dv_blob_encode([1, 2])
        b2 = puffin.dv_blob_encode([9])
        spans = puffin.write_puffin(
            p,
            [
                (puffin.DV_BLOB_TYPE, b1, {"referenced-data-file": "a"}),
                (puffin.DV_BLOB_TYPE, b2, {"referenced-data-file": "b"}),
            ],
            properties={"created-by": "test"},
        )
        raw = open(p, "rb").read()
        assert raw[:4] == b"PFA1" and raw[-4:] == b"PFA1"
        meta = puffin.read_puffin_footer(p)
        assert [b["type"] for b in meta["blobs"]] == [
            puffin.DV_BLOB_TYPE
        ] * 2
        # footer offsets == returned spans == manifest coordinates
        for blob_meta, (off, ln) in zip(meta["blobs"], spans):
            assert (blob_meta["offset"], blob_meta["length"]) == (off, ln)
        assert puffin.read_dv(p, *spans[0]) == [1, 2]
        assert puffin.read_dv(p, *spans[1]) == [9]
        assert meta["properties"] == {"created-by": "test"}

    def test_footer_is_valid_json_payload(self, tmp_path):
        p = str(tmp_path / "y.puffin")
        puffin.write_puffin(
            p, [(puffin.DV_BLOB_TYPE, puffin.dv_blob_encode([4]), {})]
        )
        raw = open(p, "rb").read()
        (size,) = struct.unpack_from("<i", raw, len(raw) - 12)
        payload = raw[len(raw) - 12 - size : len(raw) - 12]
        assert json.loads(payload)  # plain uncompressed JSON


class TestDvDelete:
    def _table(self, spark, tmp_path, name, rows=None):
        path = str(tmp_path / name)
        df = spark.createDataFrame(
            rows
            or [(i, f"v{i}", "en" if i % 2 == 0 else "de")
                for i in range(10)],
            "id long, v string, lang string",
        )
        iceberg.iceberg_append(spark, df.coalesce(2), path)
        return path

    def test_dv_delete_roundtrip(self, spark, tmp_path):
        t = self._table(spark, tmp_path, "t1")
        sid = iceberg.iceberg_dv_delete(spark, t, "id % 3 = 0")
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [i for i in range(10) if i % 3 != 0]
        meta = iceberg._load_metadata(t)
        assert meta["format-version"] == 3
        assert meta["current-snapshot-id"] == sid

    def test_dv_delete_noop_returns_current(self, spark, tmp_path):
        t = self._table(spark, tmp_path, "t2")
        before = iceberg._load_metadata(t)["current-snapshot-id"]
        assert iceberg.iceberg_dv_delete(spark, t, "id > 999") == before

    def test_dv_rerun_is_noop_and_second_file_gate(self, spark, tmp_path):
        t = self._table(spark, tmp_path, "t3")
        iceberg.iceberg_dv_delete(spark, t, "id = 4")
        # re-run of the same predicate: already-dead rows can't match
        before = iceberg._load_metadata(t)["current-snapshot-id"]
        assert iceberg.iceberg_dv_delete(spark, t, "id = 4") == before
        # a second DV on the SAME file must gate (spec: one DV/file)
        with pytest.raises(NotImplementedError, match="ONE DV per"):
            iceberg.iceberg_dv_delete(spark, t, "id = 6")

    def test_dv_composes_with_v2_position_deletes(self, spark, tmp_path):
        t = self._table(spark, tmp_path, "t4")
        iceberg.iceberg_delete_where(spark, t, "id = 1")  # v2 parquet
        iceberg.iceberg_dv_delete(spark, t, "id = 2")  # v3 DV
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [0, 3, 4, 5, 6, 7, 8, 9]

    def test_dv_composes_with_equality_deletes(self, spark, tmp_path):
        t = self._table(spark, tmp_path, "t5")
        keys = spark.createDataFrame([("de",)], "lang string")
        iceberg.iceberg_delete_values(spark, keys, t)
        iceberg.iceberg_dv_delete(spark, t, "id = 0")
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [2, 4, 6, 8]

    def test_time_travel_before_dv(self, spark, tmp_path):
        t = self._table(spark, tmp_path, "t6")
        meta = iceberg._load_metadata(t)
        pre = meta["current-snapshot-id"]
        iceberg.iceberg_dv_delete(spark, t, "id < 5")
        full = iceberg.read_iceberg(spark, t, snapshot_id=pre)
        assert full.count() == 10
        assert iceberg.read_iceberg(spark, t).count() == 5

    def test_compaction_clears_dv_then_new_dv_allowed(
        self, spark, tmp_path
    ):
        t = self._table(spark, tmp_path, "t7")
        iceberg.iceberg_dv_delete(spark, t, "id = 3")
        iceberg.iceberg_rewrite_data_files(spark, t)
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9]
        # the rewritten files carry no DVs: a fresh DV delete works
        iceberg.iceberg_dv_delete(spark, t, "id = 5")
        assert iceberg.read_iceberg(spark, t).count() == 8


class TestRemoveDanglingDeletes:
    def test_dangling_dv_and_position_deletes_drop_after_compaction(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "dd1")
        df = spark.createDataFrame(
            [(i, f"v{i}", "en") for i in range(12)],
            "id long, v string, lang string",
        )
        iceberg.iceberg_append(spark, df.coalesce(2), t)
        iceberg.iceberg_delete_where(spark, t, "id = 1")
        iceberg.iceberg_dv_delete(spark, t, "id = 2")
        # full compaction applies both; the delete entries now dangle
        iceberg.iceberg_rewrite_data_files(spark, t, min_input_files=1)
        meta = iceberg._load_metadata(t)
        snap = next(
            s for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        _d, dels, _r, eq = iceberg._live_files(t, snap)
        assert dels  # compaction leaves the inert entries by design
        sid = iceberg.iceberg_remove_dangling_deletes(spark, t)
        assert sid is not None
        meta = iceberg._load_metadata(t)
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == sid
        )
        data, dels, _r, eq = iceberg._live_files(t, snap)
        assert dels == [] and eq == []
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [0, 3, 4, 5, 6, 7, 8, 9, 10, 11]
        # idempotent
        assert iceberg.iceberg_remove_dangling_deletes(spark, t) is None

    def test_live_deletes_survive(self, spark, tmp_path):
        t = str(tmp_path / "dd2")
        df = spark.createDataFrame(
            [(i, f"v{i}", "en") for i in range(8)],
            "id long, v string, lang string",
        )
        iceberg.iceberg_append(spark, df.coalesce(1), t)
        iceberg.iceberg_dv_delete(spark, t, "id = 3")
        # nothing was compacted: the DV still governs its live file
        assert iceberg.iceberg_remove_dangling_deletes(spark, t) is None
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [0, 1, 2, 4, 5, 6, 7]

    def test_equality_delete_survives_compaction_by_sequence_math(
        self, spark, tmp_path
    ):
        """Rewritten files take the MAX bin data sequence (rewrite
        docstring), so an equality delete with a HIGHER sequence still
        governs them per spec ordering — it is not provably dangling
        and must survive (re-applying it is a no-op: the values are
        already gone). This is the same conservative rule real
        Iceberg's removeDanglingDeletes applies."""
        t = str(tmp_path / "dd3")
        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "de") for i in range(6)],
            "id long, lang string",
        )
        iceberg.iceberg_append(spark, df.coalesce(1), t)
        keys = spark.createDataFrame([("de",)], "lang string")
        iceberg.iceberg_delete_values(spark, keys, t)
        iceberg.iceberg_rewrite_data_files(spark, t, min_input_files=1)
        assert iceberg.iceberg_remove_dangling_deletes(spark, t) is None
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [0, 2, 4]

    def test_equality_delete_straddling_new_data_survives(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "dd4")
        a = spark.createDataFrame(
            [(1, "de"), (2, "en")], "id long, lang string"
        )
        iceberg.iceberg_append(spark, a.coalesce(1), t)
        keys = spark.createDataFrame([("de",)], "lang string")
        iceberg.iceberg_delete_values(spark, keys, t)
        # NEW data after the delete: file seq > delete seq, delete is
        # inert for it BUT still governs the old file — must survive
        b = spark.createDataFrame(
            [(9, "de")], "id long, lang string"
        )
        iceberg.iceberg_append(spark, b.coalesce(1), t)
        assert iceberg.iceberg_remove_dangling_deletes(spark, t) is None
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [2, 9]

    def test_mixed_cleanup_preserves_live_equality_ids(
        self, spark, tmp_path
    ):
        """A dangling DV and a LIVE equality delete in one cleanup:
        the rewritten combined manifest must preserve the surviving
        entry's equality_ids or the read would stop applying it."""
        t = str(tmp_path / "dd5")
        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "de") for i in range(8)],
            "id long, lang string",
        )
        iceberg.iceberg_append(spark, df.coalesce(1), t)
        iceberg.iceberg_dv_delete(spark, t, "id = 0")
        iceberg.iceberg_rewrite_data_files(spark, t, min_input_files=1)
        # eq delete AFTER compaction: governs the rewritten file
        keys = spark.createDataFrame([("de",)], "lang string")
        iceberg.iceberg_delete_values(spark, keys, t)
        sid = iceberg.iceberg_remove_dangling_deletes(spark, t)
        assert sid is not None  # the DV dangled
        meta = iceberg._load_metadata(t)
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == sid
        )
        _d, dels, _r, eq = iceberg._live_files(t, snap)
        assert dels == [] and len(eq) == 1 and eq[0][2]  # ids intact
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [2, 4, 6]


class TestReviewRegressions:
    def test_dv_delete_on_converted_table_and_uri_paths(
        self, spark, tmp_path
    ):
        """Review findings: (a) converted tables have no data/ dir —
        the DV write must create it; (b) URI-backed tables (file://
        manifests) need scheme-aware path-map keys or the delete
        silently no-ops."""
        import os
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "tools")
        )
        from make_foreign_fixtures import build_iceberg

        t = str(tmp_path / "ice_uri_dv")
        os.makedirs(t)
        build_iceberg(t, absolute=True)  # file:// URIs, metadata/ only
        before = iceberg.read_iceberg(spark, t).count()
        sid = iceberg.iceberg_dv_delete(spark, t, "id = 4")
        assert sid is not None
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert 4 not in got and len(got) == before - 1

    def test_one_dv_per_file_gate_sees_uri_refs(self, spark, tmp_path):
        """ADVICE r10: the clash check compared raw manifest
        referenced_data_file (a file:// URI on foreign tables) against
        localized absolute paths, so a second DV silently stacked on a
        file already carrying one — deleted rows would resurrect for a
        spec-compliant external reader. Both sides must normalize."""
        import os
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "tools")
        )
        from make_foreign_fixtures import build_iceberg

        t = str(tmp_path / "ice_uri_dv_gate")
        os.makedirs(t)
        # file:// manifests; id=8's file already carries a DV
        build_iceberg(t, absolute=True, with_deletes=True, with_dv=True)
        with pytest.raises(NotImplementedError, match="ONE DV per"):
            iceberg.iceberg_dv_delete(spark, t, "id = 9")
        # the gate must roll back its orphan puffin: still exactly one
        import glob as _glob

        dvs = _glob.glob(os.path.join(t, "data", "**", "*.puffin"),
                         recursive=True)
        assert len(dvs) == 1
        # and the table still reads exactly as before the attempt
        got = sorted(
            r.id for r in iceberg.read_iceberg(spark, t).collect()
        )
        assert got == [1, 3, 4, 5, 9]

    def test_row_lineage_empty_plan_keeps_column(self, spark, tmp_path):
        t = str(tmp_path / "rl_empty")
        df = spark.createDataFrame(
            [(1, "a")], "id long, v string"
        ).coalesce(1)
        iceberg.iceberg_append(spark, df, t)
        iceberg.iceberg_enable_row_lineage(t)
        got = iceberg.read_iceberg(
            spark, t, row_ids=True, skip_filters=[("id", ">", 99)]
        )
        assert "_row_id" in got.columns and got.count() == 0
