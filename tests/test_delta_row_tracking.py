"""Delta row tracking: baseRowId retrofit, append blocks, _row_id."""

import pytest

from dataset_grouper_spark.sources import delta


def _ids(df):
    return {r.id: r._row_id for r in df.collect()}


def _sorted1(df, col="id"):
    return df.repartition(1).sortWithinPartitions(col)


class TestRowTracking:
    def test_enable_append_read(self, spark, tmp_path):
        t = str(tmp_path / "rt1")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(5)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        v = delta.delta_enable_row_tracking(spark, t)
        assert v == 1
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert got == {i: i for i in range(5)}
        # idempotent
        assert delta.delta_enable_row_tracking(spark, t) is None
        # appends take the next id block, watermark rides the commit
        b = spark.createDataFrame(
            [(10 + i, "x") for i in range(3)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(b), t)
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert got == {**{i: i for i in range(5)}, 10: 5, 11: 6, 12: 7}
        hwm = delta._row_tracking_watermark(
            spark, t, delta._latest_version(t)
        )
        assert hwm == 7

    def test_dv_delete_never_renumbers(self, spark, tmp_path):
        t = str(tmp_path / "rt2")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        delta.delta_delete_where(spark, t, "id IN (2, 5)")
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert got == {i: i for i in range(8) if i not in (2, 5)}

    def test_read_without_enable_raises(self, spark, tmp_path):
        t = str(tmp_path / "rt3")
        delta.delta_append(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
        )
        with pytest.raises(ValueError, match="row tracking is not"):
            delta.read_delta(spark, t, row_ids=True).collect()

    def test_merge_preserves_and_mints_row_ids(self, spark, tmp_path):
        # spec stable-row-id DML: survivors keep their ids, UPDATES
        # inherit the matched row's id, pure INSERTS mint fresh ids
        # from the new file's baseRowId block
        t = str(tmp_path / "rt_mrg")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        before = _ids(delta.read_delta(spark, t, row_ids=True))
        src = spark.createDataFrame(
            [(2, "UPDATED"), (100, "fresh")], "id long, v string"
        )
        v = delta.delta_merge(spark, src, t, on=["id"])
        assert v is not None
        got = delta.read_delta(spark, t, row_ids=True)
        ids = _ids(got)
        vals = {r.id: r.v for r in got.collect()}
        # survivors untouched, the update INHERITED id 2's row id
        for i in range(6):
            assert ids[i] == before[i]
        assert vals[2] == "UPDATED"
        # the insert minted a fresh id above the old watermark
        assert ids[100] > max(before.values())
        assert len(set(ids.values())) == len(ids)
        # a second merge over the merged (materialized) file again
        v2 = delta.delta_merge(
            spark,
            spark.createDataFrame([(2, "AGAIN")], "id long, v string"),
            t,
            on=["id"],
        )
        ids2 = _ids(delta.read_delta(spark, t, row_ids=True))
        assert ids2 == ids

    def test_restore_is_id_stable(self, spark, tmp_path):
        t = str(tmp_path / "rt_rst")
        a = spark.createDataFrame(
            [(i, "a") for i in range(4)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)          # v0
        delta.delta_enable_row_tracking(spark, t)          # v1
        before = _ids(delta.read_delta(spark, t, row_ids=True))
        b = spark.createDataFrame([(9, "b")], "id long, v string")
        delta.delta_append(spark, _sorted1(b), t)          # v2
        delta.delta_delete_where(spark, t, "id = 1")       # v3
        # restore to v1 (tracked, pre-append): original ids exactly
        delta.delta_restore(spark, t, 1)
        assert _ids(delta.read_delta(spark, t, row_ids=True)) == before
        # restore to v0 (PRE-enablement files): fresh ids minted, the
        # watermark never regresses, reads stay consistent
        delta.delta_restore(spark, t, 0)
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert set(got) == {0, 1, 2, 3}
        assert len(set(got.values())) == 4
        hwm = delta._row_tracking_watermark(
            spark, t, delta._latest_version(t)
        )
        assert hwm >= max(got.values())

    def test_optimize_preserves_row_ids(self, spark, tmp_path):
        # spec row-id materialization: OPTIMIZE writes _row_id as a
        # physical column; read = coalesce(materialized, baseRowId +
        # ordinal); watermark advances with the new adds' blocks
        t = str(tmp_path / "rt_opt")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        b = spark.createDataFrame(
            [(10 + i, "x") for i in range(4)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(b), t)
        delta.delta_delete_where(spark, t, "id IN (1, 11)")
        before = _ids(delta.read_delta(spark, t, row_ids=True))
        v = delta.delta_optimize(spark, t)
        assert v is not None
        assert _ids(delta.read_delta(spark, t, row_ids=True)) == before
        # watermark advanced past the rewritten file's fresh block
        hwm = delta._row_tracking_watermark(
            spark, t, delta._latest_version(t)
        )
        assert hwm >= 9
        # append after OPTIMIZE mints fresh non-overlapping ids
        c = spark.createDataFrame([(100, "c")], "id long, v string")
        delta.delta_append(spark, _sorted1(c), t)
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert got[100] > 9
        assert len(set(got.values())) == len(got)
        # RE-optimize over already-materialized + fresh files
        v2 = delta.delta_optimize(spark, t)
        if v2 is not None:
            assert _ids(delta.read_delta(spark, t, row_ids=True)) == got

    def test_optimize_zorder_preserves_row_ids(self, spark, tmp_path):
        t = str(tmp_path / "rt_z")
        a = spark.createDataFrame(
            [(i, i * 7 % 13) for i in range(32)], "id long, k long"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        before = _ids(delta.read_delta(spark, t, row_ids=True))
        v = delta.delta_optimize(spark, t, zorder_by=("id", "k"))
        assert v is not None
        assert _ids(delta.read_delta(spark, t, row_ids=True)) == before

    def test_watermark_survives_checkpoint_truncate(self, spark, tmp_path):
        t = str(tmp_path / "rt5")
        a = spark.createDataFrame(
            [(i, "a") for i in range(4)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        delta.delta_checkpoint(spark, t)
        delta.delta_truncate_log(t)
        hwm = delta._row_tracking_watermark(
            spark, t, delta._latest_version(t) or 1
        )
        assert hwm == 3
        # ids still read correctly from checkpoint state
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}
        # and a post-truncation append continues the block
        b = spark.createDataFrame([(9, "b")], "id long, v string")
        delta.delta_append(spark, _sorted1(b), t)
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        assert got[9] == 4

    def test_protocol_merges_not_clobbers(self, spark, tmp_path):
        """Review finding: enabling row tracking on a DV table (and
        vice versa) must UNION protocol features, not overwrite —
        else external readers see DV adds without the deletionVectors
        feature declared."""
        t = str(tmp_path / "rt6")
        a = spark.createDataFrame(
            [(i, "a") for i in range(6)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_delete_where(spark, t, "id = 1")  # DV protocol
        delta.delta_enable_row_tracking(spark, t)
        proto = delta._current_protocol(t, delta._latest_version(t))
        assert proto["minReaderVersion"] == 3
        assert proto["minWriterVersion"] == 7
        assert "deletionVectors" in proto.get("readerFeatures", [])
        assert set(proto["writerFeatures"]) >= {
            "deletionVectors", "domainMetadata", "rowTracking"
        }
        # the other order: DV delete AFTER enabling keeps rowTracking
        t2 = str(tmp_path / "rt7")
        delta.delta_append(spark, _sorted1(a), t2)
        delta.delta_enable_row_tracking(spark, t2)
        delta.delta_delete_where(spark, t2, "id = 1")
        proto = delta._current_protocol(t2, delta._latest_version(t2))
        assert "rowTracking" in proto["writerFeatures"]
        assert "deletionVectors" in proto["writerFeatures"]
        # and both tables still read correctly with row ids
        got = _ids(delta.read_delta(spark, t2, row_ids=True))
        assert got == {i: i for i in range(6) if i != 1}

    def test_checkpoint_preserves_protocol_after_truncate(
        self, spark, tmp_path
    ):
        """Review finding: a checkpoint written after log truncation
        must carry the upgraded protocol, not the default."""
        t = str(tmp_path / "rt8")
        a = spark.createDataFrame(
            [(i, "a") for i in range(4)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        delta.delta_checkpoint(spark, t)
        delta.delta_truncate_log(t)
        delta.delta_append(
            spark,
            _sorted1(spark.createDataFrame(
                [(9, "b")], "id long, v string"
            )),
            t,
        )
        # second checkpoint: JSON tail has NO protocol action
        delta.delta_checkpoint(spark, t)
        proto = delta._current_protocol(t, delta._latest_version(t))
        assert proto["minWriterVersion"] == 7
        assert "rowTracking" in proto["writerFeatures"]

    def test_empty_prune_keeps_row_id_column(self, spark, tmp_path):
        t = str(tmp_path / "rt9")
        a = spark.createDataFrame(
            [(i, "a") for i in range(4)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        got = delta.read_delta(
            spark, t, row_ids=True, skip_filters=[("id", ">", 999)]
        )
        assert "_row_id" in got.columns and got.count() == 0

    def test_stats_less_add_never_zero_width_block(
        self, spark, tmp_path, monkeypatch
    ):
        """ADVICE r10: an add action lacking stats took a zero-width
        baseRowId block, so the NEXT file's row ids overlapped it —
        the append path must fall back to the parquet footer count
        like delta_enable_row_tracking does."""
        t = str(tmp_path / "rt_nostats")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(4)], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(a), t)
        delta.delta_enable_row_tracking(spark, t)
        # simulate a writer that emits no stats (allowed by the spec)
        monkeypatch.setattr(delta, "_file_stats", lambda *_a: None)
        b = spark.createDataFrame(
            [(10, "x"), (11, "y")], "id long, v string"
        )
        delta.delta_append(spark, _sorted1(b), t)
        c = spark.createDataFrame([(20, "z")], "id long, v string")
        delta.delta_append(spark, _sorted1(c), t)
        got = _ids(delta.read_delta(spark, t, row_ids=True))
        # every row id unique; the two stats-less files got real-width
        # blocks: 4 original + 2 + 1 = 7 distinct ids, watermark 6
        assert len(set(got.values())) == 7
        assert got == {0: 0, 1: 1, 2: 2, 3: 3, 10: 4, 11: 5, 20: 6}


def test_materialized_row_id_column_name_gate(spark, tmp_path):
    """ADVICE r12: the spec records the materialized row-id column in
    delta.rowTracking.materializedRowIdColumnName. Enablement writes
    the key (interop: other engines resolve our rewritten files);
    a table configured with a DIFFERENT name raises loudly instead of
    silently serving baseRowId+ordinal fallback ids."""
    import json
    import os

    from dataset_grouper_spark.sources.delta import (
        delta_append,
        delta_enable_row_tracking,
        read_delta,
    )

    t = str(tmp_path / "rt")
    delta_append(
        spark, spark.createDataFrame([(1,), (2,)], "id long"), t
    )
    delta_enable_row_tracking(spark, t)
    log = os.path.join(t, "_delta_log")
    latest = sorted(
        n for n in os.listdir(log) if n.endswith(".json")
    )[-1]
    conf = None
    with open(os.path.join(log, latest)) as f:
        for line in f:
            a = json.loads(line)
            if "metaData" in a:
                conf = a["metaData"]["configuration"]
    assert (
        conf["delta.rowTracking.materializedRowIdColumnName"]
        == "_row_id"
    )
    assert sorted(
        r._row_id for r in read_delta(spark, t, row_ids=True).collect()
    ) == [0, 1]
    # foreign choice of name: loud gate, not wrong ids
    meta = json.loads(
        [
            line
            for line in open(os.path.join(log, latest))
            if "metaData" in json.loads(line)
        ][0]
    )["metaData"]
    meta["configuration"][
        "delta.rowTracking.materializedRowIdColumnName"
    ] = "row_id_col_7"
    nxt = int(latest.split(".")[0]) + 1
    with open(os.path.join(log, f"{nxt:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": meta}) + "\n")
    with pytest.raises(NotImplementedError, match="row_id_col_7"):
        read_delta(spark, t, row_ids=True).collect()
