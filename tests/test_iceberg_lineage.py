"""Iceberg v3 row lineage: _row_id stability across appends/deletes."""

import pytest

from dataset_grouper_spark.sources import iceberg


def _ids(df):
    return {r.id: r._row_id for r in df.collect()}


class TestRowLineage:
    def test_enable_append_read(self, spark, tmp_path):
        t = str(tmp_path / "rl1")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(5)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, a, t)
        sid = iceberg.iceberg_enable_row_lineage(t)
        assert sid is not None
        meta = iceberg._load_metadata(t)
        assert meta["format-version"] == 3
        assert meta["next-row-id"] == 5
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert got == {i: i for i in range(5)}
        # idempotent
        assert iceberg.iceberg_enable_row_lineage(t) is None
        # appends continue from next-row-id
        b = spark.createDataFrame(
            [(10 + i, "x") for i in range(3)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, b, t)
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert got == {**{i: i for i in range(5)},
                       10: 5, 11: 6, 12: 7}
        assert iceberg._load_metadata(t)["next-row-id"] == 8

    def test_deletes_never_renumber(self, spark, tmp_path):
        t = str(tmp_path / "rl2")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(8)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, a, t)
        iceberg.iceberg_enable_row_lineage(t)
        iceberg.iceberg_dv_delete(spark, t, "id IN (2, 5)")
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        # survivors keep their original ids — the lineage contract
        assert got == {i: i for i in range(8) if i not in (2, 5)}

    def test_read_without_enable_raises(self, spark, tmp_path):
        t = str(tmp_path / "rl3")
        a = spark.createDataFrame([(1, "a")], "id long, v string")
        iceberg.iceberg_append(spark, a.coalesce(1), t)
        with pytest.raises(ValueError, match="row lineage is not"):
            iceberg.read_iceberg(spark, t, row_ids=True).collect()

    def test_partitioned_lineage_end_to_end(self, spark, tmp_path):
        # r12: the partitioned gate is gone — the retrofit keeps each
        # manifest entry's typed partition struct next to
        # first_row_id, appends keep assigning blocks, deletes never
        # renumber, compaction materializes, and partition pruning
        # still works on the lineage manifests
        t = str(tmp_path / "rl4")
        df = spark.createDataFrame(
            [(1, "en"), (2, "de"), (3, "en"), (4, "de")],
            "id long, lang string",
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(
            spark, df, t, partition_spec=[("lang", "identity")],
        )
        sid = iceberg.iceberg_enable_row_lineage(t)
        assert sid is not None
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert sorted(got) == [1, 2, 3, 4]
        assert sorted(got.values()) == [0, 1, 2, 3]
        before = dict(got)
        # partitioned append on a lineage table (the old append gate)
        b = spark.createDataFrame(
            [(10, "en")], "id long, lang string"
        ).coalesce(1)
        iceberg.iceberg_append(
            spark, b, t, partition_spec=[("lang", "identity")],
        )
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert got[10] == 4 and all(got[k] == v for k, v in before.items())
        # deletes never renumber
        iceberg.iceberg_dv_delete(spark, t, "id = 3")
        mid = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert mid == {k: v for k, v in got.items() if k != 3}
        # compaction preserves ids per partition
        iceberg.iceberg_rewrite_data_files(spark, t, min_input_files=2)
        assert _ids(iceberg.read_iceberg(spark, t, row_ids=True)) == mid
        # partition pruning still reads the lineage manifests
        en = iceberg.read_iceberg(
            spark, t, partition_filter={"lang": "en"}, row_ids=True
        )
        assert {r.id: r._row_id for r in en.collect()} == {
            k: v for k, v in mid.items() if k in (1, 10)
        }

    def test_compaction_preserves_row_ids(self, spark, tmp_path):
        # v3 lineage-preserving rewrite: compacted files materialize
        # _row_id physically (first_row_id = null in the manifest);
        # read = coalesce(materialized, first_row_id + ordinal)
        t = str(tmp_path / "rl_cp")
        a = spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, a, t)
        iceberg.iceberg_enable_row_lineage(t)
        b = spark.createDataFrame(
            [(10 + i, "x") for i in range(4)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, b, t)
        iceberg.iceberg_dv_delete(spark, t, "id IN (1, 11)")
        before = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        sid = iceberg.iceberg_rewrite_data_files(
            spark, t, min_input_files=2
        )
        assert sid is not None
        assert _ids(iceberg.read_iceberg(spark, t, row_ids=True)) == before
        # next-row-id untouched: a rewrite mints no identities
        assert iceberg._load_metadata(t)["next-row-id"] == 10
        # append after compaction continues the block
        c = spark.createDataFrame(
            [(100, "c")], "id long, v string"
        ).coalesce(1)
        iceberg.iceberg_append(spark, c, t)
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert got[100] == 10
        # RE-compacting already-materialized files keeps ids again
        iceberg.iceberg_rewrite_data_files(spark, t, min_input_files=2)
        assert _ids(iceberg.read_iceberg(spark, t, row_ids=True)) == got

    def test_enable_on_empty_table(self, spark, tmp_path):
        t = str(tmp_path / "rl6")
        # create-then-enable: ids assign from 0 on the first append
        a = spark.createDataFrame(
            [(i, "a") for i in range(3)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, a, t)
        iceberg.iceberg_enable_row_lineage(t)
        b = spark.createDataFrame(
            [(100, "b")], "id long, v string"
        ).coalesce(1)
        iceberg.iceberg_append(spark, b, t)
        got = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        assert got == {0: 0, 1: 1, 2: 2, 100: 3}

    def test_stats_survive_the_retrofit(self, spark, tmp_path):
        """The lineage rewrite must carry bounds — file skipping on a
        lineage table still prunes."""
        t = str(tmp_path / "rl7")
        a = spark.createDataFrame(
            [(i, "x") for i in range(100)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, a, t)
        b = spark.createDataFrame(
            [(i, "y") for i in range(1000, 1100)], "id long, v string"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, b, t)
        iceberg.iceberg_enable_row_lineage(t)
        got = iceberg.read_iceberg(
            spark, t, skip_filters=[("id", "<", 50)]
        )
        assert got.count() == 100  # file-level: only file A survives


    def test_zorder_rewrite_preserves_row_ids(self, spark, tmp_path):
        # the SORT-strategy rewrite (zorder_by) rides the same
        # lineage-preserving scan: every live file is rewritten along
        # the curve, ids materialize, survivors keep them
        t = str(tmp_path / "rl_z")
        a = spark.createDataFrame(
            [(i, i * 7 % 13) for i in range(64)], "id long, k long"
        ).repartition(1).sortWithinPartitions("id")
        iceberg.iceberg_append(spark, a, t)
        iceberg.iceberg_enable_row_lineage(t)
        iceberg.iceberg_dv_delete(spark, t, "id % 9 = 0")
        before = _ids(iceberg.read_iceberg(spark, t, row_ids=True))
        sid = iceberg.iceberg_rewrite_data_files(
            spark, t, zorder_by=("id", "k")
        )
        assert sid is not None
        assert _ids(iceberg.read_iceberg(spark, t, row_ids=True)) == before
