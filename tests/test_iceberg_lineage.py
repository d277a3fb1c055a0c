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

    def test_gates(self, spark, tmp_path):
        # partitioned table: enabling gates
        t = str(tmp_path / "rl4")
        df = spark.createDataFrame(
            [(1, "en"), (2, "de")], "id long, lang string"
        )
        iceberg.iceberg_append(
            spark, df.coalesce(1), t,
            partition_spec=[("lang", "identity")],
        )
        with pytest.raises(NotImplementedError, match="partitioned"):
            iceberg.iceberg_enable_row_lineage(t)

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
