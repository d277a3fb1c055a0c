"""open_table: one entry point across every layout the engine speaks."""

import pytest

from dataset_grouper_spark.sources import open_table, table_format


def test_dispatches_all_four_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    raw = str(tmp_path / "raw")
    df.write.parquet(raw)

    delta = str(tmp_path / "delta")
    from dataset_grouper_spark.sources.delta import delta_append

    delta_append(spark, df, delta)

    ice = str(tmp_path / "ice")
    from dataset_grouper_spark.sources.iceberg import iceberg_append

    iceberg_append(spark, df, ice)

    snap = str(tmp_path / "snap")
    from dataset_grouper_spark.sinks.snapshots import snapshot_write

    snapshot_write(df, snap)

    assert table_format(raw) == "parquet"
    assert table_format(delta) == "delta"
    assert table_format(ice) == "iceberg"
    assert table_format(snap) == "snapshots"
    for path in (raw, delta, ice, snap):
        got = sorted(r["id"] for r in open_table(spark, path).collect())
        assert got == [1, 2], path


def test_kwargs_route_to_reader(spark, tmp_path):
    from dataset_grouper_spark.sources.delta import delta_append

    t = str(tmp_path / "d")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    delta_append(spark, df1, t)
    delta_append(spark, df2, t)
    assert open_table(spark, t, version=0).count() == 1
    assert open_table(spark, t).count() == 2


def test_parquet_rejects_reader_kwargs(spark, tmp_path):
    p = str(tmp_path / "p")
    spark.createDataFrame([(1,)], "id long").write.parquet(p)
    with pytest.raises(TypeError, match="no reader kwargs"):
        open_table(spark, p, version=3)
