"""Bulk group iteration and incremental append."""

from dataset_grouper_spark import keys, sinks
from dataset_grouper_spark.loader import PartitionedDataset


def test_iter_groups_bulk_matches_group_stream(spark, tmp_path):
    path = str(tmp_path / "pds")
    df = spark.createDataFrame(
        [(i, i % 7, f"r{i}") for i in range(140)],
        "id: long, label: long, text: string",
    )
    sinks.write_partitioned(df, keys.by_feature("label"), path, order_col="id")
    pds = PartitionedDataset(spark, path)

    bulk = {g: pdf for g, pdf in pds.iter_groups_bulk(order_col="id")}
    assert len(bulk) == 7
    stream = {
        g: pdf for c in pds.group_stream() for g, pdf in c
    }
    assert set(bulk) == set(stream)
    for g in bulk:
        b = bulk[g].sort_values("id").reset_index(drop=True)
        s = stream[g].sort_values("id").reset_index(drop=True)
        assert list(b["id"]) == list(s["id"])
        assert list(b.columns) == list(s.columns)
    # within-group order honors order_col
    assert list(bulk["3"]["id"]) == sorted(bulk["3"]["id"])


def test_iter_groups_bulk_on_bucketed_layout(spark, tmp_path):
    path = str(tmp_path / "pds_b")
    df = spark.createDataFrame(
        [(i, f"d{i % 30}") for i in range(300)], "id: long, dom: string"
    )
    sinks.write_partitioned(
        df, keys.by_feature("dom"), path, order_col="id",
        layout="bucketed", num_buckets=4,
    )
    pds = PartitionedDataset(spark, path)
    bulk = dict(pds.iter_groups_bulk(order_col="id"))
    assert len(bulk) == 30
    assert all(len(pdf) == 10 for pdf in bulk.values())
    assert all("bucket_id" not in pdf.columns for pdf in bulk.values())


def test_append_partitioned_grows_dataset(spark, tmp_path):
    path = str(tmp_path / "pds_a")
    df1 = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id: long, label: long"
    )
    sinks.write_partitioned(df1, keys.by_feature("label"), path, order_col="id")
    df2 = spark.createDataFrame(
        [(100 + i, i % 5) for i in range(25)], "id: long, label: long"
    )
    sinks.append_partitioned(df2, keys.by_feature("label"), path, order_col="id")
    pds = PartitionedDataset(spark, path)
    assert pds.dataframe().count() == 55
    idx = {r.group_id: r.num_examples for r in pds.group_index().collect()}
    assert len(idx) == 5          # groups 3,4 appeared via append
    assert idx["0"] == 10 + 5     # 10 original + 5 appended
    assert idx["4"] == 5


def test_iter_groups_bulk_column_projection(spark, tmp_path):
    # metadata-only epoch: the projection must reach the frames (and
    # the spill), while the group column itself is still dropped
    path = str(tmp_path / "pds_proj")
    df = spark.createDataFrame(
        [(i, i % 4, f"text {i}", i * 10) for i in range(80)],
        "id: long, label: long, text: string, size: long",
    )
    sinks.write_partitioned(df, keys.by_feature("label"), path, order_col="id")
    pds = PartitionedDataset(spark, path)
    got = dict(pds.iter_groups_bulk(order_col="id", columns=["id", "size"]))
    assert set(got) == {"0", "1", "2", "3"}
    for gid, pdf in got.items():
        assert list(pdf.columns) == ["id", "size"]
        assert len(pdf) == 20
        assert (pdf["id"] % 4 == int(gid)).all()
        assert (pdf["size"] == pdf["id"] * 10).all()
    # unprojected run still carries all columns
    full = dict(pds.iter_groups_bulk())
    assert set(full["0"].columns) == {"id", "label", "text", "size"}
