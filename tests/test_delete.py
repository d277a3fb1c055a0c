"""delete_partitioned: group-pruned row deletion (GDPR / TTL shape)."""

import glob
import os
import tempfile

import pytest

from dataset_grouper_spark import keys, sinks


def _files_with_mtimes(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f)
    }


@pytest.fixture()
def dataset(spark):
    path = tempfile.mkdtemp(prefix="del_")
    df = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 99),
            (3, "b", 99),
            (4, "b", 99),
            (5, "c", 10),
        ],
        "doc_id long, src string, score long",
    )
    sinks.write_partitioned(df, keys.by_feature("src"), path, order_col="doc_id")
    return path


def test_delete_rows_prunes_untouched_groups(spark, dataset):
    c_dir = os.path.join(dataset, "data", f"{keys.GROUP_COL}=c")
    before = _files_with_mtimes(c_dir)
    stats = sinks.delete_partitioned(
        spark, dataset, "score = 99 AND doc_id = 2", order_col="doc_id"
    )
    assert stats == {"deleted_rows": 1, "groups_rewritten": 1}
    out = spark.read.parquet(os.path.join(dataset, "data"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4, 5]
    assert _files_with_mtimes(c_dir) == before  # c untouched


def test_delete_whole_group_removes_directory(spark, dataset):
    stats = sinks.delete_partitioned(spark, dataset, "score = 99")
    assert stats["deleted_rows"] == 3
    out = spark.read.parquet(os.path.join(dataset, "data"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]
    # group b matched entirely -> its directory is gone
    assert not os.path.isdir(
        os.path.join(dataset, "data", f"{keys.GROUP_COL}=b")
    )
    idx = {
        r[keys.GROUP_COL]: r["num_examples"]
        for r in spark.read.parquet(
            os.path.join(dataset, sinks.GROUP_INDEX_DIR)
        ).collect()
    }
    assert idx == {"a": 1, "c": 1}


def test_delete_no_match_is_noop(spark, dataset):
    data = os.path.join(dataset, "data")
    before = _files_with_mtimes(data)
    stats = sinks.delete_partitioned(spark, dataset, "score = 12345")
    assert stats == {"deleted_rows": 0, "groups_rewritten": 0}
    assert _files_with_mtimes(data) == before


def test_vacuum_removes_crash_leftovers(spark, dataset):
    import pathlib

    for suffix in ("_compacting", "_upserting", "_deleting"):
        d = pathlib.Path(dataset) / ("data" + suffix)
        d.mkdir()
        (d / "part-stranded.parquet").write_bytes(b"junk")
    stats = sinks.vacuum_partitioned(dataset)
    assert sorted(stats["removed"]) == [
        "data_compacting", "data_deleting", "data_upserting"
    ]
    # the real data is untouched and a second vacuum is a no-op
    assert spark.read.parquet(os.path.join(dataset, "data")).count() == 5
    assert sinks.vacuum_partitioned(dataset) == {"removed": []}
