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
    assert sinks.vacuum_partitioned(dataset) == {"removed": [], "restored": None}


def test_vacuum_restores_mid_swap_crash(spark, dataset):
    import shutil

    # simulate compact crashing mid-swap: data/ renamed aside, temp gone
    data = os.path.join(dataset, "data")
    shutil.move(data, data + "_retiring")
    stats = sinks.vacuum_partitioned(dataset)
    assert stats["restored"] == "data_retiring"
    assert spark.read.parquet(data).count() == 5  # nothing lost


def test_vacuum_never_deletes_the_only_copy(spark, dataset):
    import shutil

    # data/ missing and only a staged temp survives: vacuum must NOT
    # delete it (it is the only copy)
    data = os.path.join(dataset, "data")
    shutil.move(data, data + "_compacting")
    stats = sinks.vacuum_partitioned(dataset)
    assert stats["removed"] == []
    assert os.path.isdir(data + "_compacting")


def test_delete_full_group_with_uri_escapable_name(spark):
    # group ids with spaces land on disk as 'group_id=a b' but
    # input_file_name() reports 'group_id=a%20b' — the dir must still
    # be removed on a full-group delete (GDPR erasure that actually
    # erases)
    path = tempfile.mkdtemp(prefix="del_esc_")
    df = spark.createDataFrame(
        [(1, "a b", 99), (2, "c%d", 99), (3, "plain", 10)],
        "doc_id long, src string, score long",
    )
    sinks.write_partitioned(df, keys.by_feature("src"), path, order_col="doc_id")
    stats = sinks.delete_partitioned(spark, path, "score = 99")
    assert stats["deleted_rows"] == 2
    out = spark.read.parquet(os.path.join(path, "data"))
    assert [r["doc_id"] for r in out.collect()] == [3]
    dirs = os.listdir(os.path.join(path, "data"))
    assert not any("a b" in d or "a%20b" in d or "c%d" in d for d in dirs), dirs


def test_delete_null_condition_keeps_rows(spark):
    path = tempfile.mkdtemp(prefix="del_null_")
    df = spark.createDataFrame(
        [(1, "g", 10), (2, "g", None), (3, "g", 99)],
        "doc_id long, src string, score long",
    )
    sinks.write_partitioned(df, keys.by_feature("src"), path, order_col="doc_id")
    stats = sinks.delete_partitioned(spark, path, "score < 50")
    assert stats["deleted_rows"] == 1
    out = sorted(
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(path, "data")).collect()
    )
    assert out == [2, 3]  # NULL-score row KEPT (SQL DELETE semantics)
