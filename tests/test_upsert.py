"""upsert_partitioned: MERGE semantics with group-directory rewrite
granularity — untouched groups' files must not even be touched."""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import keys, sinks


def _files_with_mtimes(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f)
    }


@pytest.fixture()
def dataset(spark):
    path = tempfile.mkdtemp(prefix="ups_")
    df = spark.createDataFrame(
        [
            (1, "a", "one"),
            (2, "a", "two"),
            (3, "b", "three"),
            (4, "c", "four"),
            (5, "c", "five"),
        ],
        "doc_id long, src string, text string",
    )
    sinks.write_partitioned(df, keys.by_feature("src"), path, order_col="doc_id")
    return path


def test_upsert_replaces_inserts_and_leaves_others_alone(spark, dataset):
    c_dir = os.path.join(dataset, "data", f"{keys.GROUP_COL}=c")
    before = _files_with_mtimes(c_dir)
    assert before, "fixture group dir missing"

    new = spark.createDataFrame(
        [(2, "a", "TWO-v2"), (9, "b", "nine")],
        "doc_id long, src string, text string",
    )
    stats = sinks.upsert_partitioned(
        spark, new, keys.by_feature("src"), dataset, "doc_id", "doc_id"
    )
    assert stats == {"upserted_rows": 2, "groups_rewritten": 2}

    out = spark.read.parquet(os.path.join(dataset, "data"))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[2]["text"] == "TWO-v2"
    assert rows[9]["text"] == "nine"
    assert rows[1]["text"] == "one"  # same-group sibling survived
    # group c: same files, same mtimes — not rewritten, not reopened
    assert _files_with_mtimes(c_dir) == before
    # sidecar index rebuilt
    idx = {
        r[keys.GROUP_COL]: r["num_examples"]
        for r in spark.read.parquet(
            os.path.join(dataset, sinks.GROUP_INDEX_DIR)
        ).collect()
    }
    assert idx == {"a": 2, "b": 2, "c": 2}


def test_upsert_last_wins_on_duplicate_ids(spark, dataset):
    # df_new carries two versions of doc 3; order_col picks the highest
    new = spark.createDataFrame(
        [(3, "b", "v1", 1), (3, "b", "v2", 2)],
        "doc_id long, src string, text string, ver long",
    )
    sinks.upsert_partitioned(
        spark, new, keys.by_feature("src"), dataset, "doc_id", "ver"
    )
    out = spark.read.parquet(os.path.join(dataset, "data"))
    got = out.filter("doc_id = 3").collect()
    assert len(got) == 1
    assert got[0]["text"] == "v2"


def test_upsert_new_group_directory(spark, dataset):
    new = spark.createDataFrame(
        [(10, "d", "ten")], "doc_id long, src string, text string"
    )
    stats = sinks.upsert_partitioned(
        spark, new, keys.by_feature("src"), dataset, "doc_id", "doc_id"
    )
    assert stats["groups_rewritten"] == 1
    out = spark.read.parquet(os.path.join(dataset, "data"))
    assert out.filter(f"{keys.GROUP_COL} = 'd'").count() == 1
    assert out.count() == 6
