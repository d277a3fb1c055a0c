"""Schema evolution on the partitioned layout: appends may ADD columns;
readers see the union schema with NULL backfill (mergeSchema)."""

import os
import tempfile

import pytest

from dataset_grouper_spark import keys, sinks


@pytest.fixture()
def dataset(spark):
    path = tempfile.mkdtemp(prefix="evo_")
    v1 = spark.createDataFrame(
        [(1, "a", "one"), (2, "b", "two")],
        "doc_id long, src string, text string",
    )
    sinks.write_partitioned(v1, keys.by_feature("src"), path, order_col="doc_id")
    return path


def test_append_with_new_column_merges(spark, dataset):
    v2 = spark.createDataFrame(
        [(3, "a", "three", "en")],
        "doc_id long, src string, text string, lang string",
    )
    sinks.append_partitioned(v2, keys.by_feature("src"), dataset, "doc_id")
    back = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(dataset, "data"))
    )
    assert set(back.columns) >= {"doc_id", "text", "lang", keys.GROUP_COL}
    rows = {r["doc_id"]: r for r in back.collect()}
    assert rows[3]["lang"] == "en"
    assert rows[1]["lang"] is None  # old files backfill NULL
    assert len(rows) == 3


def test_index_rebuild_covers_both_schemas(spark, dataset):
    v2 = spark.createDataFrame(
        [(3, "a", "three", "en")],
        "doc_id long, src string, text string, lang string",
    )
    sinks.append_partitioned(v2, keys.by_feature("src"), dataset, "doc_id")
    idx = {
        r[keys.GROUP_COL]: r["num_examples"]
        for r in spark.read.parquet(
            os.path.join(dataset, sinks.GROUP_INDEX_DIR)
        ).collect()
    }
    assert idx == {"a": 2, "b": 1}
