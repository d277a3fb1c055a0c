"""Reference-API façade tests — mirror of the reference's
integration_test.py:26-59 (one-group pipeline -> exact shard naming ->
load -> schema equality) plus signature-parity behaviors (num_shards=0
auto, group-counts header line, schema-mismatch raises)."""

import os

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import keys, pipelines
from dataset_grouper_spark.compat import tfexample, tfrecord


def source_df(spark, n=10):
    return spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(n)], "id: long, text: string"
    )


def test_pipeline_runs_and_data_loads(spark, tmp_path):
    # integration_test.py:26-59: constant key -> single group, one
    # shard named prefix-00000-of-00001, loadable, schema-equal
    df = source_df(spark)
    save_dir = tmp_path / "save"
    prefix = str(save_dir / "mnist_test.tfrecord")
    paths = pipelines.tfds_to_tfrecords(
        df, prefix, keys.constant("test_client"), num_shards=1
    )
    assert sorted(os.listdir(save_dir)) == ["mnist_test.tfrecord-00000-of-00001"]
    back = tfrecord.read_tfrecord_dataframe(spark, paths)
    assert back.count() == 1  # one group -> one SequenceExample record
    decoded = tfrecord.decode_examples_dataframe(back, "id long, text string")
    assert [f.name for f in decoded.schema.fields] == ["id", "text"]
    assert [f.dataType for f in decoded.schema.fields] == [
        f.dataType for f in df.schema.fields
    ]
    got = {(r.id, r.text) for r in decoded.collect()}
    assert got == {(i, f"doc number {i}") for i in range(10)}


def test_tfrecords_auto_shards_capped_by_groups(spark, tmp_path):
    # num_shards=0 (the default) must auto-shard without emitting
    # guaranteed-empty shards: 3 groups -> at most 3 files
    df = source_df(spark, 9).withColumn("g", F.pmod(F.col("id"), F.lit(3)))
    prefix = str(tmp_path / "auto" / "out.tfrecord")
    paths = pipelines.tfds_to_tfrecords(df, prefix, keys.by_feature("g"))
    assert 1 <= len(paths) <= 3
    names = sorted(os.path.basename(p) for p in paths)
    assert names[0].startswith("out.tfrecord-00000-of-")
    total = sum(1 for p in paths for _ in tfrecord.read_records(p))
    assert total == 3  # every group written exactly once


def test_group_counts_writes_header_and_lines(spark, tmp_path):
    out = str(tmp_path / "counts")
    df = source_df(spark, 8).withColumn("g", F.pmod(F.col("id"), F.lit(2)))
    pipelines.tfds_group_counts(df, out, keys.by_feature("g"), num_shards=1)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    lines = open(os.path.join(out, parts[0])).read().strip().split("\n")
    # header parity: tfds_pipelines.py:126
    assert lines[0] == "group_id,num_examples,num_bytes,num_words"
    assert len(lines) == 3  # 2 groups
    by_group = {l.split(",")[0]: l.split(",") for l in lines[1:]}
    assert by_group["0"][1] == "4" and by_group["1"][1] == "4"


def test_serialize_schema_mismatch_raises():
    # serialization.py:40-48 / serialization_test.py:33-43 parity
    feats = {"id": 1, "text": "x"}
    ok = tfexample.encode_example_checked(feats, frozenset({"id", "text"}))
    assert ok == tfexample.encode_example(feats)
    with pytest.raises(KeyError, match="mismatch between the provided"):
        tfexample.encode_example_checked(feats, frozenset({"id"}))
    with pytest.raises(KeyError, match="mismatch between the provided"):
        tfexample.encode_example_checked(feats, frozenset({"id", "text", "z"}))
