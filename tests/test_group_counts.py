"""Group-counts pipeline tests (beam_transforms_test.py:177-226
analogues) + CSV sink with header."""

import glob

from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.operators import group_counts as gc


def test_constant_key_counts(spark):
    # beam_transforms_test.py:179-192: 'foo','bar bar','baz baz baz'
    # under one group => group,3,21,6
    df = spark.createDataFrame([("foo",), ("bar bar",), ("baz baz baz",)], "text: string")
    out = gc.compute_group_counts(df, keys.constant("group"))
    lines = gc.format_group_counts(out, ",").collect()
    assert [r.line for r in lines] == ["group,3,21,6"]


def test_keyed_counts(spark):
    # beam_transforms_test.py:211-226 golden: 1,2,12,5 / 2,2,28,9
    df = spark.createDataFrame(
        [("1", "foo"), ("1", "bar bar"), ("2", "baz baz baz"), ("2", "bat bat bat bat")],
        "a: string, b: string",
    )
    out = gc.compute_group_counts(df, keys.by_feature("a"))
    lines = sorted(r.line for r in gc.format_group_counts(out, ",").collect())
    assert lines == ["1,2,12,5", "2,2,28,9"]


def test_custom_delimiter(spark):
    df = spark.createDataFrame([("k", "one two")], "a: string, b: string")
    out = gc.compute_group_counts(df, keys.by_feature("a"))
    lines = gc.format_group_counts(out, "+").collect()
    assert lines[0].line == "k+1+8+3"


def test_csv_sink_with_header(spark, tmp_path):
    df = spark.createDataFrame([("k", "one two")], "a: string, b: string")
    out = gc.compute_group_counts(df, keys.by_feature("a"))
    path = str(tmp_path / "counts")
    gc.write_group_counts_csv(out, path, num_shards=1)
    files = glob.glob(f"{path}/part-*.csv")
    assert len(files) == 1
    content = open(files[0]).read().strip().split("\n")
    assert content[0] == "group_id,num_examples,num_bytes,num_words"
    assert content[1] == "k,1,8,3"
