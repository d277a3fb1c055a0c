"""The public fixture factory (test_utils.py:25-53 analogue)."""

from dataset_grouper_spark import prepare_test_tfrecord_dataset
from dataset_grouper_spark.compat import tfexample, tfrecord


def test_prepare_test_tfrecord_dataset(spark, tmp_path):
    df, paths = prepare_test_tfrecord_dataset(spark, str(tmp_path), num_rows=7)
    assert df.count() == 7
    assert [p.split("/")[-1] for p in paths] == [
        "test_data.tfrecord-00000-of-00001"
    ]
    groups = list(tfrecord.read_grouped_tfrecords(paths))
    assert len(groups) == 1  # single constant group
    examples = [tfexample.decode_example(b) for b in groups[0]]
    assert sorted(e["id"][0] for e in examples) == list(range(7))