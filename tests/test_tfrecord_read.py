"""Native distributed TFRecord read path: shards -> packed groups ->
typed rows (the reference's full load pipeline, no connector)."""

from pyspark.sql import functions as F
from pyspark.sql.functions import udf
from pyspark.sql.types import BinaryType

from dataset_grouper_spark import keys
from dataset_grouper_spark.compat import tfexample, tfrecord
from dataset_grouper_spark.operators import packing


def test_read_tfrecord_dataframe_and_decode(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"g{i % 4}", f"payload number {i}") for i in range(40)],
        "id: long, grp: string, text: string",
    )
    enc = udf(
        lambda i, t: tfexample.encode_example({"id": i, "text": t}), BinaryType()
    )
    ser = df.withColumn("ex", enc("id", "text"))
    packed = packing.pack_groups(
        ser, keys.by_feature("grp"), "id", payload_col="ex",
        size_cols=["id", "text"],
    )
    prefix = str(tmp_path / "s.tfrecord")
    paths = tfrecord.write_grouped_tfrecords(
        packed, "group_id", "packed", prefix, num_shards=3
    )

    groups = tfrecord.read_tfrecord_dataframe(spark, paths)
    assert groups.count() == 4  # one record per group
    assert groups.select(F.sum(F.size("payloads"))).collect()[0][0] == 40

    rows = tfrecord.decode_examples_dataframe(groups, "id long, text string")
    got = {r.id: r.text for r in rows.collect()}
    assert len(got) == 40
    assert got[7] == "payload number 7"
