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


def test_gzip_records_roundtrip_and_determinism(tmp_path):
    import gzip
    import os

    from dataset_grouper_spark.compat import tfrecord as T

    recs = [b"alpha", b"b" * 5000, b""]
    p = os.path.join(str(tmp_path), "a.tfrecord.gz")
    assert T.write_records(p, recs) == 3
    with open(p, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # real gzip member
    assert list(T.read_records(p)) == recs
    # deterministic bytes: mtime=0, no embedded filename
    p2 = os.path.join(str(tmp_path), "b.tfrecord.gz")
    T.write_records(p2, recs)
    with open(p, "rb") as f1, open(p2, "rb") as f2:
        assert f1.read() == f2.read()
    # gzip stream is the SAME crc-framed record stream TF expects
    with open(p, "rb") as f:
        inner = gzip.decompress(f.read())
    p3 = os.path.join(str(tmp_path), "plain.tfrecord")
    T.write_records(p3, recs)
    with open(p3, "rb") as f:
        assert inner == f.read()


def test_gzip_compression_overrides(tmp_path):
    import os

    import pytest

    from dataset_grouper_spark.compat import tfrecord as T

    recs = [b"x", b"y"]
    p = os.path.join(str(tmp_path), "noext.bin")
    T.write_records(p, recs, compression="gzip")
    assert list(T.read_records(p, compression="gzip")) == recs
    p2 = os.path.join(str(tmp_path), "suffixed.gz")
    T.write_records(p2, recs, compression="none")  # suffix overridden
    with open(p2, "rb") as f:
        assert f.read(2) != b"\x1f\x8b"
    assert list(T.read_records(p2, compression="none")) == recs
    with pytest.raises(ValueError):
        T.write_records(p, recs, compression="zstd")


def test_grouped_gzip_shards(spark, tmp_path):
    import os

    from dataset_grouper_spark.compat import tfexample
    from dataset_grouper_spark.compat import tfrecord as T
    from dataset_grouper_spark import keys
    from dataset_grouper_spark.operators import packing
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", f"t{i}") for i in range(30)],
        "id long, g string, text string",
    )
    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    enc = pandas_udf(
        lambda ids, txts: pd.Series(
            [
                tfexample.encode_example({"id": int(i), "text": t})
                for i, t in zip(ids, txts)
            ],
            dtype=object,
        ),
        "binary",
    )
    packed = packing.pack_groups(
        df.withColumn("ex", enc("id", "text")),
        keys.by_feature("g"), "id", payload_col="ex",
        size_cols=["id", "text"], num_partitions=2,
    )
    prefix = os.path.join(str(tmp_path), "sh.tfrecord")
    paths = T.write_grouped_tfrecords(
        packed, "group_id", "packed", prefix, num_shards=2,
        file_name_suffix=".gz",
    )
    assert all(p.endswith(".gz") for p in paths)
    for p in paths:
        with open(p, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"
    back = T.read_tfrecord_dataframe(spark, paths)
    sizes = sorted(
        r[0] for r in back.select(F.size("payloads")).collect()
    )
    assert sizes == [10, 10, 10]


def test_invalid_compression_rejected_before_open(tmp_path):
    import os

    import pytest

    from dataset_grouper_spark.compat import tfrecord as T

    p = os.path.join(str(tmp_path), "never.tfrecord")
    with pytest.raises(ValueError, match="unknown compression"):
        T.write_records(p, [b"x"], compression="zstd")
    # validation fires BEFORE the stream opens: no orphan file created
    assert not os.path.exists(p)
