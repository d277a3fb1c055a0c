"""Compat codec tests: proto wire format, TFRecord framing, and the
full partition->pack->write->read roundtrip (integration_test.py:26-59
analogue, without any TF dependency)."""

import struct

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.compat import tfexample, tfrecord
from dataset_grouper_spark.operators import packing


def test_crc32c_known_vector():
    # Public CRC32C test vector: '123456789' -> 0xE3069283.
    assert tfrecord.crc32c(b"123456789") == 0xE3069283
    assert tfrecord.crc32c(b"") == 0


def test_varint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1]:
        buf = tfexample._varint(n)
        got, pos = tfexample._read_varint(buf, 0)
        assert got == n and pos == len(buf)


def test_example_roundtrip_types():
    feats = {
        "name": b"doc one",
        "text": "hello world",
        "count": 42,
        "neg": -7,
        "score": 1.5,
        "ints": [1, 2, 3],
        "floats": [0.5, 0.25],
        "blobs": [b"a", b"bb"],
    }
    buf = tfexample.encode_example(feats)
    got = tfexample.decode_example(buf)
    assert got["name"] == [b"doc one"]
    assert got["text"] == [b"hello world"]
    assert got["count"] == [42]
    assert got["neg"] == [-7]
    assert got["score"] == pytest.approx([1.5])
    assert got["ints"] == [1, 2, 3]
    assert got["floats"] == pytest.approx([0.5, 0.25])
    assert got["blobs"] == [b"a", b"bb"]


def test_example_deterministic_bytes():
    a = tfexample.encode_example({"b": 1, "a": b"x"})
    b = tfexample.encode_example({"a": b"x", "b": 1})
    assert a == b  # sorted key order


def test_sequence_example_roundtrip():
    blobs = [tfexample.encode_example({"i": i}) for i in range(5)]
    seq = tfexample.create_sequence_example(blobs)
    assert tfexample.parse_sequence_example(seq) == blobs
    assert tfexample.parse_sequence_example(tfexample.create_sequence_example([])) == []


def test_tfrecord_file_roundtrip(tmp_path):
    path = str(tmp_path / "f.tfrecord")
    recs = [b"alpha", b"", b"x" * 10000]
    assert tfrecord.write_records(path, recs) == 3
    assert list(tfrecord.read_records(path)) == recs


def test_tfrecord_corruption_detected(tmp_path):
    path = str(tmp_path / "f.tfrecord")
    tfrecord.write_records(path, [b"payload"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a data byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(tfrecord.read_records(path))


def test_shard_naming():
    assert (
        tfrecord.shard_name("mnist_test.tfrecord", 0, 1)
        == "mnist_test.tfrecord-00000-of-00001"
    )


def test_grouped_write_read_roundtrip(spark, tmp_path):
    # partition-by-key -> serialize -> pack -> sharded TFRecord write ->
    # read -> parse: the reference's whole storage lifecycle.
    df = spark.createDataFrame(
        [(i, f"client{i % 3}", f"text {i}") for i in range(30)],
        "id: long, client: string, text: string",
    )
    ser = df.select(
        "client",
        "id",
        F.struct("id", "text").alias("payload"),
    )
    # serialize each row to Example bytes via a pandas-free python udf
    # path: use compat encoder on collected structs inside pack
    from pyspark.sql.types import BinaryType
    from pyspark.sql.functions import udf

    enc = udf(
        lambda id_, text: tfexample.encode_example({"id": id_, "text": text}),
        BinaryType(),
    )
    ser = df.withColumn("ex", enc("id", "text"))
    packed = packing.pack_groups(
        ser, keys.by_feature("client"), "id", payload_col="ex",
        size_cols=["id", "text"],
    )
    prefix = str(tmp_path / "out.tfrecord")
    paths = tfrecord.write_grouped_tfrecords(
        packed, "group_id", "packed", prefix, num_shards=2
    )
    assert [p.split("/")[-1] for p in paths] == [
        "out.tfrecord-00000-of-00002",
        "out.tfrecord-00001-of-00002",
    ]
    groups = list(tfrecord.read_grouped_tfrecords(paths))
    assert len(groups) == 3
    all_examples = [tfexample.decode_example(b) for g in groups for b in g]
    assert len(all_examples) == 30
    ids = sorted(e["id"][0] for e in all_examples)
    assert ids == list(range(30))
    texts = {bytes(e["text"][0]).decode() for e in all_examples}
    assert "text 7" in texts


def test_grouped_write_read_file_uri_scheme(spark, tmp_path):
    # same lifecycle but through the pyarrow.fs URI path (file://) —
    # what an object-store prefix (s3://, gs://) exercises on a cluster
    df = spark.createDataFrame(
        [(i, f"client{i % 2}", f"text {i}") for i in range(10)],
        "id: long, client: string, text: string",
    )
    from pyspark.sql.types import BinaryType
    from pyspark.sql.functions import udf

    enc = udf(
        lambda id_, text: tfexample.encode_example({"id": id_, "text": text}),
        BinaryType(),
    )
    ser = df.withColumn("ex", enc("id", "text"))
    packed = packing.pack_groups(
        ser, keys.by_feature("client"), "id", payload_col="ex",
        size_cols=["id", "text"],
    )
    prefix = f"file://{tmp_path}/nested/dir/out.tfrecord"
    paths = tfrecord.write_grouped_tfrecords(
        packed, "group_id", "packed", prefix, num_shards=2
    )
    assert all(p.startswith("file://") for p in paths)
    # distributed read back through the same scheme
    got = tfrecord.read_tfrecord_dataframe(spark, paths)
    assert got.count() == 2  # one SequenceExample per group
    blobs = [b for g in tfrecord.read_grouped_tfrecords(paths) for b in g]
    assert {tfexample.decode_example(b)["id"][0] for b in blobs} == set(range(10))


def test_read_records_truncation_reports_ioerror(tmp_path):
    import pytest as _pytest

    from dataset_grouper_spark.compat import tfrecord

    p = str(tmp_path / "t.tfrecord")
    tfrecord.write_records(p, [b"hello", b"world"]) if hasattr(
        tfrecord, "write_records"
    ) else None
    # build a valid file via the module's own framing helpers
    if not hasattr(tfrecord, "write_records"):
        import struct as _s

        rec = b"payload-bytes"
        header = _s.pack("<Q", len(rec))
        hcrc = tfrecord._mask(tfrecord._crc32c_py(header) ^ 0xFFFFFFFF)
        dcrc = tfrecord._mask(int(tfrecord.crc32c_batch([rec])[0]))
        with open(p, "wb") as f:
            f.write(header + _s.pack("<I", hcrc) + rec + _s.pack("<I", dcrc))
    full = open(p, "rb").read()
    assert list(tfrecord.read_records(p))  # sanity: intact file reads
    for cut in (len(full) - 2, 11, 3):  # mid-crc, mid-data, mid-header
        with open(p, "wb") as f:
            f.write(full[:cut])
        with _pytest.raises(IOError, match="truncated"):
            list(tfrecord.read_records(p))
