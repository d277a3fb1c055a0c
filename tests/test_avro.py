"""Avro object-container codec + distributed read. Spec vectors pin
the binary encoding independently of the roundtrip."""

import os

import pytest

from dataset_grouper_spark.sources import avro as A

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}

RECS = [
    {"id": 1, "text": "hello", "score": 1.5, "tags": ["a", "b"]},
    {"id": -12345678901, "text": None, "score": -0.25, "tags": []},
    {"id": 0, "text": "x" * 500, "score": 3.0, "tags": ["z"]},
]


def test_zigzag_spec_vectors():
    # Avro spec §Binary Encoding: 0->00, -1->01, 1->02, -2->03, 2->04,
    # -64->7f, 64->80 01
    import io

    for v, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                   (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                   (64, b"\x80\x01")]:
        out = bytearray()
        A._write_varint(out, v)
        assert bytes(out) == enc, v
        assert A._read_varint(io.BytesIO(enc)) == v


def test_string_spec_vector():
    # spec example: "foo" encodes as 06 66 6f 6f
    out = bytearray()
    A._write_value(out, "string", "foo")
    assert bytes(out) == b"\x06foo"


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = os.path.join(str(tmp_path), "t.avro")
    assert A.write_avro_file(p, SCHEMA, RECS, codec=codec) == 3
    schema, back = A.read_avro_file(p)
    assert schema == SCHEMA and back == RECS


def test_enum_fixed_map_roundtrip(tmp_path):
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "e", "type": {"type": "enum", "name": "col",
                                   "symbols": ["RED", "BLUE"]}},
            {"name": "f", "type": {"type": "fixed", "name": "fx",
                                   "size": 4}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
    recs = [{"e": "BLUE", "f": b"\x01\x02\x03\x04", "m": {"a": 1, "b": -2}}]
    p = os.path.join(str(tmp_path), "e.avro")
    A.write_avro_file(p, schema, recs)
    _s, back = A.read_avro_file(p)
    assert back == recs


def test_corruption_detected(tmp_path):
    p = os.path.join(str(tmp_path), "t.avro")
    A.write_avro_file(p, SCHEMA, RECS)
    raw = bytearray(open(p, "rb").read())
    raw[-1] ^= 0xFF  # clobber the trailing sync marker
    p2 = os.path.join(str(tmp_path), "bad.avro")
    open(p2, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync marker"):
        A.read_avro_file(p2)
    with pytest.raises(ValueError, match="not an Avro"):
        A.read_avro_file(__file__)


def test_read_avro_distributed(spark, tmp_path):
    p1 = os.path.join(str(tmp_path), "a.avro")
    p2 = os.path.join(str(tmp_path), "b.avro")
    A.write_avro_file(p1, SCHEMA, RECS[:2])
    A.write_avro_file(p2, SCHEMA, RECS[2:])
    df = A.read_avro(spark, [p1, p2])
    assert df.schema.simpleString() == (
        "struct<id:bigint,text:string,score:double,tags:array<string>>"
    )
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [-12345678901, 0, 1]
    assert rows[1]["tags"] == ["z"]
    assert rows[0]["text"] is None


def test_unsupported_codec_gated(tmp_path):
    p = os.path.join(str(tmp_path), "t.avro")
    with pytest.raises(ValueError):
        A.write_avro_file(p, SCHEMA, RECS, codec="snappy")


def test_union_branch_selection_is_typed():
    """Multi-branch unions (HoodieDeleteRecord.orderingVal) must
    encode under the branch matching the VALUE's type — first-non-null
    selection wrote ints under the string branch and crashed."""
    import io

    from dataset_grouper_spark.sources.avro import _read_value, _write_value

    union = [
        "null", "string", "int", "long", "float", "double",
        "bytes", "boolean",
    ]
    for v in (None, "s", 7, 7_000_000_000, 2.5, b"\x01\x02", True):
        out = bytearray()
        _write_value(out, union, v)
        got = _read_value(io.BytesIO(bytes(out)), union)
        if isinstance(v, bytes):
            assert bytes(got) == v
        else:
            assert got == v and type(got) is type(v) or (
                isinstance(v, int) and isinstance(got, int)
            )
