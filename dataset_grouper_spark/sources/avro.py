"""Avro object-container files — pure stdlib codec + distributed read.

The spark-avro module is an external jar this container doesn't ship,
so Avro support here is built from the PUBLIC Avro 1.11 spec instead:
the object container format (magic ``Obj\\x01``, metadata map carrying
``avro.schema`` JSON + ``avro.codec``, sync-marker-delimited blocks)
and the binary encoding (zigzag varints, length-prefixed bytes/strings,
blocked arrays/maps, union indices). Codecs: ``null`` and ``deflate``
(stdlib zlib); schema types: null, boolean, int, long, float, double,
bytes, string, record, enum, fixed, array, map, and unions.

Scale shape: ``read_avro`` lists files on the driver (one header read
for the schema — a metadata touch, not a data path), then fans the
files across tasks with one Arrow-batched ``mapInPandas`` decode per
file — the same shards→tasks layout as the TFRecord reader. The
writer half exists for fixtures/interchange tests, one file per call.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"

_PRIMITIVE_TO_SPARK = {
    "null": "void",
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


# ---------------------------------------------------------------- binary


def _read_varint(buf: io.BytesIO) -> int:
    shift = 0
    out = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("avro: truncated varint")
        v = b[0]
        out |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (out >> 1) ^ -(out & 1)  # zigzag


def _write_varint(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        if v < 0x80:
            out.append(v)
            return
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def _read_value(buf: io.BytesIO, schema):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: varint index then value
        idx = _read_varint(buf)
        if not 0 <= idx < len(schema):
            raise ValueError("avro: bad union index")
        return _read_value(buf, schema[idx])
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise ValueError("avro: truncated boolean")
        return b[0] == 1
    if t in ("int", "long"):
        return _read_varint(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t in ("bytes", "string"):
        n = _read_varint(buf)
        if n < 0:
            raise ValueError("avro: negative length")
        raw = buf.read(n)
        if len(raw) != n:
            raise ValueError("avro: truncated bytes")
        return raw.decode("utf-8") if t == "string" else raw
    if t == "record":
        return {
            f["name"]: _read_value(buf, f["type"]) for f in schema["fields"]
        }
    if t == "enum":
        return schema["symbols"][_read_varint(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                _read_varint(buf)
            for _ in range(n):
                out.append(_read_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_varint(buf)
            for _ in range(n):
                k = _read_value(buf, "string")
                out[k] = _read_value(buf, schema["values"])
    raise ValueError(f"avro: unsupported type {t!r}")


def _union_branch_matches(bt, v) -> bool:
    """Python-type match for a non-null union branch — needed by
    MULTI-branch unions (e.g. HoodieDeleteRecord.orderingVal's
    null|string|int|long|float|double|bytes|boolean): first-non-null
    selection would encode an int under the string branch."""
    if bt == "string":
        return isinstance(v, str)
    if bt in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if bt in ("float", "double"):
        return isinstance(v, float)
    if bt == "boolean":
        return isinstance(v, bool)
    if bt == "bytes":
        return isinstance(v, (bytes, bytearray))
    return True  # records/arrays/maps/enums: structural, first wins


def _write_value(out: bytearray, schema, v) -> None:
    if isinstance(schema, list):  # union: pick the branch by value
        if v is not None:
            for i, branch in enumerate(schema):
                bt = branch if isinstance(branch, str) else branch["type"]
                if bt != "null" and _union_branch_matches(bt, v):
                    _write_varint(out, i)
                    _write_value(out, branch, v)
                    return
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if v is None and bt == "null":
                _write_varint(out, i)
                return
            if v is not None and bt != "null":
                # typed pass found nothing: keep the historical
                # first-non-null fallback (2-branch unions, widened
                # numerics) rather than failing a write that used to
                # succeed
                _write_varint(out, i)
                _write_value(out, branch, v)
                return
        raise ValueError("avro: no union branch for value")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_varint(out, int(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        raw = v.encode("utf-8")
        _write_varint(out, len(raw))
        out += raw
    elif t == "bytes":
        _write_varint(out, len(v))
        out += bytes(v)
    elif t == "record":
        for f in schema["fields"]:
            _write_value(out, f["type"], v[f["name"]])
    elif t == "enum":
        _write_varint(out, schema["symbols"].index(v))
    elif t == "fixed":
        out += bytes(v)
    elif t == "array":
        if v:
            _write_varint(out, len(v))
            for item in v:
                _write_value(out, schema["items"], item)
        _write_varint(out, 0)
    elif t == "map":
        if v:
            _write_varint(out, len(v))
            for k, item in v.items():
                _write_value(out, "string", k)
                _write_value(out, schema["values"], item)
        _write_varint(out, 0)
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


# ------------------------------------------------------------- container


def read_avro_file(path: str):
    """Decode one container file -> (schema_dict, list of records).
    Routed through compat.fs: manifests on object stores resolve."""
    from dataset_grouper_spark.compat import fs as _fs

    data = _fs.read_bytes(path)
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro object container: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _read_value(buf, meta_schema)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro codec {codec!r} not supported (null/deflate only)"
        )
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_varint(buf)
        size = _read_varint(buf)
        block = buf.read(size)
        if len(block) != size:
            raise ValueError(f"avro: truncated block in {path}")
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        bb = io.BytesIO(block)
        for _ in range(n):
            records.append(_read_value(bb, schema))
        if buf.read(16) != sync:
            raise ValueError(f"avro: sync marker mismatch in {path}")
    return schema, records


def write_avro_file(
    path: str,
    schema: dict,
    records,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
) -> int:
    """Write one container file; returns record count. Deterministic
    bytes for a fixed ``sync`` marker (fixtures stay diffable)."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be 'null' or 'deflate'")
    body = bytearray()
    n = 0
    for rec in records:
        _write_value(body, schema, rec)
        n += 1
    block = bytes(body)
    if codec == "deflate":
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = c.compress(block) + c.flush()
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _write_value(out, {"type": "map", "values": "bytes"}, meta)
    out += sync
    _write_varint(out, n)
    _write_varint(out, len(block))
    out += block
    out += sync
    from dataset_grouper_spark.compat import fs as _fs

    _fs.write_bytes(path, bytes(out))
    return n


# ------------------------------------------------------------- DataFrame


def _spark_type_of(schema) -> str:
    """Avro schema -> Spark DDL type for the common shapes (primitives,
    [null, T] unions, arrays of primitives). Everything else raises —
    better than silently stringifying."""
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("avro: only [null, T] unions map to Spark")
        return _spark_type_of(non_null[0])
    if isinstance(schema, str):
        ddl = _PRIMITIVE_TO_SPARK.get(schema)
        if ddl in (None, "void"):
            raise ValueError(f"avro: cannot map {schema!r} to Spark")
        return ddl
    t = schema["type"]
    if t in _PRIMITIVE_TO_SPARK:
        return _spark_type_of(t)
    if t == "array":
        return f"array<{_spark_type_of(schema['items'])}>"
    if t == "enum":
        return "string"
    if t == "fixed":
        return "binary"
    raise ValueError(f"avro: cannot map {t!r} to Spark")


def read_avro(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed Avro read: the first file's header supplies the
    schema (driver metadata touch), then files fan across tasks with
    one Arrow-batched decode each — shards→tasks, like the TFRecord
    reader. Top-level schema must be a record."""
    import pandas as pd

    if not paths:
        raise ValueError("read_avro: empty path list")
    schema, _head = _read_header_only(paths[0])
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("read_avro: top-level schema must be a record")
    fields = schema["fields"]
    ddl = ", ".join(
        f"`{f['name']}` {_spark_type_of(f['type'])}" for f in fields
    )
    names = [f["name"] for f in fields]
    shards = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths], len(paths)),
        "shard string",
    )

    def decode(pdf_iter):
        for pdf in pdf_iter:
            for path in pdf["shard"]:
                _schema, recs = read_avro_file(path)
                yield pd.DataFrame(
                    {nm: [r.get(nm) for r in recs] for nm in names},
                    columns=names,
                )

    return shards.mapInPandas(decode, ddl)


def _read_header_only(path: str):
    """(schema, codec) from a container header without reading blocks."""
    from dataset_grouper_spark.compat import fs as _fs

    with _fs.open_read(path) as f:
        head = f.read(1 << 20)  # schema JSON lives in the first MB
    buf = io.BytesIO(head)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro object container: {path}")
    meta = _read_value(buf, {"type": "map", "values": "bytes"})
    return json.loads(meta["avro.schema"].decode()), meta.get(
        "avro.codec", b"null"
    ).decode()
