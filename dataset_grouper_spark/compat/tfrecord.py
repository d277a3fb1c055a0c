"""TFRecord file framing — pure Python, no TF dependency.

Public on-disk format (tensorflow/core/lib/io/record_writer.h):

    uint64 length (LE) | uint32 masked_crc32c(length) |
    data[length]       | uint32 masked_crc32c(data)

CRC32C is the Castagnoli CRC (reflected poly 0x82F63B78); the mask is
((crc >> 15) | (crc << 17)) + 0xa282ead8 mod 2^32. This gives
byte-compatible shards with the reference's WriteToTFRecord output
(tfds_pipelines.py:67-76), shard-named ``prefix-SSSSS-of-NNNNN[suffix]``.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterable, Iterator

from pyspark.sql import Column, DataFrame

_CRC_TABLE: list[int] = []


def _build_table() -> None:
    poly = 0x82F63B78
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        _CRC_TABLE.append(crc)


_build_table()


def _crc32c_py(data: bytes, state: int = 0xFFFFFFFF) -> int:
    """Raw byte-at-a-time register update (no final xor)."""
    crc = state
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc


# ---- numpy-vectorized CRC for large buffers --------------------------
# The CRC register update for a zero byte, s' = (s >> 8) ^ T[s & 0xFF],
# is linear over GF(2), so "advance by n zero bytes" is a 32x32 bit
# matrix Z^n (stored as 32 uint32 columns) and
#   raw(s, A || B) = Z^{|B|}(raw(s, A)) ^ raw(0, B).
# A large buffer is split into K equal chunks whose raw CRCs are
# computed in lockstep (one numpy table-lookup step per chunk byte,
# vectorized K-wide), then tree-combined with precomputed Z operators —
# the same combine algebra as zlib's crc32_combine, for the Castagnoli
# polynomial. ~10x over the pure-Python loop on MB-scale records.

import numpy as np

_TABLE_NP = np.array(_CRC_TABLE, dtype=np.uint32)
_J32 = np.arange(32, dtype=np.uint32)


def _apply_op(op: np.ndarray, s: int) -> int:
    r = 0
    j = 0
    while s:
        if s & 1:
            r ^= int(op[j])
        s >>= 1
        j += 1
    return r


def _square_op(op: np.ndarray) -> np.ndarray:
    return np.array([_apply_op(op, int(op[j])) for j in range(32)], dtype=np.uint32)


def _z1_op() -> np.ndarray:
    cols = []
    for j in range(32):
        s = 1 << j
        cols.append(_CRC_TABLE[s & 0xFF] ^ (s >> 8))
    return np.array(cols, dtype=np.uint32)


_OP_CACHE: dict[int, np.ndarray] = {}


def _zero_advance_op(n_bytes: int) -> np.ndarray:
    """Z^n operator (advance register by n zero bytes), cached."""
    if n_bytes in _OP_CACHE:
        return _OP_CACHE[n_bytes]
    op = None
    sq = _OP_CACHE.get(1)
    if sq is None:
        sq = _z1_op()
        _OP_CACHE[1] = sq
    n = n_bytes
    while n:
        if n & 1:
            op = sq if op is None else np.array(
                [_apply_op(sq, int(op[j])) for j in range(32)], dtype=np.uint32
            )
        n >>= 1
        if n:
            sq = _square_op(sq)
    if op is None:
        op = np.array([1 << j for j in range(32)], dtype=np.uint32)
    _OP_CACHE[n_bytes] = op
    return op


def _apply_op_vec(op: np.ndarray, states: np.ndarray) -> np.ndarray:
    bits = ((states[:, None] >> _J32[None, :]) & 1).astype(bool)
    return np.bitwise_xor.reduce(
        np.where(bits, op[None, :], np.uint32(0)), axis=1
    )


def crc32c(data: bytes) -> int:
    n = len(data)
    if n < 2048:
        return _crc32c_py(data) ^ 0xFFFFFFFF
    # K power-of-two chunks of m bytes + tail
    K = 1 << min(12, max(0, (n // 64).bit_length() - 1))
    m = n // K
    cols = np.ascontiguousarray(
        np.frombuffer(data, dtype=np.uint8, count=K * m).reshape(K, m).T
    )
    states = np.zeros(K, dtype=np.uint32)
    T = _TABLE_NP
    for i in range(m):
        states = T[(states ^ cols[i]) & 0xFF] ^ (states >> 8)
    # tree-combine: level l merges pairs 2^l*m bytes apart
    op = _zero_advance_op(m)
    while len(states) > 1:
        states = _apply_op_vec(op, states[0::2]) ^ states[1::2]
        if len(states) > 1:
            op = _square_op(op)
    r = int(states[0])  # raw(0, body)
    tail = data[K * m:]
    if tail:
        r = _crc32c_py(tail, r)  # raw(r, tail) = Z^|tail|(r) ^ raw(0, tail)
    # raw(~0, data) = Z^n(~0) ^ raw(0, data)
    s = _apply_op(_zero_advance_op(n), 0xFFFFFFFF) ^ r
    return s ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _write_record(f, rec: bytes) -> None:
    header = struct.pack("<Q", len(rec))
    f.write(header)
    f.write(struct.pack("<I", _masked_crc(header)))
    f.write(rec)
    f.write(struct.pack("<I", _masked_crc(rec)))


def write_records(path: str, records: Iterable[bytes]) -> int:
    """Write one TFRecord file; returns record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            _write_record(f, rec)
            n += 1
    return n


def read_records(path: str, verify: bool = True) -> Iterator[bytes]:
    """Iterate records from one TFRecord file, checking CRCs."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                return
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            if verify:
                if _masked_crc(header) != hcrc:
                    raise IOError(f"corrupt length crc in {path}")
                if _masked_crc(data) != dcrc:
                    raise IOError(f"corrupt data crc in {path}")
            yield data


def shard_name(prefix: str, shard: int, num_shards: int, suffix: str = "") -> str:
    """The reference's shard naming: prefix-SSSSS-of-NNNNN[suffix]
    (verified by integration_test.py:46: mnist_test.tfrecord-00000-of-00001)."""
    return f"{prefix}-{shard:05d}-of-{num_shards:05d}{suffix}"


def write_grouped_tfrecords(
    packed: DataFrame,
    group_col: str,
    payload_col: str,
    file_path_prefix: str,
    num_shards: int = 1,
    file_name_suffix: str = "",
) -> list[str]:
    """Distributed sharded write of packed groups as SequenceExamples —
    the tfds_to_tfrecords sink (tfds_pipelines.py:25-78).

    ``packed`` must have one row per group with ``payload_col`` =
    array of serialized example blobs (e.g. from
    operators.packing.pack_groups with a binary payload). Each
    partition writes exactly one shard file via an Arrow-batched
    mapInPandas (no row pickling) — fully parallel, no driver collect
    of data.

    Filesystem note: shards are written with plain ``open()`` on the
    executors, so ``file_path_prefix`` must live on a filesystem shared
    by all executors and the driver (local mode, NFS, or a FUSE-mounted
    object store). On a multi-node cluster without shared POSIX storage
    route the payloads through a Hadoop-FS-backed sink instead
    (``sinks.write_partitioned``).
    """
    import pandas as pd

    from dataset_grouper_spark.compat.tfexample import create_sequence_example

    os.makedirs(os.path.dirname(file_path_prefix) or ".", exist_ok=True)
    target = packed.select(group_col, payload_col).repartition(num_shards)

    def write_shard(pdf_iter):
        from pyspark import TaskContext

        idx = TaskContext.get().partitionId()
        path = shard_name(file_path_prefix, idx, num_shards, file_name_suffix)
        with open(path, "wb") as f:
            for pdf in pdf_iter:
                for payloads in pdf[payload_col]:
                    _write_record(
                        f, create_sequence_example([bytes(b) for b in payloads])
                    )
        yield pd.DataFrame({"path": [path]})

    out = target.mapInPandas(write_shard, "path string").collect()
    return sorted(r.path for r in out)


def read_tfrecord_dataframe(
    spark,
    paths: list[str],
    key: str | None = None,
) -> DataFrame:
    """Distributed read of TFRecord shards into a DataFrame of packed
    groups: one row per SequenceExample record, (shard string, record_idx
    long, payloads array<binary>). The native replacement for the
    spark-tensorflow connector — shards are parallelized across tasks,
    each task streams its file (data_loaders.py:116-122's parallel
    interleaved read, as Spark task parallelism)."""
    from dataset_grouper_spark.compat.tfexample import (
        SERIALIZED_BYTES_KEY,
        parse_sequence_example,
    )

    import pandas as pd

    k = key or SERIALIZED_BYTES_KEY
    shards = spark.createDataFrame(
        [(p,) for p in paths], "shard string"
    ).repartition(max(len(paths), 1))

    def read_shards(pdf_iter):
        for pdf in pdf_iter:
            for path in pdf["shard"]:
                rows = [
                    (path, i, parse_sequence_example(rec, k))
                    for i, rec in enumerate(read_records(path))
                ]
                yield pd.DataFrame(
                    rows, columns=["shard", "record_idx", "payloads"]
                )

    return shards.mapInPandas(
        read_shards, "shard string, record_idx long, payloads array<binary>"
    )


def decode_examples_dataframe(packed: DataFrame, schema: str) -> DataFrame:
    """Explode packed groups and decode each Example blob into typed
    columns (the features_dict.deserialize_example step,
    data_loaders.py:110-113). ``schema`` names the output columns, e.g.
    ``"id long, text string"``; scalar features are unwrapped from
    their single-element lists."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    out_schema = _parse_datatype_string(schema)

    from dataset_grouper_spark.compat.tfexample import decode_example

    def decode_rows(pdf_iter):
        import pandas as pd

        for pdf in pdf_iter:
            rows = []
            for blobs in pdf["payloads"]:
                for blob in blobs:
                    feats = decode_example(bytes(blob))
                    row = {}
                    for f in out_schema.fields:
                        vals = feats.get(f.name, [])
                        v = vals[0] if len(vals) == 1 else vals
                        if isinstance(v, (bytes, bytearray)) and (
                            f.dataType.typeName() == "string"
                        ):
                            v = bytes(v).decode()
                        row[f.name] = v
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return packed.select("payloads").mapInPandas(decode_rows, schema=out_schema)


def read_grouped_tfrecords(pattern_paths: list[str]) -> Iterator[list[bytes]]:
    """Read back shard files, yielding each group's packed example
    blobs (the load path, data_loaders.py:102-114)."""
    from dataset_grouper_spark.compat.tfexample import parse_sequence_example

    for path in pattern_paths:
        for rec in read_records(path):
            yield parse_sequence_example(rec)
