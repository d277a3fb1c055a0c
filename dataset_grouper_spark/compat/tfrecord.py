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


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_records(path: str, records: Iterable[bytes]) -> int:
    """Write one TFRecord file; returns record count."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            header = struct.pack("<Q", len(rec))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(rec)
            f.write(struct.pack("<I", _masked_crc(rec)))
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
    partition writes exactly one shard file via mapPartitionsWithIndex
    — fully parallel, no driver collect.
    """
    from dataset_grouper_spark.compat.tfexample import create_sequence_example

    os.makedirs(os.path.dirname(file_path_prefix) or ".", exist_ok=True)
    target = packed.select(group_col, payload_col).repartition(num_shards)

    def write_shard(idx: int, rows) -> Iterator[str]:
        path = shard_name(file_path_prefix, idx, num_shards, file_name_suffix)
        recs = (
            create_sequence_example([bytes(b) for b in row[1]]) for row in rows
        )
        write_records(path, recs)
        yield path

    return sorted(target.rdd.mapPartitionsWithIndex(write_shard).collect())


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

    k = key or SERIALIZED_BYTES_KEY

    def read_shard(path: str):
        for i, rec in enumerate(read_records(path)):
            yield (path, i, parse_sequence_example(rec, k))

    rdd = spark.sparkContext.parallelize(paths, max(len(paths), 1)).flatMap(
        read_shard
    )
    return spark.createDataFrame(
        rdd, "shard string, record_idx long, payloads array<binary>"
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
