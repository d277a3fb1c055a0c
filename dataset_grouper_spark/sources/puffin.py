"""Puffin files + Iceberg v3 deletion-vector blobs, from the spec.

Puffin (the published Apache Iceberg sidecar format,
iceberg.apache.org/puffin-spec) is the container Iceberg v3 stores
deletion vectors in: ``Magic "PFA1" | blob bytes... | footer``, where
the footer is ``Magic | FileMetadata JSON | payload size (int32 LE) |
flags (4 bytes) | Magic``. FileMetadata lists each blob's type,
offset, length and properties; for DV blobs the manifest entry ALSO
carries the (offset, length) pair (``content_offset`` /
``content_size_in_bytes``), so readers can fetch a vector with one
ranged read and never parse the footer — which is exactly what the
scan path here does.

The ``deletion-vector-v1`` blob layout (Iceberg v3 spec, "Deletion
vectors"): a 4-byte big-endian length of the magic+vector that
follow, the 4-byte magic sequence ``D1 D3 39 64``, the vector as a
64-bit RoaringBitmap "portable" serialization (the same portable
codec sources/roaring.py already implements for Delta DVs — the two
protocols converged on the bitmap, they differ only in framing), and
a big-endian CRC-32 of the magic+vector.

Everything is stdlib bytes — no Iceberg runtime jar, same as the rest
of the lakehouse layer.
"""

from __future__ import annotations

import json
import struct
import zlib

from dataset_grouper_spark.compat import fs as _fs
from dataset_grouper_spark.sources.roaring import (
    roaring64_deserialize,
    roaring64_serialize,
)

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DV_BLOB_TYPE = "deletion-vector-v1"


# ------------------------------------------------------------- DV blob


def dv_blob_encode(positions) -> bytes:
    """One ``deletion-vector-v1`` blob: BE length, magic, portable
    64-bit roaring bitmap, BE CRC-32 of magic+vector."""
    vector = roaring64_serialize(positions)
    body = DV_MAGIC + vector
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body))
    )


def dv_blob_decode(blob: bytes) -> list[int]:
    """Decode + verify one DV blob (framing, magic, CRC)."""
    (length,) = struct.unpack_from(">i", blob, 0)
    body = blob[4 : 4 + length]
    if len(body) != length:
        raise ValueError("puffin DV: truncated blob")
    if body[:4] != DV_MAGIC:
        raise ValueError(
            f"puffin DV: bad magic {body[:4].hex()} (want "
            f"{DV_MAGIC.hex()})"
        )
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if crc != zlib.crc32(body):
        raise ValueError("puffin DV: CRC-32 mismatch")
    return roaring64_deserialize(body, 4)


# ---------------------------------------------------------- the file


def write_puffin(
    path: str,
    blobs: list[tuple[str, bytes, dict]],
    properties: dict | None = None,
) -> list[tuple[int, int]]:
    """Write a Puffin file of ``(blob_type, blob_bytes, blob_props)``
    entries; returns each blob's ``(offset, length)`` — the pair the
    Iceberg manifest entry's ``content_offset`` /
    ``content_size_in_bytes`` must carry verbatim (spec: the two
    records agree). Uncompressed footer payload (flags=0)."""
    out = bytearray(MAGIC)
    spans: list[tuple[int, int]] = []
    metas = []
    for blob_type, data, props in blobs:
        off = len(out)
        out += data
        spans.append((off, len(data)))
        metas.append(
            {
                "type": blob_type,
                "fields": [],
                "snapshot-id": props.pop("__snapshot_id", None),
                "sequence-number": props.pop("__sequence_number", None),
                "offset": off,
                "length": len(data),
                "properties": props,
            }
        )
    payload = json.dumps(
        {"blobs": metas, "properties": dict(properties or {})},
        sort_keys=True,
    ).encode("utf-8")
    out += MAGIC
    out += payload
    out += struct.pack("<i", len(payload))
    out += b"\x00\x00\x00\x00"  # flags: footer payload uncompressed
    out += MAGIC
    with _fs.open_write(path) as f:
        f.write(bytes(out))
    return spans


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's FileMetadata (the self-describing path a
    reader without manifest offsets uses)."""
    data = _fs.read_bytes(path)
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file: {path}")
    (size,) = struct.unpack_from("<i", data, len(data) - 12)
    flags = data[len(data) - 8 : len(data) - 4]
    payload = data[len(data) - 12 - size : len(data) - 12]
    if flags[0] & 1:
        raise NotImplementedError(
            "puffin: compressed footer payload not supported here"
        )
    head = data[len(data) - 12 - size - 4 : len(data) - 12 - size]
    if head != MAGIC:
        raise ValueError(f"puffin: bad footer magic in {path}")
    return json.loads(payload.decode("utf-8"))


def read_blob(path: str, offset: int, length: int) -> bytes:
    """One ranged read of a blob — the manifest-driven DV fast path."""
    with _fs.open_random(path) as f:
        f.seek(offset)
        blob = f.read(length)
    if len(blob) != length:
        raise ValueError(
            f"puffin: short read at {offset}+{length} in {path}"
        )
    return blob


def read_dv(path: str, offset: int, length: int) -> list[int]:
    """Deleted-row positions from one DV blob (ranged read + decode)."""
    return dv_blob_decode(read_blob(path, offset, length))
