"""Roaring bitmaps + Delta deletion-vector framing, pure stdlib.

Delta Lake's deletion vectors (the merge-on-read row-tombstone format
of the public Delta Transaction Log Protocol) serialize the deleted
row indexes of one data file as a 64-bit roaring bitmap. Three public
specs compose here, each implemented from its document — no delta jar,
no roaring library:

1. **32-bit roaring serialization** (the cross-language
   RoaringFormatSpec, github.com/RoaringBitmap/RoaringFormatSpec):
   cookie header (12346 with run containers + 2-byte-per-container
   run flags, 12347 without), descriptive header of (key,
   cardinality-1) uint16 pairs, optional uint32 offset header, then
   array (uint16 list), bitmap (8 KiB fixed bitset), or run
   (count + (start, length-1) pairs) containers. All little-endian.
2. **64-bit "portable" wrapper** (same spec's 64-bit format, used by
   roaring-rs ``RoaringTreemap`` and Java ``Roaring64NavigableMap``):
   uint64 LE bucket count, then per bucket a uint32 LE high-32-bit
   key + the bucket's 32-bit bitmap serialization, keys ascending.
   Delta prefixes this with its magic number 1681511377 (int32 LE).
3. **DV file framing** (Delta protocol "Deletion Vector Descriptors"):
   a ``.bin`` file starts with a 1-byte format version (1); each DV in
   it sits at ``offset``: 4-byte BIG-endian data size, the magic+
   bitmap data, then a 4-byte BIG-endian CRC-32 of the data. Inline
   DVs ('i') carry the magic+bitmap data Z85-encoded directly in the
   log action; 'u' DVs store ``{optional prefix}{20-char Z85 uuid}``
   resolving to ``<prefix>/deletion_vector_<uuid>.bin``; 'p' DVs name
   an absolute path.

Z85 is the ZeroMQ base-85 spec (4 bytes <-> 5 chars, big-endian).

The encoder half exists so the engine can WRITE deletion vectors
(``delta.delta_delete_where``) and so tests can pin the codec as a
closed loop plus hand-built spec vectors.
"""

from __future__ import annotations

import struct
import zlib

DELTA_DV_MAGIC = 1681511377
_COOKIE_RUN = 12346
_COOKIE_NO_RUN = 12347
_NO_OFFSET_THRESHOLD = 4  # spec: offsets omitted below 4 containers w/ runs
_ARRAY_MAX = 4096  # container cardinality at/below which arrays are used

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"z85: invalid character {ch!r}")
        if v > 0xFFFFFFFF:
            raise ValueError("z85: chunk overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


def roaring32_serialize(values) -> bytes:
    """Standard-format bytes for sorted distinct uint32 ``values``.
    Always emits the no-run-container flavor (cookie 12347) with
    array/bitmap containers — every compliant reader accepts it."""
    values = sorted(set(int(v) for v in values))
    if values and not 0 <= values[-1] <= 0xFFFFFFFF:
        raise ValueError("roaring32: values must be uint32")
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    out = bytearray()
    out += struct.pack("<ii", _COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    # offset header (always present in the no-run flavor)
    payloads = []
    for k in keys:
        vals = buckets[k]
        if len(vals) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            payloads.append(bytes(bits))
    pos = len(out) + 4 * len(keys)
    for p in payloads:
        out += struct.pack("<I", pos)
        pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def roaring32_deserialize(data: bytes, offset: int = 0) -> tuple[list[int], int]:
    """Decode one 32-bit bitmap at ``offset``; returns (sorted values,
    bytes consumed). Accepts both cookie flavors incl. run containers."""
    (cookie,) = struct.unpack_from("<i", data, offset)
    pos = offset + 4
    if cookie & 0xFFFF == _COOKIE_RUN:
        n_containers = (cookie >> 16) + 1
        run_flag_bytes = (n_containers + 7) // 8
        run_flags = data[pos : pos + run_flag_bytes]
        pos += run_flag_bytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", data, pos)
        pos += 4
        run_flags = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"roaring32: bad cookie {cookie}")
    headers = []
    for i in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n_containers  # trust sequential layout; skip offsets
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + length_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            bits = data[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    values.append(base + (byte_i << 3) + low.bit_length() - 1)
                    b ^= low
    return values, pos - offset


def roaring64_serialize(values) -> bytes:
    """64-bit portable format: uint64 LE bucket count, then (uint32 LE
    high key + 32-bit serialization) per bucket, keys ascending."""
    values = sorted(set(int(v) for v in values))
    if values and not 0 <= values[-1] < 1 << 64:
        raise ValueError("roaring64: values must be uint64")
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for k in sorted(buckets):
        out += struct.pack("<I", k)
        out += roaring32_serialize(buckets[k])
    return bytes(out)


def roaring64_deserialize(data: bytes, offset: int = 0) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", data, offset)
    pos = offset + 8
    values: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals, used = roaring32_deserialize(data, pos)
        pos += used
        values.extend((key << 32) + v for v in vals)
    return values


def dv_data_encode(positions) -> bytes:
    """Delta DV payload: magic int32 LE + 64-bit portable bitmap."""
    return struct.pack("<i", DELTA_DV_MAGIC) + roaring64_serialize(positions)


def dv_data_decode(data: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DELTA_DV_MAGIC:
        raise ValueError(f"deletion vector: bad magic {magic}")
    return roaring64_deserialize(data, 4)


def dv_file_write(path: str, positions) -> tuple[int, int, int]:
    """Write a single-DV ``.bin`` file per the protocol framing;
    returns (offset, sizeInBytes, cardinality) for the descriptor.
    Runs on EXECUTORS — compat.fs routes object-store URIs."""
    from dataset_grouper_spark.compat import fs as _fs

    data = dv_data_encode(positions)
    with _fs.open_write(path) as f:
        f.write(b"\x01")  # format version
        f.write(struct.pack(">i", len(data)))  # BIG-endian size
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data)))  # BIG-endian CRC
    return 1, len(data), len(set(int(p) for p in positions))


def dv_file_read(path: str, offset: int, size_in_bytes: int) -> list[int]:
    """Read one DV from a ``.bin`` file, verifying framing + CRC.
    Runs on EXECUTORS — routed through compat.fs so DV sidecars on
    object stores resolve without a shared POSIX mount."""
    from dataset_grouper_spark.compat import fs as _fs

    raw = _fs.read_bytes(path)
    if not raw or raw[0] != 1:
        raise ValueError(f"deletion vector file {path}: bad format version")
    (size,) = struct.unpack_from(">i", raw, offset)
    if size != size_in_bytes:
        raise ValueError(
            f"deletion vector file {path}: size mismatch "
            f"(framed {size}, descriptor {size_in_bytes})"
        )
    data = raw[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + size)
    if zlib.crc32(data) != crc:
        raise ValueError(f"deletion vector file {path}: CRC mismatch")
    return dv_data_decode(data)
