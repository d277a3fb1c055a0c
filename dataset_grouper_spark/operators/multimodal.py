"""Multimodal columns — opaque binary payloads with typed metadata.

North-star extension (SURVEY §2.8). The contract: media travel as
``binary`` columns plus a metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so the heavy per-item work is vectorized per batch and
never leaves the executor.

Metadata extraction (``decode_image_meta``) is REAL: container headers
(PNG IHDR, JPEG SOFn, GIF, BMP, WebP VP8/VP8L/VP8X) are parsed with
``struct`` over the leading bytes — no codec library needed. Only the
pixel-level kernels (resize, embedding) depend on codec libraries that
are NOT in this container; those raise NotImplementedError unless
``fake=True``, in which case a deterministic fake kernel exercises the
full Spark-side plumbing — schema, batching, partition behavior —
identically to a real codec.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# JPEG start-of-frame markers that carry dimensions: C0-CF minus
# C4 (DHT), C8 (JPG extension), CC (DAC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(b: bytes) -> tuple[str, int, int] | None:
    """Parse (format, width, height) from the leading bytes of an
    encoded image — pure ``struct``, no codec library. Supports PNG,
    JPEG (SOFn marker scan, handles progressive), GIF87a/89a, BMP, and
    WebP (VP8 lossy / VP8L lossless / VP8X extended). Returns None for
    anything unrecognized or truncated.

    The reference's integration path is an image dataset
    (reference: dataset_grouper/integration_test.py:29,
    data_loaders_test.py:25-34); this makes metadata extraction real
    in an environment without PIL.
    """
    if len(b) < 10:
        return None
    # PNG: 8-byte signature, then IHDR chunk with BE u32 width/height
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 24 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return ("png", w, h)
        return None
    # GIF: 6-byte version tag, then LE u16 logical-screen dims
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    # BMP: 'BM', BITMAPINFOHEADER at offset 14 with LE i32 dims
    # (height may be negative for top-down rows)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return ("bmp", w, abs(h))
    # WebP: RIFF container, dims depend on the first chunk's codec
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 25:
        chunk = b[12:16]
        if chunk == b"VP8X" and len(b) >= 30:
            wm1 = int.from_bytes(b[24:27], "little")
            hm1 = int.from_bytes(b[27:30], "little")
            return ("webp", wm1 + 1, hm1 + 1)
        if chunk == b"VP8L" and b[20] == 0x2F:
            bits = int.from_bytes(b[21:25], "little")
            return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        if chunk == b"VP8 " and len(b) >= 30 and b[23:26] == b"\x9d\x01\x2a":
            w, h = struct.unpack("<HH", b[26:30])
            return ("webp", w & 0x3FFF, h & 0x3FFF)
        return None
    # JPEG: scan markers from SOI until a SOFn frame header
    if b[:2] == b"\xff\xd8":
        i = 2
        n = len(b)
        while i + 3 < n:
            if b[i] != 0xFF:  # desynced / entropy data reached
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None

IMAGE_META_SCHEMA = (
    "id long, n_bytes long, format string, width int, height int, sha string"
)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a real image decoder: derives
    (format, width, height) from the content hash. Replace with PIL in
    a full environment — the Spark plumbing does not change."""
    h = hashlib.sha256(payload).digest()
    fmt = ["png", "jpeg", "webp"][h[0] % 3]
    return fmt, 16 + h[1] % 241, 16 + h[2] % 241


def encode_header_bytes(fmt: str, width: int, height: int) -> bytes:
    """Build a minimal REAL encoded-image prefix for ``fmt`` with the
    given dimensions — valid container headers (PNG IHDR with a real
    CRC, JPEG SOI+APP0+COM+SOF0, GIF89a, BMP BITMAPINFOHEADER, WebP
    VP8L). Used to synthesize image fixtures deterministically where
    no codec library exists to write full files."""
    import zlib

    if fmt == "png":
        ihdr = b"IHDR" + struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + ihdr
            + struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
        )
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
        com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"  # exercises marker scan
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 17, 8, height, width, 3)
            + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
        )
        return b"\xff\xd8" + app0 + com + sof0
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + b"\xf0\x00\x00"
    if fmt == "bmp":
        hdr = b"BM" + struct.pack("<IHHI", 122, 0, 0, 122)
        info = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 24
        return hdr + info
    if fmt == "webp":
        bits = (width - 1) | ((height - 1) << 14)
        payload = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits)
        return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
    raise ValueError(f"unknown test image format: {fmt}")


def decode_image_meta(
    df: DataFrame, content_col: str, id_col: str, fake: bool = False
) -> DataFrame:
    """Extract per-image metadata via mapInPandas (Arrow batches).

    The default path is REAL: ``parse_image_header`` reads container
    headers (PNG/JPEG/GIF/BMP/WebP) with ``struct`` — no codec library.
    Unrecognized or truncated payloads get NULL format/width/height
    (their n_bytes and sha still populate). ``fake=True`` keeps the
    deterministic content-hash stub for plumbing tests whose inputs are
    not encoded images.
    """
    decode = _fake_decode if fake else parse_image_header

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[content_col]
            metas = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "format": [m[0] if m else None for m in metas],
                    "width": pd.array(
                        [m[1] if m else None for m in metas], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m[2] if m else None for m in metas], dtype="Int32"
                    ),
                    "sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


def sample_frames(
    df: DataFrame, content_col: str, id_col: str, every_n_bytes: int = 1024
) -> DataFrame:
    """Frame-sampling plumbing demo: slice the binary payload at fixed
    strides (stand-in for video frame extraction). Pure Catalyst —
    substr on binary — so it scales without Python."""
    n_frames = F.greatest(
        F.floor(F.octet_length(F.col(content_col)) / every_n_bytes), F.lit(1)
    ).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(
                    F.col(content_col), (i * every_n_bytes + 1).cast("int"), every_n_bytes
                ),
            )
        ).alias("frame_idx", "frame_bytes"),
    )


RESIZED_SCHEMA = "id long, width int, height int, content binary"


def resize_images(
    df: DataFrame,
    content_col: str,
    id_col: str,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing: binary in -> binary out at (width, height),
    Arrow-batched per executor. A real pipeline swaps the kernel for
    PIL/opencv; the stub emits a deterministic payload (content-hash
    seeded, sized width*height) so downstream schema/partition behavior
    is exercised for real.
    """
    if not fake:
        raise NotImplementedError(
            "image codec libraries are not available in this environment; "
            "pass fake=True to run the deterministic stub resizer"
        )

    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf[content_col]:
                b = bytes(p)
                seed = hashlib.sha256(b).digest()
                reps = target // len(seed) + 1
                out.append((seed * reps)[:target])
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


def image_embeddings(
    df: DataFrame,
    content_col: str,
    id_col: str,
    dim: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Feature extraction plumbing: binary -> ``array<float>``
    embedding, Arrow-batched. The stub embeds via a normalized byte
    histogram folded to ``dim`` (deterministic); a real pipeline runs
    its vision encoder on the same batch iterator. Output plugs
    straight into the similarity tier (cosine_topk / lsh_topk /
    cluster pipelines) — binary column in, ANN search out.
    """
    if not fake:
        raise NotImplementedError(
            "vision encoder not available in this environment; "
            "pass fake=True to run the deterministic stub embedder"
        )
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = []
            for p in pdf[content_col]:
                counts = np.bincount(
                    np.frombuffer(bytes(p), dtype=np.uint8), minlength=256
                ).astype("float64")
                folded = counts.reshape(dim, -1).sum(axis=1) if 256 % dim == 0 else np.resize(counts, dim)
                norm = np.linalg.norm(folded)
                vecs.append(
                    [float(x) for x in (folded / norm if norm else folded)]
                )
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "embedding": vecs}
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema="id long, embedding array<float>"
    )
