"""Audio modality: real WAV (RIFF/PCM) codec + distributed feature ops.

The reference pipelines treat examples as feature dicts whose values may
be arbitrary tensors (reference: dataset_grouper/core/serialization.py:23-48
serializes any bytes feature), so an audio column is "just bytes" to the
grouping engine.  Here we make the audio path REAL for the formats
that need no codec library: WAV/RIFF integer PCM, IMA-ADPCM (4:1
compressed, operators/audio.py below), and FLAC (full decode:
Rice-coded fixed/LPC predictors, stereo decorrelation —
operators/flac.py).  Lossy formats (MP3/OGG) are honestly
gated behind an optional ``soundfile`` import — the Spark-side plumbing
(schema, Arrow batching, per-frame explode) is identical either way.

Scale notes (100 TB posture):
- All ops are ``mapInPandas`` over Arrow batches: one Python worker per
  input partition, no shuffle, no driver involvement; output row count
  may exceed input (frame explode) without materializing whole files.
- Feature math stays in int64 (sum of squares, zero crossings, peak) so
  results are exact and engine-portable — the DuckDB oracle twins
  recompute them closed-form.
- ``frame_energy`` emits per-frame rows; downstream windowing or
  aggregation then runs JVM-side on narrow integer columns.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers compose)

AUDIO_META_SCHEMA = (
    "id long, n_bytes long, channels int, sample_rate int, bits int, "
    "n_frames long, duration_ms long"
)

AUDIO_FEATURES_SCHEMA = (
    "id long, channels int, sample_rate int, bits int, n_frames long, "
    "duration_ms long, peak long, sum_sq long, zero_crossings long"
)

FRAME_ENERGY_SCHEMA = (
    "id long, frame_idx int, n_samples int, energy long, peak long"
)

RESAMPLE_SCHEMA = "id long, content binary, sample_rate int, n_frames long, sum_sq long"


# ------------------------------------------------------------------ codec


def parse_wav_header(b: bytes):
    """Walk RIFF chunks of a WAV file; return
    ``(channels, sample_rate, bits, n_frames, data_off, data_len)`` or
    ``None`` if the payload is not a PCM WAV.  Only the ``fmt `` and
    ``data`` chunks are consulted; unknown chunks are skipped by their
    declared size (word-aligned), so files with LIST/INFO metadata
    parse correctly."""
    if len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            if body + 16 > len(b):
                # truncated fmt body: struct.unpack would raise
                # struct.error, which is NOT a ValueError — it would
                # escape every caller's skip_invalid/NULL contract and
                # kill the job on one corrupt file
                return None
            audio_fmt, channels, rate = struct.unpack(
                "<HHI", b[body : body + 8]
            )
            (bits,) = struct.unpack("<H", b[body + 14 : body + 16])
            if audio_fmt != 1:  # integer PCM only
                return None
            if rate == 0:
                # corrupt header; every downstream duration/resample
                # computation divides by the rate
                return None
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if fmt is None:
                return None
            channels, rate, bits = fmt
            data_len = min(size, len(b) - body)
            bytes_per_frame = channels * (bits // 8)
            if bytes_per_frame == 0:
                return None
            n_frames = data_len // bytes_per_frame
            return (channels, rate, bits, n_frames, body, n_frames * bytes_per_frame)
        pos = body + size + (size & 1)
    return None


def decode_wav_pcm(b: bytes):
    """Decode integer PCM to ``(samples, sample_rate)`` where samples is
    an int32 ndarray of shape ``(n_frames, channels)``.  16-bit signed
    and 8-bit unsigned (recentered to signed) are supported — the two
    layouts the WAV PCM spec defines for integer audio."""
    hdr = parse_wav_header(b)
    if hdr is None:
        raise ValueError("not an integer-PCM WAV payload")
    channels, rate, bits, n_frames, off, data_len = hdr
    raw = b[off : off + data_len]
    if bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bits == 8:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise ValueError(f"unsupported PCM bit depth: {bits}")
    return arr.reshape(n_frames, channels), rate


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Encode int16-range samples (shape ``(n,)`` or ``(n, ch)``) as a
    canonical 44-byte-header PCM WAV."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    data = arr.astype("<i2").tobytes()
    block = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# IMA/DVI ADPCM (WAV format tag 0x11) — public spec: IMA Digital Audio
# Focus Group "Recommended Practices for Enhancing Digital Audio
# Compatibility" rev 3.00 (1992); the same tables/step rules libsndfile
# and ffmpeg implement. 4 bits/sample, 4:1 compression — the one
# compressed audio format decodable in pure stdlib+numpy.
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64,
)


def parse_wav_adpcm_header(b: bytes):
    """Walk RIFF chunks of an IMA-ADPCM WAV (format tag 0x11); return
    ``(channels, sample_rate, block_align, n_samples, data_off,
    data_len)`` or ``None``. ``n_samples`` honors the ``fact`` chunk
    when present (the spec's exact per-channel frame count — the last
    block may be padded), else derives from whole blocks."""
    if len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, fact = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            if body + 16 > len(b):
                return None
            audio_fmt, channels, rate = struct.unpack(
                "<HHI", b[body : body + 8]
            )
            (block_align,) = struct.unpack("<H", b[body + 12 : body + 14])
            if audio_fmt != 0x11 or rate == 0 or channels == 0:
                return None
            if block_align < 4 * channels or block_align % (4 * channels):
                # each channel owns a 4-byte block header and data in
                # 4-byte interleave groups; anything else is corrupt
                return None
            fmt = (channels, rate, block_align)
        elif cid == b"fact" and size >= 4 and body + 4 <= len(b):
            (fact,) = struct.unpack("<I", b[body : body + 4])
        elif cid == b"data":
            if fmt is None:
                return None
            channels, rate, block_align = fmt
            data_len = min(size, len(b) - body)
            spb = 1 + (block_align - 4 * channels) * 2 // channels
            n_blocks = data_len // block_align
            n = n_blocks * spb
            tail = data_len % block_align
            if tail >= 4 * channels:
                n += 1 + (tail - 4 * channels) * 2 // channels
            if fact is not None:
                n = min(n, fact)
            return (channels, rate, block_align, n, body, data_len)
        pos = body + size + (size & 1)
    return None


def decode_wav_ima_adpcm(b: bytes):
    """Decode an IMA-ADPCM WAV to ``(samples, sample_rate)``, samples an
    int32 ndarray of shape ``(n_frames, channels)`` — same contract as
    :func:`decode_wav_pcm`.

    Blocks are independent (each carries its own predictor/step-index
    header), so the decode vectorizes ACROSS blocks: the only Python
    loop is over the ``samples_per_block`` recurrence, each step a
    numpy op over every (block, channel) lane at once — a 1-hour file
    costs the same loop length as a 1-second one."""
    hdr = parse_wav_adpcm_header(b)
    if hdr is None:
        raise ValueError("not an IMA-ADPCM WAV payload")
    channels, rate, block_align, n_samples, off, data_len = hdr
    raw = b[off : off + data_len]
    # pad the trailing partial block with zero nibbles: the recurrence
    # is causal, so padded positions never affect the kept samples
    n_blocks = (len(raw) + block_align - 1) // block_align
    if n_blocks == 0 or n_samples == 0:
        return np.zeros((0, channels), dtype=np.int32), rate
    buf = np.zeros(n_blocks * block_align, dtype=np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    blocks = buf.reshape(n_blocks, block_align)
    # per-channel 4-byte headers lead the block
    heads = blocks[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = (
        heads[:, :, 0].astype(np.int64)
        | (heads[:, :, 1].astype(np.int64) << 8)
    )
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)  # int16 LE
    index = np.clip(heads[:, :, 2].astype(np.int64), 0, 88)
    # data area: 4-byte groups interleaved L,R,L,R...; regroup to
    # (blocks, channels, bytes_per_channel), then split nibbles
    body = blocks[:, 4 * channels :].reshape(n_blocks, -1, channels, 4)
    body = body.transpose(0, 2, 1, 3).reshape(n_blocks, channels, -1)
    nibbles = np.empty(
        (n_blocks, channels, body.shape[2] * 2), dtype=np.int64
    )
    nibbles[:, :, 0::2] = body & 0x0F  # low nibble first
    nibbles[:, :, 1::2] = body >> 4
    spb = nibbles.shape[2] + 1
    out = np.empty((n_blocks, channels, spb), dtype=np.int64)
    out[:, :, 0] = pred
    for t in range(nibbles.shape[2]):
        n = nibbles[:, :, t]
        step = IMA_STEP_TABLE[index]
        diff = (
            (step >> 3)
            + np.where(n & 1, step >> 2, 0)
            + np.where(n & 2, step >> 1, 0)
            + np.where(n & 4, step, 0)
        )
        pred = np.clip(
            pred + np.where(n & 8, -diff, diff), -32768, 32767
        )
        index = np.clip(index + IMA_INDEX_TABLE[n], 0, 88)
        out[:, :, t + 1] = pred
    # (blocks, channels, spb) -> (frames, channels), trimmed to the
    # true sample count (fact chunk / partial tail)
    frames = out.transpose(0, 2, 1).reshape(-1, channels)
    return frames[:n_samples].astype(np.int32), rate


def encode_wav_ima_adpcm(
    samples, sample_rate: int, block_frames: int = 505
) -> bytes:
    """Encode int16-range samples as an IMA-ADPCM WAV (format 0x11):
    every block header re-anchors the predictor at the block's first
    true sample (index carried across blocks), the spec's standard
    framing. ``block_frames`` is samples per block per channel
    (default 505 = the canonical 256-byte mono block). The fixture/
    round-trip side of the codec — scalar loop, test-scale use."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if (block_frames - 1) % 8:
        raise ValueError(
            "block_frames-1 must be a multiple of 8 (4-byte interleave)"
        )
    block_align = 4 * channels + (block_frames - 1) // 2 * channels
    step_t, idx_t = IMA_STEP_TABLE, IMA_INDEX_TABLE
    index = [0] * channels
    blocks = []
    for start in range(0, n, block_frames):
        seg = arr[start : start + block_frames]
        if len(seg) < block_frames:  # zero-pad the tail block
            seg = np.vstack(
                [seg, np.zeros((block_frames - len(seg), channels), int)]
            )
        chan_bytes = []
        for c in range(channels):
            pred = int(np.clip(seg[0, c], -32768, 32767))
            head = struct.pack("<hBB", pred, index[c], 0)
            nibs = []
            for t in range(1, block_frames):
                step = int(step_t[index[c]])
                delta = int(seg[t, c]) - pred
                nib = 0
                if delta < 0:
                    nib, delta = 8, -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # decoder-mirror update keeps encoder state exact
                diff = (step >> 3) + (
                    (step >> 2 if nib & 1 else 0)
                    + (step >> 1 if nib & 2 else 0)
                    + (step if nib & 4 else 0)
                )
                pred = max(
                    -32768, min(32767, pred + (-diff if nib & 8 else diff))
                )
                index[c] = max(0, min(88, index[c] + int(idx_t[nib])))
                nibs.append(nib)
            packed = bytes(
                (nibs[i] | (nibs[i + 1] << 4)) for i in range(0, len(nibs), 2)
            )
            chan_bytes.append((head, packed))
        block = b"".join(h for h, _ in chan_bytes)
        # interleave data 4 bytes per channel
        per = len(chan_bytes[0][1])
        for g in range(0, per, 4):
            for _, p in chan_bytes:
                block += p[g : g + 4]
        blocks.append(block)
    data = b"".join(blocks)
    spb = block_frames
    avg = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, avg, block_align, 4, 2, spb
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# G.711 companded telephony audio (WAV format tags 6 = A-law and
# 7 = mu-law) — the ITU-T G.711 logarithmic 8-bit encodings.  The
# expansion is pure integer arithmetic (published spec; the classic
# public-domain reference implementation is Sun Microsystems' g711.c),
# so decode is a 256-entry lookup table built from the closed form —
# no codec library, and the same arithmetic is expressible in the SQL
# oracle twin.

_G711_BIAS = 0x84  # mu-law bias (132)


def _ulaw_expand_one(u: int) -> int:
    """Scalar mu-law expansion per G.711: complement, split into
    sign/segment/mantissa, shift out of the log domain."""
    c = ~u & 0xFF
    t = ((c & 0x0F) << 3) + _G711_BIAS
    t <<= (c & 0x70) >> 4
    return (_G711_BIAS - t) if (c & 0x80) else (t - _G711_BIAS)


def _alaw_expand_one(a: int) -> int:
    """Scalar A-law expansion per G.711: even-bit inversion (xor 0x55),
    then segment decode; sign bit SET means positive in A-law."""
    c = a ^ 0x55
    t = (c & 0x0F) << 4
    seg = (c & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (c & 0x80) else -t


_ULAW_TABLE = np.array([_ulaw_expand_one(u) for u in range(256)], np.int32)
_ALAW_TABLE = np.array([_alaw_expand_one(a) for a in range(256)], np.int32)


def parse_wav_g711_header(b: bytes):
    """Walk RIFF chunks of a G.711 WAV (format tag 6 or 7; 8 bits per
    sample, one byte per sample per channel); return ``(law, channels,
    rate, data_off, data_len)`` with ``law`` in {"alaw", "ulaw"} or
    ``None`` if not a G.711 WAV."""
    if len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            if body + 16 > len(b):
                return None
            audio_fmt, channels, rate = struct.unpack(
                "<HHI", b[body : body + 8]
            )
            if audio_fmt not in (6, 7) or rate == 0 or channels == 0:
                return None
            fmt = ("alaw" if audio_fmt == 6 else "ulaw", channels, rate)
        elif cid == b"data":
            if fmt is None:
                return None
            law, channels, rate = fmt
            data_len = min(size, len(b) - body)
            data_len -= data_len % channels  # whole frames only
            return (law, channels, rate, body, data_len)
        pos = body + size + (size & 1)
    return None


def decode_wav_g711(b: bytes):
    """Decode a G.711 mu-law/A-law WAV to ``(samples, rate)`` — int32
    ndarray of shape ``(n_frames, channels)`` in 13/14-bit linear range
    (A-law ±4032, mu-law ±8031), one table lookup per byte."""
    hdr = parse_wav_g711_header(b)
    if hdr is None:
        raise ValueError("not a G.711 (A-law/mu-law) WAV payload")
    law, channels, rate, off, data_len = hdr
    raw = np.frombuffer(b[off : off + data_len], dtype=np.uint8)
    table = _ALAW_TABLE if law == "alaw" else _ULAW_TABLE
    return table[raw].reshape(-1, channels), rate


def _g711_encoder(table: np.ndarray):
    """Build a vectorized linear→code encoder from a decode table:
    each int16 sample maps to the code whose reconstruction level is
    NEAREST (ties toward the lower level).  Nearest-level quantization
    is the encoder's defining property; it guarantees the exact
    round-trip ``decode(encode(level)) == level`` for every one of the
    256 representable levels, which is what the fixtures and property
    tests pin."""
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int64)
    # midpoints between adjacent reconstruction levels: searchsorted
    # against them assigns each input to its nearest level
    mids = (levels[:-1] + levels[1:] + 1) // 2

    def encode(x: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, x.astype(np.int64), side="right")
        return order[idx].astype(np.uint8)

    return encode


_ULAW_ENCODE = _g711_encoder(_ULAW_TABLE)
_ALAW_ENCODE = _g711_encoder(_ALAW_TABLE)


def encode_wav_g711(samples, sample_rate: int, law: str = "ulaw") -> bytes:
    """Encode int16-range samples (shape ``(n,)`` or ``(n, ch)``) as a
    G.711 WAV (format tag 7 for mu-law, 6 for A-law) with a fact
    chunk, per the WAV conventions for compressed formats."""
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    enc = _ULAW_ENCODE if law == "ulaw" else _ALAW_ENCODE
    data = enc(arr.ravel()).tobytes()
    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    n = arr.shape[0]
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 12 + 8 + len(data))
        + b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_any(b: bytes):
    """Route an audio payload to its codec: WAV integer PCM (format
    1), WAV IMA ADPCM (format 0x11), G.711 A-law/mu-law (formats 6/7),
    or FLAC (full pure-stdlib decode — operators/flac.py). Returns
    ``(samples, rate, bits)`` — bits is the container's stored depth."""
    if b[:4] == b"fLaC":
        from dataset_grouper_spark.operators.flac import (
            decode_flac,
            parse_flac_streaminfo,
        )

        info = parse_flac_streaminfo(b)
        if info is None:
            raise ValueError("not a FLAC stream")
        samples, rate = decode_flac(b, _info=info)
        return samples, rate, info[2]
    hdr = parse_wav_header(b)
    if hdr is not None:
        samples, rate = decode_wav_pcm(b)
        return samples, rate, hdr[2]
    g711 = parse_wav_g711_header(b)
    if g711 is not None:
        samples, rate = decode_wav_g711(b)
        return samples, rate, 8
    samples, rate = decode_wav_ima_adpcm(b)  # raises ValueError if not
    return samples, rate, 4


def decode_compressed_audio(b: bytes):
    """Lossy-compressed-audio decode (MP3/OGG) — honestly gated: this
    container has no audio codec library, so this raises unless
    ``soundfile`` is importable at runtime. FLAC does NOT need this
    gate — operators/flac.py decodes it in pure stdlib+numpy and
    ``decode_wav_any`` routes it. The Spark plumbing (schemas, Arrow
    batching) is format-agnostic and fully tested via the WAV path."""
    try:
        import io

        import soundfile  # type: ignore
    except ImportError as e:  # pragma: no cover - environment gate
        raise NotImplementedError(
            "compressed audio decode requires the optional 'soundfile' "
            "library, which is not installed in this environment"
        ) from e
    data, rate = soundfile.read(io.BytesIO(b), dtype="int16")  # pragma: no cover
    return np.atleast_2d(data.T).T.astype(np.int32), rate  # pragma: no cover


# ------------------------------------------------------------- operators


def audio_meta(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Per-file header metadata (no sample decode): channels, rate, bit
    depth, frame count, integer-ms duration.  Non-WAV payloads yield
    NULL audio fields (their n_bytes still populates)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[content_col]
            rows = []
            for p in payloads:
                hdr = parse_wav_header(bytes(p))
                if hdr is None:
                    rows.append((None, None, None, None, None))
                else:
                    ch, rate, bits, n, _, _ = hdr
                    rows.append((ch, rate, bits, n, n * 1000 // rate))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "channels": pd.array([r[0] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "bits": pd.array([r[2] for r in rows], dtype="Int32"),
                    "n_frames": pd.array([r[3] for r in rows], dtype="Int64"),
                    "duration_ms": pd.array(
                        [r[4] for r in rows], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=AUDIO_META_SCHEMA
    )


def _channel0_features(samples: np.ndarray):
    """Exact integer features over channel 0: (peak, sum_sq,
    zero_crossings).  A zero crossing is a sign-class change between
    consecutive samples with ``v >= 0`` as the nonnegative class — the
    same rule the SQL oracle twin states with LAG."""
    s = samples[:, 0].astype(np.int64)
    if len(s) == 0:
        return 0, 0, 0
    peak = int(np.abs(s).max())
    sum_sq = int((s * s).sum())
    nonneg = s >= 0
    zc = int((nonneg[1:] != nonneg[:-1]).sum())
    return peak, sum_sq, zc


def audio_features(
    df: DataFrame,
    content_col: str,
    id_col: str,
    skip_invalid: bool = False,
) -> DataFrame:
    """Decode PCM and compute exact integer signal features over
    channel 0 (peak amplitude, energy as sum of squares, zero-crossing
    count) alongside the header metadata.  One Arrow pass, no shuffle.

    ``skip_invalid=True`` emits an all-NULL feature row for payloads
    that fail to parse instead of raising — at corpus scale one corrupt
    file must not kill the job; the NULL rows are the audit trail
    (count them, don't lose them)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "id": [],
                "channels": [],
                "sample_rate": [],
                "bits": [],
                "n_frames": [],
                "duration_ms": [],
                "peak": [],
                "sum_sq": [],
                "zero_crossings": [],
            }
            for i, p in zip(pdf[id_col].astype("int64"), pdf[content_col]):
                try:
                    samples, rate, bits = decode_wav_any(bytes(p))
                    ch, n = samples.shape[1], len(samples)
                    peak, sum_sq, zc = _channel0_features(samples)
                    row = (
                        ch, rate, bits, n, n * 1000 // rate,
                        peak, sum_sq, zc,
                    )
                except ValueError:
                    if not skip_invalid:
                        raise
                    row = (None,) * 8
                out["id"].append(int(i))
                for key, v in zip(
                    (
                        "channels", "sample_rate", "bits", "n_frames",
                        "duration_ms", "peak", "sum_sq", "zero_crossings",
                    ),
                    row,
                ):
                    out[key].append(v)
            yield pd.DataFrame(
                {
                    "id": out["id"],
                    "channels": pd.array(out["channels"], dtype="Int32"),
                    "sample_rate": pd.array(
                        out["sample_rate"], dtype="Int32"
                    ),
                    "bits": pd.array(out["bits"], dtype="Int32"),
                    "n_frames": pd.array(out["n_frames"], dtype="Int64"),
                    "duration_ms": pd.array(
                        out["duration_ms"], dtype="Int64"
                    ),
                    "peak": pd.array(out["peak"], dtype="Int64"),
                    "sum_sq": pd.array(out["sum_sq"], dtype="Int64"),
                    "zero_crossings": pd.array(
                        out["zero_crossings"], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


def frame_energy(
    df: DataFrame,
    content_col: str,
    id_col: str,
    frame_len: int,
    hop: int | None = None,
) -> DataFrame:
    """Explode each file into fixed-length analysis frames (channel 0)
    with exact integer energy and peak per frame — the audio analogue of
    video frame sampling.  ``hop`` defaults to ``frame_len``
    (non-overlapping); the final partial frame is emitted with its true
    ``n_samples``.  Output rows >> input rows, streamed per Arrow batch."""
    if frame_len < 1:
        raise ValueError("frame_len must be >= 1")
    hop = hop or frame_len
    if hop < 1:
        # hop <= 0 would never advance the frame cursor: the executor
        # loop appends empty frames forever until OOM
        raise ValueError("hop must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, nsamp, energy, peak = [], [], [], [], []
            for i, p in zip(pdf[id_col].astype("int64"), pdf[content_col]):
                samples, _, _ = decode_wav_any(bytes(p))
                s = samples[:, 0].astype(np.int64)
                j = 0
                start = 0
                while start < len(s):
                    fr = s[start : start + frame_len]
                    ids.append(int(i))
                    fidx.append(j)
                    nsamp.append(len(fr))
                    energy.append(int((fr * fr).sum()))
                    peak.append(int(np.abs(fr).max()) if len(fr) else 0)
                    j += 1
                    start += hop
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": fidx,
                    "n_samples": nsamp,
                    "energy": energy,
                    "peak": peak,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=FRAME_ENERGY_SCHEMA
    )


def resample_nearest(
    df: DataFrame, content_col: str, id_col: str, out_rate: int
) -> DataFrame:
    """Nearest-neighbor resample to ``out_rate`` and re-encode as PCM16
    WAV.  Output length ``n_out = n_in * out_rate // in_rate``; output
    sample ``j`` copies input sample ``j * n_in // n_out`` — the same
    integer index map as the image resize kernel, so the oracle twin is
    closed-form.  Returns the re-encoded bytes plus exact verification
    columns (n_frames, channel-0 sum of squares)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, outs, rates, nfr, ssq = [], [], [], [], []
            for i, p in zip(pdf[id_col].astype("int64"), pdf[content_col]):
                samples, in_rate, _ = decode_wav_any(bytes(p))
                n_in = samples.shape[0]
                n_out = n_in * out_rate // in_rate
                idx = (np.arange(n_out, dtype=np.int64) * n_in) // max(n_out, 1)
                res = samples[idx] if n_out > 0 else samples[:0]
                ids.append(int(i))
                outs.append(encode_wav_pcm16(res, out_rate))
                rates.append(out_rate)
                nfr.append(n_out)
                s0 = res[:, 0].astype(np.int64)
                ssq.append(int((s0 * s0).sum()))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "content": outs,
                    "sample_rate": rates,
                    "n_frames": nfr,
                    "sum_sq": ssq,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=RESAMPLE_SCHEMA
    )
