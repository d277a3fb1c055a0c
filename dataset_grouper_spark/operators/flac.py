"""FLAC codec — pure stdlib + numpy, no libFLAC/soundfile.

Scope (honest): full FLAC DECODE per the public format spec
(xiph.org/flac/format): STREAMINFO + metadata-block walk, frame sync
with CRC-8 header / CRC-16 frame checks, UTF-8-style coded numbers,
all four subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC up
to order 32), partitioned Rice residuals (4- and 5-bit parameters,
raw-escape partitions), wasted-bits shifts, and all four channel
assignments (independent, left/side, right/side, mid/side). The
encoder half emits VERBATIM subframes (spec-legal for any signal), so
encode->decode is an exact identity — the fixture/oracle contract;
the predictor/Rice/stereo decode paths are pinned by hand-built spec
streams in tests.

Fixed-predictor reconstruction vectorizes as repeated cumulative sums
(order-k prediction is the k-th difference); LPC is the one sequential
loop, per frame. Like the other codecs, distribution comes from
Arrow-batched mapInPandas fanning FILES across partitions.
"""

from __future__ import annotations

import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ _CRC16_POLY) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader (FLAC bit order)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.d = data
        self.p = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.p >> 3
            if byte >= len(self.d):
                raise ValueError("flac: truncated stream")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.p = (self.p + 7) & ~7


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's UTF-8-style variable-length coded number (frame index)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


_BLOCKSIZE_TABLE = [
    0, 192, 576, 1152, 2304, 4608, 0, 0,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
]


def parse_flac_streaminfo(b: bytes):
    """(channels, sample_rate, bits, total_samples, first_frame_off) or
    None if not a FLAC stream."""
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    pos = 4
    info = None
    while pos + 4 <= len(b):
        hdr = b[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        body = b[pos + 4 : pos + 4 + ln]
        if btype == 0 and len(body) >= 34:  # STREAMINFO
            br = _Bits(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)  # min framesize
            br.read(24)  # max framesize
            rate = br.read(20)
            channels = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            info = (channels, rate, bits, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        return None
    return (*info, pos)


def _decode_residual(br: _Bits, n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("flac: bad partition order")
    out = np.empty(n - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out[idx] = br.read_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = br.unary()
                v = (q << param) | br.read(param)
                out[idx] = (v >> 1) ^ -(v & 1)  # zigzag
                idx += 1
    return out


_FIXED_COEFS = {
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_subframe(br: _Bits, n: int, bits: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: bad subframe sync bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bits -= wasted
    if stype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(bits), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.read_signed(bits) for _ in range(n)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [br.read_signed(bits) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        if order == 0:
            out[:] = resid
        else:
            # order-k fixed prediction inverts as k cumulative sums
            # over the k-th-difference stream seeded by the warmup
            seq = resid
            # reconstruct iteratively: s = cumsum applied k times with
            # warmup differences as seeds
            warm_arr = np.array(warm, dtype=np.int64)
            diffs = [warm_arr.copy()]
            for k in range(1, order):
                diffs.append(np.diff(diffs[-1]))
            # diffs[k][-1] is the seed for integration level k
            cur = seq
            for k in range(order - 1, -1, -1):
                seed = diffs[k][-1]
                cur = seed + np.cumsum(cur)
            out[order:] = cur
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [br.read_signed(bits) for _ in range(order)]
        prec = br.read(4)
        if prec == 15:
            raise ValueError("flac: invalid qlp precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coefs[j] * out[i - 1 - j]
            out[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted


def decode_flac(b: bytes, _info=None):
    """Decode a FLAC stream -> (samples int32 (n_frames, channels),
    sample_rate) — the same contract as ``decode_wav_pcm``. Raises
    ValueError on anything that is not a valid FLAC stream.
    ``_info`` lets a caller that already parsed STREAMINFO skip the
    second metadata walk (decode_wav_any's hot loop)."""
    info = _info if _info is not None else parse_flac_streaminfo(b)
    if info is None:
        raise ValueError("not a FLAC stream")
    channels, rate, bits, total, off = info
    br = _Bits(b, off * 8)
    chunks = []
    decoded = 0
    # STREAMINFO total_samples == 0 means UNKNOWN (live/pipe encodes):
    # decode frames until the stream is exhausted instead
    unknown_total = total == 0
    while (unknown_total and (br.p >> 3) < len(b)) or (
        not unknown_total and decoded < total
    ):
        hdr_start = br.p >> 3
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        br.read(3)  # sample size code (STREAMINFO governs here)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            n = br.read(8) + 1
        elif bs_code == 7:
            n = br.read(16) + 1
        else:
            n = _BLOCKSIZE_TABLE[bs_code]
            if n == 0:
                raise ValueError("flac: reserved blocksize code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        hdr_end = br.p >> 3
        crc8 = br.read(8)
        if _crc8(b[hdr_start:hdr_end]) != crc8:
            raise ValueError("flac: frame header CRC mismatch")
        if chan_code < 8:
            nch = chan_code + 1
            subbits = [bits] * nch
        elif chan_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit
            subbits = {8: [bits, bits + 1], 9: [bits + 1, bits],
                       10: [bits, bits + 1]}[chan_code]
        else:
            raise ValueError("flac: reserved channel assignment")
        if chan_code < 8 and nch != channels:
            raise ValueError("flac: channel count mismatch")
        subs = [
            _decode_subframe(br, n, subbits[c]) for c in range(nch)
        ]
        br.align()
        frame_end = br.p >> 3
        crc16 = br.read(16)
        if _crc16(b[hdr_start:frame_end]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        if chan_code == 8:  # left/side: right = left - side
            left, side = subs
            subs = [left, left - side]
        elif chan_code == 9:  # right/side: left = right + side
            side, right = subs
            subs = [side + right, right]
        elif chan_code == 10:  # mid/side: restore the dropped LSB from
            # side's parity, then left/right = (2m±s)/2 (spec decoding)
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        chunk = np.stack(subs, axis=1)
        take = n if unknown_total else min(n, total - decoded)
        chunks.append(chunk[:take])
        decoded += take
    out = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.zeros((0, channels), dtype=np.int64)
    )
    return out.astype(np.int32), rate


class _BitsW:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.out.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def encode_flac_verbatim(
    samples, sample_rate: int, bits: int = 16, block_size: int = 4096
) -> bytes:
    """Encode int samples (shape (n,) or (n, ch)) as a valid FLAC
    stream of VERBATIM subframes with independent channels — spec-legal
    for any signal and EXACTLY invertible (FLAC is lossless), which is
    what the closed-form oracles need. Fixture-scale encoder; a real
    encoder would pick predictors for compression."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if arr.min(initial=0) < lo or arr.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bits}-bit range")
    si = _BitsW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    streaminfo = bytes(si.out) + b"\x00" * 16  # md5 unset (all zero)
    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, STREAMINFO
    out += struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo
    frame_idx = 0
    for start in range(0, n, block_size):
        blk = arr[start : start + block_size]
        bn = len(blk)
        hw = _BitsW()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)  # fixed blocksize strategy
        hw.write(7, 4)  # blocksize: 16-bit field follows
        hw.write(0, 4)  # sample rate: from STREAMINFO
        hw.write(channels - 1, 4)  # independent channels
        hw.write(0, 3)  # sample size: from STREAMINFO
        hw.write(0, 1)
        if frame_idx < 0x80:
            hw.write(frame_idx, 8)
        else:  # 2-byte UTF-8-style
            hw.write(0xC0 | (frame_idx >> 6), 8)
            hw.write(0x80 | (frame_idx & 0x3F), 8)
        hw.write(bn - 1, 16)
        header = bytes(hw.out)
        assert hw.n == 0
        header += bytes([_crc8(header)])
        fw = _BitsW()
        for c in range(channels):
            fw.write(0, 1)
            fw.write(1, 6)  # VERBATIM
            fw.write(0, 1)  # no wasted bits
            for v in blk[:, c]:
                fw.write(int(v), bits)
        fw.align()
        frame = header + bytes(fw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1
    return bytes(out)
