"""FLAC codec: verbatim roundtrip identity + hand-built spec streams
for CONSTANT/FIXED/LPC subframes, Rice residuals (both widths +
escape), stereo decorrelation, wasted bits, and CRC enforcement. The
forward predictors here are independent spec implementations."""

import struct

import numpy as np
import pytest

from dataset_grouper_spark.operators import flac as FL

FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _streaminfo(n, rate=8000, channels=1, bits=16, bsz=4096):
    si = FL._BitsW()
    si.write(bsz, 16)
    si.write(bsz, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(n, channels=1, chan_code=None):
    hw = FL._BitsW()
    hw.write(0x3FFE, 14)
    hw.write(0, 2)
    hw.write(7, 4)  # 16-bit blocksize field
    hw.write(0, 4)
    hw.write(chan_code if chan_code is not None else channels - 1, 4)
    hw.write(0, 4)  # sample size from streaminfo + reserved
    hw.write(0, 8)  # frame number 0
    hw.write(n - 1, 16)
    header = bytes(hw.out)
    return header + bytes([FL._crc8(header)])


def _rice_write(fw, e, param):
    u = (e << 1) ^ (e >> 63) if False else (2 * e if e >= 0 else -2 * e - 1)
    q = u >> param
    for _ in range(q):
        fw.write(0, 1)
    fw.write(1, 1)
    fw.write(u & ((1 << param) - 1), param)


def _residual_block(fw, resid, param, method=0):
    fw.write(method, 2)  # rice4 / rice5
    fw.write(0, 4)  # partition order 0
    fw.write(param, 4 if method == 0 else 5)
    for e in resid:
        _rice_write(fw, int(e), param)


def _finish(streaminfo, header, fw):
    fw.align()
    frame = header + bytes(fw.out)
    frame += struct.pack(">H", FL._crc16(frame))
    return streaminfo + frame


def test_verbatim_roundtrip_multiblock_stereo():
    rng = np.random.RandomState(1)
    sig = rng.randint(-30000, 30000, (700, 2))
    b = FL.encode_flac_verbatim(sig, 44100, block_size=256)
    dec, rate = FL.decode_flac(b)
    assert rate == 44100 and np.array_equal(dec, sig)


def test_constant_subframe():
    n = 50
    fw = FL._BitsW()
    fw.write(0, 1)
    fw.write(0, 6)  # CONSTANT
    fw.write(0, 1)
    fw.write(-1234 & 0xFFFF, 16)
    b = _finish(_streaminfo(n), _frame_header(n), fw)
    dec, _ = FL.decode_flac(b)
    assert (dec[:, 0] == -1234).all()


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    rng = np.random.RandomState(order)
    n = 80
    # smooth signal keeps residuals small
    s = np.cumsum(rng.randint(-20, 21, n)).astype(np.int64) + 100
    coefs = FIXED_COEFS[order]
    resid = [
        int(s[i] - sum(c * s[i - 1 - j] for j, c in enumerate(coefs)))
        for i in range(order, n)
    ]
    fw = FL._BitsW()
    fw.write(0, 1)
    fw.write(8 + order, 6)  # FIXED
    fw.write(0, 1)
    for w in s[:order]:
        fw.write(int(w) & 0xFFFF, 16)
    _residual_block(fw, resid, param=6)
    b = _finish(_streaminfo(n), _frame_header(n), fw)
    dec, _ = FL.decode_flac(b)
    assert np.array_equal(dec[:, 0], s), f"order {order}"


def test_lpc_subframe():
    rng = np.random.RandomState(9)
    n, order, shift, prec = 60, 3, 5, 12
    coefs = [19, -7, 3]
    s = np.zeros(n, dtype=np.int64)
    s[:order] = rng.randint(-500, 500, order)
    resid = []
    for i in range(order, n):
        pred = sum(c * int(s[i - 1 - j]) for j, c in enumerate(coefs)) >> shift
        e = rng.randint(-30, 30)
        s[i] = pred + e
        resid.append(e)
    fw = FL._BitsW()
    fw.write(0, 1)
    fw.write(32 + order - 1, 6)  # LPC
    fw.write(0, 1)
    for w in s[:order]:
        fw.write(int(w) & 0xFFFF, 16)
    fw.write(prec - 1, 4)
    fw.write(shift, 5)
    for c in coefs:
        fw.write(c & ((1 << prec) - 1), prec)
    _residual_block(fw, resid, param=5, method=1)  # rice5 path
    b = _finish(_streaminfo(n), _frame_header(n), fw)
    dec, _ = FL.decode_flac(b)
    assert np.array_equal(dec[:, 0], s)


def test_rice_escape_partition():
    n = 16
    vals = [1000, -2000, 3000, 4095, -4096, 7, 0, 42] * 2
    fw = FL._BitsW()
    fw.write(0, 1)
    fw.write(8, 6)  # FIXED order 0 (residual == signal)
    fw.write(0, 1)
    fw.write(0, 2)  # rice4
    fw.write(0, 4)  # partition order 0
    fw.write(15, 4)  # ESCAPE
    fw.write(14, 5)  # raw 14-bit residuals
    for v in vals:
        fw.write(v & 0x3FFF, 14)
    b = _finish(_streaminfo(n), _frame_header(n), fw)
    dec, _ = FL.decode_flac(b)
    assert dec[:, 0].tolist() == vals


def test_wasted_bits():
    n = 12
    s = np.arange(n, dtype=np.int64) * 8  # low 3 bits zero
    fw = FL._BitsW()
    fw.write(0, 1)
    fw.write(1, 6)  # VERBATIM
    fw.write(1, 1)  # wasted-bits flag
    fw.write(0, 2)  # unary 3: two 0s then 1
    fw.write(1, 1)
    for v in s >> 3:
        fw.write(int(v) & 0x1FFF, 13)  # 16 - 3 wasted
    b = _finish(_streaminfo(n), _frame_header(n), fw)
    dec, _ = FL.decode_flac(b)
    assert np.array_equal(dec[:, 0], s)


@pytest.mark.parametrize("mode", [8, 9, 10])
def test_stereo_decorrelation(mode):
    rng = np.random.RandomState(mode)
    n = 40
    left = rng.randint(-1000, 1000, n).astype(np.int64)
    right = rng.randint(-1000, 1000, n).astype(np.int64)
    side = left - right
    if mode == 8:
        chans = [(left, 16), (side, 17)]
    elif mode == 9:
        chans = [(side, 17), (right, 16)]
    else:
        mid = (left + right) >> 1
        chans = [(mid, 16), (side, 17)]
    fw = FL._BitsW()
    for sig, bits in chans:
        fw.write(0, 1)
        fw.write(1, 6)
        fw.write(0, 1)
        for v in sig:
            fw.write(int(v) & ((1 << bits) - 1), bits)
    b = _finish(
        _streaminfo(n, channels=2),
        _frame_header(n, channels=2, chan_code=mode),
        fw,
    )
    dec, _ = FL.decode_flac(b)
    assert np.array_equal(dec[:, 0], left), mode
    assert np.array_equal(dec[:, 1], right), mode


def test_crc_enforced():
    b = bytearray(FL.encode_flac_verbatim(np.arange(100), 8000))
    b[-10] ^= 0xFF  # corrupt frame payload
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(b))
    with pytest.raises(ValueError, match="not a FLAC"):
        FL.decode_flac(b"RIFFxxxxWAVE")


def test_unknown_total_samples_decodes_to_eof():
    # STREAMINFO total == 0 means UNKNOWN (live encodes): frames must
    # still decode. Patch the encoder's total field to zero.
    sig = np.arange(300, dtype=np.int64) - 150
    b = bytearray(FL.encode_flac_verbatim(sig, 8000, block_size=64))
    # STREAMINFO body starts at 8; total_samples = last 36 bits of the
    # 18-byte fixed header region: bits 108..143 -> bytes 13..17 hold
    # (4 bits of rate/ch/bits packing + 36 bits total). Zero the last
    # 4.5 bytes' total portion: byte 13 low nibble + bytes 14-17.
    b[8 + 13] &= 0xF0
    for i in range(14, 18):
        b[8 + i] = 0
    assert FL.parse_flac_streaminfo(bytes(b))[3] == 0
    dec, rate = FL.decode_flac(bytes(b))
    assert rate == 8000
    assert np.array_equal(dec[:, 0], sig)
