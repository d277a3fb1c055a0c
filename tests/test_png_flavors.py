"""PNG color-type coverage: grayscale (1/2/4/8-bit), palette
(1/2/4/8-bit), gray+alpha — hand-built chunks, every raster checked
against the generating array. 16-bit and Adam7 stay gated."""

import struct
import zlib

import numpy as np
import pytest

from dataset_grouper_spark.operators import multimodal as M


def _chunk(typ, data):
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png(w, h, depth, ctype, raster_rows, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in raster_rows)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _pack_bits(vals, depth, w):
    per = 8 // depth
    rows = []
    for row in vals:
        rb = bytearray()
        for px0 in range(0, w, per):
            v = 0
            for sub in range(per):
                if px0 + sub < w:
                    v |= int(row[px0 + sub]) << (8 - depth * (sub + 1))
            rb.append(v)
        rows.append(bytes(rb))
    return rows


def test_gray8():
    g = np.random.RandomState(0).randint(0, 256, (4, 5)).astype(np.uint8)
    d = M.decode_png_pixels(_png(5, 4, 8, 0, [g[y].tobytes() for y in range(4)]))
    assert np.array_equal(d[:, :, 0], g)
    assert np.array_equal(d[:, :, 0], d[:, :, 1])
    assert np.array_equal(d[:, :, 0], d[:, :, 2])


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_gray_subbyte_scales_to_full_range(depth):
    rng = np.random.RandomState(depth)
    w, h = 9, 3
    vals = rng.randint(0, 1 << depth, (h, w))
    d = M.decode_png_pixels(_png(w, h, depth, 0, _pack_bits(vals, depth, w)))
    expect = (vals * 255 // ((1 << depth) - 1)).astype(np.uint8)
    assert np.array_equal(d[:, :, 0], expect)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette(depth):
    rng = np.random.RandomState(depth + 10)
    npal = min(1 << depth, 7)
    pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
    w, h = 11, 4
    idx = rng.randint(0, npal, (h, w))
    rows = (
        [idx[y].astype(np.uint8).tobytes() for y in range(h)]
        if depth == 8
        else _pack_bits(idx, depth, w)
    )
    d = M.decode_png_pixels(_png(w, h, depth, 3, rows, plte=pal.tobytes()))
    assert np.array_equal(d, pal[idx])


def test_palette_missing_plte_rejected():
    assert M.decode_png_pixels(_png(2, 2, 8, 3, [b"\x00\x00"] * 2)) is None


def test_palette_index_out_of_range_rejected():
    pal = bytes(6)  # two entries
    bad = _png(2, 1, 8, 3, [b"\x00\x05"], plte=pal)
    assert M.decode_png_pixels(bad) is None


def test_gray_alpha_drops_alpha():
    ga = np.random.RandomState(3).randint(0, 256, (2, 3, 2)).astype(np.uint8)
    d = M.decode_png_pixels(
        _png(3, 2, 8, 4, [ga[y].tobytes() for y in range(2)])
    )
    assert np.array_equal(d[:, :, 0], ga[:, :, 0])


def test_filters_on_single_byte_pixels():
    # Sub/Average/Paeth with bypp=1 (gray) — serial unfilter offsets
    g = np.random.RandomState(5).randint(0, 256, (5, 8)).astype(np.uint8)
    filt = []
    prev = np.zeros(8, dtype=np.int64)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = g[y].astype(np.int64)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = (cur - np.concatenate([[0], cur[:-1]])) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([[0], cur[:-1]])
            enc = (cur - (left + prev) // 2) % 256
        else:
            enc = np.zeros(8, dtype=np.int64)
            for x in range(8):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pred) % 256
        filt.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 8, 5, 8, 0, 0, 0, 0)
    raw = b"".join(filt)
    b = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    d = M.decode_png_pixels(b)
    assert np.array_equal(d[:, :, 0], g)


def test_16bit_gray_keeps_high_byte():
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1 << 16, (3, 4))
    rows = [vals[y].astype(">u2").tobytes() for y in range(3)]
    d = M.decode_png_pixels(_png(4, 3, 16, 0, rows))
    assert np.array_equal(d[:, :, 0], (vals >> 8).astype(np.uint8))


def test_16bit_rgb():
    rng = np.random.RandomState(9)
    vals = rng.randint(0, 1 << 16, (2, 3, 3))
    rows = [vals[y].astype(">u2").tobytes() for y in range(2)]
    d = M.decode_png_pixels(_png(3, 2, 16, 2, rows))
    assert np.array_equal(d, (vals >> 8).astype(np.uint8))


def _adam7_png(img, depth=8, ctype=2):
    """Build an Adam7-interlaced PNG from an (H, W, spp) array."""
    h, w = img.shape[:2]
    spp = 1 if img.ndim == 2 else img.shape[2]
    raw = b""
    for (x0, xs, y0, ys) in M._ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for y in range(sub.shape[0]):
            raw += b"\x00" + sub[y].astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (8, 8), (10, 13)])
def test_adam7_rgb(h, w):
    img = np.random.RandomState(h * w).randint(0, 256, (h, w, 3)).astype(
        np.uint8
    )
    d = M.decode_png_pixels(_adam7_png(img))
    assert d is not None and np.array_equal(d, img)


def test_adam7_gray():
    g = np.random.RandomState(2).randint(0, 256, (9, 6)).astype(np.uint8)
    d = M.decode_png_pixels(_adam7_png(g, ctype=0))
    assert np.array_equal(d[:, :, 0], g)


def test_invalid_combos_rejected():
    # palette cannot be 16-bit per spec
    assert M.decode_png_pixels(_png(2, 2, 16, 3, [b"\x00" * 8] * 2)) is None
    # truncated IDAT stream
    good = _png(4, 4, 8, 0, [bytes(4)] * 4)
    assert M.decode_png_pixels(good[:40]) is None
