"""GIF LZW codec: roundtrip, spec sync, compositing, operator wiring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import multimodal as mm


def _palette(n=256):
    i = np.arange(n, dtype=np.int64)
    return np.stack([i % 256, (i * 3) % 256, (i * 7) % 256], 1).astype(
        np.uint8
    )


def test_lzw_roundtrip_small_alphabet_long_stream():
    # small alphabet + long stream forces width growth through every
    # boundary and a dictionary reset past 4096
    rng = np.random.default_rng(7)
    data = rng.integers(0, 4, size=30_000, dtype=np.uint8).tobytes()
    enc = mm._lzw_encode(data, 2)
    assert mm._lzw_decode(enc, 2, len(data)) == data
    # the stream must actually compress (dictionary really in use)
    assert len(enc) < len(data)


def test_lzw_roundtrip_full_byte_alphabet():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 256, size=5_000, dtype=np.uint8).tobytes()
    enc = mm._lzw_encode(data, 8)
    assert mm._lzw_decode(enc, 8, len(data)) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' exercises the code==len(dict) (KwKwK) branch immediately
    data = b"\x00" * 50
    enc = mm._lzw_encode(data, 2)
    assert mm._lzw_decode(enc, 2, len(data)) == data


def test_lzw_rejects_wrong_length_and_garbage():
    data = b"\x00\x01\x02\x03" * 10
    enc = mm._lzw_encode(data, 2)
    assert mm._lzw_decode(enc, 2, len(data) + 1) is None
    assert mm._lzw_decode(b"\xff\xff\xff\xff", 2, 100) is None


def test_gif_matches_bmp_path_on_identical_raster():
    # property demanded by the verdict: GIF vs BMP decode identical
    # rasters byte-for-byte
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, size=(11, 13), dtype=np.uint8)
    pal = _palette()
    rgb = pal[idx]
    gif = mm.encode_gif_pixels([idx], pal)
    bmp = mm.encode_bmp_pixels(rgb)
    out_gif = mm.decode_pixels(gif)
    out_bmp = mm.decode_pixels(bmp)
    assert out_gif is not None and out_bmp is not None
    assert np.array_equal(out_gif, out_bmp)
    assert np.array_equal(out_gif, rgb)


def test_gif_interlaced_decodes_identically():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 64, size=(16, 9), dtype=np.uint8)
    pal = _palette(64)
    plain = mm.decode_gif_frames(mm.encode_gif_pixels([idx], pal))
    inter = mm.decode_gif_frames(
        mm.encode_gif_pixels([idx], pal, interlace=True)
    )
    assert np.array_equal(plain[0], inter[0])


def test_gif_small_palette_uses_local_min_code_size():
    # 4-color palette -> 2-bit codes; dims not multiples of 8
    idx = (np.add.outer(np.arange(5), np.arange(7)) % 4).astype(np.uint8)
    pal = _palette(4)
    frames = mm.decode_gif_frames(mm.encode_gif_pixels([idx], pal))
    assert np.array_equal(frames[0], pal[idx])


def test_gif_animation_compositing_transparency_and_disposal():
    pal = _palette(8)
    # frame 0: full 6x8 canvas of color 1
    f0 = np.full((6, 8), 1, dtype=np.uint8)
    # frame 1: 2x3 patch at (left=2, top=1) of color 2 with transparent
    # holes (index 7) — holes must show frame 0's color through
    f1 = np.array([[2, 7, 2], [7, 2, 7]], dtype=np.uint8)
    gif = mm.encode_gif_pixels(
        [f0, f1],
        pal,
        transparent=7,
        disposals=[1, 0],
        offsets=[(0, 0), (2, 1)],
        screen=(8, 6),
    )
    frames = mm.decode_gif_frames(gif)
    assert len(frames) == 2
    assert np.array_equal(frames[0], pal[f0])
    expect = pal[f0].copy()
    patch = expect[1:3, 2:5]
    mask = f1 != 7
    patch[mask] = pal[f1][mask]
    assert np.array_equal(frames[1], expect)


def test_gif_disposal_background_and_previous():
    pal = _palette(8)
    base = np.full((4, 4), 3, dtype=np.uint8)
    patch = np.full((2, 2), 5, dtype=np.uint8)
    # disposal=2 on the patch frame: frame 2's canvas shows the patch
    # rect restored to the BACKGROUND color (index 0)
    gif = mm.encode_gif_pixels(
        [base, patch, patch],
        pal,
        disposals=[1, 2, 0],
        offsets=[(0, 0), (1, 1), (0, 0)],
        screen=(4, 4),
    )
    frames = mm.decode_gif_frames(gif)
    assert (frames[1][1:3, 1:3] == pal[5]).all()
    # frame 2's canvas: base everywhere, the disposed patch rect
    # restored to background (index 0), then the new patch at (0,0)
    expect = np.tile(pal[3], (4, 4, 1)).astype(np.uint8)
    expect[1:3, 1:3] = pal[0]
    expect[0:2, 0:2] = pal[5]
    assert np.array_equal(frames[2], expect)
    # disposal=3: restore-to-previous — after the patch frame the
    # canvas must revert to the base raster
    gif3 = mm.encode_gif_pixels(
        [base, patch, base],
        pal,
        disposals=[1, 3, 0],
        offsets=[(0, 0), (1, 1), (0, 0)],
        screen=(4, 4),
    )
    f = mm.decode_gif_frames(gif3)
    assert np.array_equal(f[2], pal[base])


def test_gif_frame_walk_agrees_with_pixel_decode():
    pal = _palette(16)
    frames_in = [
        (np.arange(12, dtype=np.uint8) % 16).reshape(3, 4) for _ in range(3)
    ]
    gif = mm.encode_gif_pixels(frames_in, pal)
    walk = mm.gif_frame_walk(gif)
    dec = mm.decode_gif_frames(gif)
    assert walk[0] == len(dec) == 3
    assert walk[2] is True


def test_decode_any_gif_and_resize(spark):
    pal = _palette()
    idx = (np.add.outer(np.arange(10), np.arange(12)) % 256).astype(
        np.uint8
    )
    gif = mm.encode_gif_pixels([idx], pal)
    arr, fmt = mm._decode_any(gif)
    assert fmt == "bmp" and np.array_equal(arr, pal[idx])
    df = spark.createDataFrame([(1, bytearray(gif))], "doc_id long, content binary")
    out = mm.resize_images(df, "content", "doc_id", 4, 4).collect()[0]
    expect = mm.nn_resize(pal[idx], 4, 4)
    s, c = mm._pixel_checksum(expect)
    assert (out["pixel_sum"], out["checksum"]) == (s, c)
    assert mm.decode_pixels(bytes(out["content"])).shape == (4, 4, 3)


def test_gif_frame_pixels_operator(spark):
    pal = _palette(32)
    mk = lambda seed: (
        np.random.default_rng(seed).integers(0, 32, (5, 6), dtype=np.uint8)
    )
    g1 = mm.encode_gif_pixels([mk(1), mk(2)], pal)
    rows = [(1, bytearray(g1)), (2, bytearray(b"not a gif"))]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        (r["id"], r["frame"]): (r["pixel_sum"], r["checksum"])
        for r in mm.gif_frame_pixels(df, "content", "doc_id").collect()
    }
    s1, c1 = mm._pixel_checksum(pal[mk(1)])
    s2, c2 = mm._pixel_checksum(pal[mk(2)])
    assert got[(1, 0)] == (s1, c1)
    assert got[(1, 1)] == (s2, c2)
    assert got[(2, None)] == (None, None)
