"""Baseline JPEG codec: roundtrips, subsampling, restarts, gating."""

import numpy as np
import pytest

from dataset_grouper_spark.operators import jpeg as J
from dataset_grouper_spark.operators import multimodal as mm

Q1 = [1] * 64
Q8 = [8] * 64


def test_constant_blocks_exact_420():
    # 8x8-constant mosaics with DC quant 8 survive the DCT+quant
    # roundtrip EXACTLY — the closed-form-oracle fixture class
    img = np.zeros((16, 32, 3), dtype=np.uint8)
    for by in range(2):
        for bx in range(4):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                40 * bx + 17 * by + 30
            )
    out = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels(img, "4:2:0", qtables=(Q8, Q8))
    )
    assert np.array_equal(out, img)


def test_random_444_q1_near_lossless():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    out = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels(img, "4:4:4", qtables=(Q1, Q1))
    )
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_annex_k_gradient_low_error():
    yy, xx = np.mgrid[0:33, 0:45]
    img = np.stack(
        [(xx * 3) % 256, (yy * 2 + 40) % 256, (xx + yy) % 256], 2
    ).astype(np.uint8)
    out = J.decode_jpeg_pixels(J.encode_jpeg_pixels(img, "4:2:0"))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_restart_markers_decode_identically():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    plain = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels(img, "4:4:4", qtables=(Q1, Q1))
    )
    rst = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels(
            img, "4:4:4", qtables=(Q1, Q1), restart_interval=3
        )
    )
    assert np.array_equal(plain, rst)


def test_422_constant_chroma_exact():
    # constant chroma survives box subsampling + replication exactly
    img = np.zeros((8, 48, 3), dtype=np.uint8)
    img[:, :, 0] = 90
    img[:, :, 1] = 90
    img[:, :, 2] = 90
    out = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels(img, "4:2:2", qtables=(Q8, Q8))
    )
    assert np.array_equal(out, img)


def test_odd_dims_padded_and_cropped():
    img = np.full((13, 21, 3), 77, dtype=np.uint8)
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        out = J.decode_jpeg_pixels(
            J.encode_jpeg_pixels(img, sub, qtables=(Q8, Q8))
        )
        assert out.shape == (13, 21, 3), sub
        assert np.array_equal(out, img), sub


def test_grayscale_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    out = J.decode_jpeg_pixels(J.encode_jpeg_gray(img, Q1))
    assert out.shape == (17, 19, 3)
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 2
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_progressive_and_garbage_rejected():
    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    b = bytearray(J.encode_jpeg_pixels(img, "4:4:4"))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    assert J.decode_jpeg_pixels(bytes(b)) is None
    assert J.decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert J.decode_jpeg_pixels(b"not a jpeg") is None


def test_sixteen_bit_dqt_accepted():
    img = np.full((8, 8, 3), 120, dtype=np.uint8)
    b = J.encode_jpeg_pixels(img, "4:4:4", qtables=(Q8, Q8))
    # rewrite the two 8-bit DQT segments as 16-bit precision ones
    out = bytearray()
    i = 0
    while i < len(b):
        if b[i] == 0xFF and b[i + 1] == 0xDB:
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            tq = b[i + 4] & 0x0F
            vals = b[i + 5 : i + 5 + 64]
            payload = bytes([0x10 | tq]) + b"".join(
                v.to_bytes(2, "big") for v in vals
            )
            out += bytes([0xFF, 0xDB]) + (len(payload) + 2).to_bytes(
                2, "big"
            ) + payload
            i += 2 + seglen
        else:
            out.append(b[i])
            i += 1
    got = J.decode_jpeg_pixels(bytes(out))
    assert np.array_equal(got, img)


def test_decode_pixels_routes_jpeg_and_resize(spark):
    from pyspark.sql import functions as F

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :, :] = 64
    img[8:, :, :] = 192
    jb = J.encode_jpeg_pixels(img, "4:2:0", qtables=(Q8, Q8))
    arr = mm.decode_pixels(jb)
    assert np.array_equal(arr, img)
    arr2, fmt = mm._decode_any(jb)
    assert fmt == "bmp" and np.array_equal(arr2, img)
    df = spark.createDataFrame(
        [(1, bytearray(jb))], "doc_id long, content binary"
    )
    out = mm.resize_images(df, "content", "doc_id", 4, 4).collect()[0]
    s, c = mm._pixel_checksum(mm.nn_resize(img, 4, 4))
    assert (out["pixel_sum"], out["checksum"]) == (s, c)


def test_fixed_point_ycbcr_matches_formula():
    # the cross-engine contract: R/G/B from integer floor arithmetic
    y = np.array([[100]], dtype=np.int32)
    cb = np.array([[90]], dtype=np.int32)
    cr = np.array([[200]], dtype=np.int32)
    out = J._ycbcr_to_rgb_fixed(y, cb, cr)
    r = 100 + (91881 * (200 - 128) + 32768) // 65536
    g = 100 - ((22554 * (90 - 128) + 46802 * (200 - 128) + 32768) // 65536)
    b = 100 + (116130 * (90 - 128) + 32768) // 65536
    expect = [max(0, min(255, v)) for v in (r, g, b)]
    assert out[0, 0].tolist() == expect
