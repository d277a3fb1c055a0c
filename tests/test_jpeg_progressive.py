"""Progressive (SOF2) JPEG: decode must bit-match baseline decode.

The codec law: the progressive encoder emits the SAME quantized
coefficients as the baseline encoder, so for any input the two decodes
must be IDENTICAL arrays — exercising spectral selection, successive
approximation (DC + AC refinement, correction bits), EOB runs, ZRL in
refinement, all subsamplings, and odd dimensions.
"""

import numpy as np
import pytest

from dataset_grouper_spark.operators import jpeg as J


def _img(h, w, seed=0, noise=30):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 100 * np.sin(xx / 7) * np.cos(yy / 5)).astype(int)
    return np.clip(
        base[:, :, None] + rng.randint(-noise, noise + 1, (h, w, 3)), 0, 255
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "h,w,sub",
    [
        (40, 56, "4:2:0"),
        (33, 41, "4:2:2"),
        (16, 16, "4:4:4"),
        (7, 9, "4:2:0"),     # smaller than one MCU
        (64, 64, "4:2:0"),
    ],
)
def test_progressive_equals_baseline(h, w, sub):
    img = _img(h, w, seed=h * w)
    d_base = J.decode_jpeg_pixels(J.encode_jpeg_pixels(img, subsampling=sub))
    d_prog = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels_progressive(img, subsampling=sub)
    )
    assert d_prog is not None
    assert np.array_equal(d_base, d_prog)


def test_sparse_image_exercises_eob_runs():
    # almost-flat image -> long cross-block EOB runs in every AC scan
    img = np.full((48, 48, 3), 200, np.uint8)
    img[10, 10] = [0, 255, 0]
    img[40, 5] = [255, 0, 0]
    d_base = J.decode_jpeg_pixels(J.encode_jpeg_pixels(img))
    d_prog = J.decode_jpeg_pixels(J.encode_jpeg_pixels_progressive(img))
    assert np.array_equal(d_base, d_prog)


def test_spectral_selection_only_script():
    scans = [
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
    ]
    img = _img(20, 28, seed=3, noise=120)
    d_base = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels(img, subsampling="4:4:4")
    )
    d_prog = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels_progressive(
            img, subsampling="4:4:4", scans=scans
        )
    )
    assert np.array_equal(d_base, d_prog)


def test_deep_successive_approximation():
    # three AC refinement levels on luma: Al 3 -> 2 -> 1 -> 0
    scans = [
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 63, 0, 3),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0,), 1, 63, 3, 2),
        ((0,), 1, 63, 2, 1),
        ((0,), 1, 63, 1, 0),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
    ]
    img = _img(32, 40, seed=9, noise=90)
    d_base = J.decode_jpeg_pixels(J.encode_jpeg_pixels(img))
    d_prog = J.decode_jpeg_pixels(
        J.encode_jpeg_pixels_progressive(img, scans=scans)
    )
    assert np.array_equal(d_base, d_prog)


def test_high_contrast_noise_all_magnitudes():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        d_base = J.decode_jpeg_pixels(
            J.encode_jpeg_pixels(img, subsampling=sub)
        )
        d_prog = J.decode_jpeg_pixels(
            J.encode_jpeg_pixels_progressive(img, subsampling=sub)
        )
        assert np.array_equal(d_base, d_prog), sub


def test_progressive_flag_routes_and_size():
    img = _img(16, 24)
    b = J.encode_jpeg_pixels_progressive(img)
    # SOF2 marker present, SOF0 absent
    assert b"\xff\xc2" in b and b"\xff\xc0" not in b
    d = J.decode_jpeg_pixels(b)
    assert d is not None and d.shape == (16, 24, 3)


def test_multimodal_route_decodes_progressive():
    from dataset_grouper_spark.operators import multimodal

    img = _img(16, 16)
    b = J.encode_jpeg_pixels_progressive(img)
    px = multimodal.decode_pixels(b)
    assert px is not None and px.shape == (16, 16, 3)
    assert np.array_equal(px, J.decode_jpeg_pixels(b))


def test_arithmetic_and_lossless_still_gated():
    img = _img(16, 16)
    b = bytearray(J.encode_jpeg_pixels_progressive(img))
    i = bytes(b).index(b"\xff\xc2")
    for bad in (0xC3, 0xC9, 0xCB):  # lossless / arithmetic variants
        b2 = bytearray(b)
        b2[i + 1] = bad
        assert J.decode_jpeg_pixels(bytes(b2)) is None
