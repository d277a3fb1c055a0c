"""Video modality: concatenated-PPM container walk + frame sampling."""

import numpy as np

from dataset_grouper_spark.operators import multimodal


def _frame(seed, w=4, h=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def _video(frames):
    return b"".join(multimodal.encode_ppm_pixels(f) for f in frames)


def test_iter_ppm_frames_walks_all():
    frames = [_frame(i) for i in range(4)]
    out = list(multimodal.iter_ppm_frames(_video(frames)))
    assert [o[0] for o in out] == [0, 1, 2, 3]
    for (idx, w, h, fb), src in zip(out, frames):
        assert (w, h) == (4, 3)
        np.testing.assert_array_equal(multimodal.decode_pixels(fb), src)


def test_iter_ppm_frames_mixed_dims():
    frames = [_frame(0, 4, 3), _frame(1, 7, 5), _frame(2, 2, 2)]
    out = list(multimodal.iter_ppm_frames(_video(frames)))
    assert [(w, h) for _, w, h, _ in out] == [(4, 3), (7, 5), (2, 2)]


def test_iter_ppm_frames_truncated_tail_degrades():
    frames = [_frame(0), _frame(1)]
    b = _video(frames)[:-5]  # cut into the second raster
    out = list(multimodal.iter_ppm_frames(b))
    assert len(out) == 1  # first frame intact, corrupt tail dropped


def test_iter_ppm_frames_garbage_returns_nothing():
    assert list(multimodal.iter_ppm_frames(b"\x00\x01not a ppm")) == []


def test_sample_video_frames_every_k(spark):
    frames = [_frame(i) for i in range(5)]
    df = spark.createDataFrame(
        [(9, bytearray(_video(frames)))], "doc_id long, content binary"
    )
    out = multimodal.sample_video_frames(df, "content", "doc_id", every_k=2)
    rows = sorted(out.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r, i in zip(rows, (0, 2, 4)):
        s, ck = multimodal._pixel_checksum(frames[i])
        assert (r["pixel_sum"], r["checksum"]) == (s, ck)
        assert (r["width"], r["height"]) == (4, 3)


def test_gif_frame_walk_counts_frames():
    b = multimodal.encode_gif_frames(4, 3, 5)
    assert multimodal.gif_frame_walk(b) == (5, 5, True)
    b2 = multimodal.encode_gif_frames(4, 3, 1, animated=False)
    assert multimodal.gif_frame_walk(b2) == (1, 0, True)


def test_gif_frame_walk_with_global_color_table():
    b = bytearray(multimodal.encode_gif_frames(2, 2, 3))
    # set global color table flag (2 colors -> 6 bytes) and splice it
    b[10] |= 0x80
    b2 = bytes(b[:13]) + b"\x00" * 6 + bytes(b[13:])
    assert multimodal.gif_frame_walk(b2) == (3, 3, True)


def test_gif_frame_walk_truncated_degrades():
    b = multimodal.encode_gif_frames(4, 3, 4)
    cut = b[: len(b) // 2]
    res = multimodal.gif_frame_walk(cut)
    assert res is not None
    frames, _, trailer = res
    assert 0 < frames < 4 and not trailer


def test_gif_frame_walk_rejects_non_gif():
    assert multimodal.gif_frame_walk(b"P6\n1 1\n255\n\x00\x00\x00") is None


def test_ppm_walker_handles_crlf_separator():
    from dataset_grouper_spark.operators.multimodal import (
        decode_pixels,
        iter_ppm_frames,
    )

    # two frames written with CRLF after maxval (Windows-style writer):
    # the LF belongs to the separator; a one-byte-early slice would
    # shift every pixel and lose the second frame entirely
    raster1 = bytes(range(12))
    raster2 = bytes(range(100, 112))
    video = (
        b"P6\n2 2\n255\r\n" + raster1 + b"P6\n2 2\n255\r\n" + raster2
    )
    frames = list(iter_ppm_frames(video))
    assert [(f[0], f[1], f[2]) for f in frames] == [(0, 2, 2), (1, 2, 2)]
    px0 = decode_pixels(frames[0][3])
    px1 = decode_pixels(frames[1][3])
    assert bytes(px0.flatten().tolist()) == raster1
    assert bytes(px1.flatten().tolist()) == raster2


def test_ppm_walker_cr_only_separator_with_lf_raster():
    from dataset_grouper_spark.operators.multimodal import iter_ppm_frames

    # CR-only separator where the raster STARTS with 0x0A: the walker
    # must NOT consume the raster's first byte as part of a CRLF pair
    # (the frame-boundary check disambiguates)
    raster = bytes([0x0A, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11])
    video = b"P6\n2 2\n255\r" + raster
    frames = list(iter_ppm_frames(video))
    assert len(frames) == 1
    assert frames[0][3].endswith(raster)
