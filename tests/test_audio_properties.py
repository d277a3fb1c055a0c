"""Property-based audio-codec and structure-walk tests (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dataset_grouper_spark.operators import audio, multimodal


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 16000, 22050, 44100]),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_bit_exact(seed, n, ch, rate):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch)).astype(np.int64)
    b = audio.encode_wav_pcm16(s, rate)
    dec, r = audio.decode_wav_pcm(b)
    assert r == rate
    np.testing.assert_array_equal(dec, s)
    hdr = audio.parse_wav_header(b)
    assert hdr[:4] == (ch, rate, 16, n)


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=1, max_value=300),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=15, deadline=None)
def test_nonoverlapping_frames_conserve_energy(spark, seed, n, frame_len):
    """hop == frame_len tiles the signal exactly once: frame energies
    must sum to the file's total energy and n_samples to its length —
    an off-by-one in the tiling loses or double-counts samples."""
    rng = np.random.default_rng(seed)
    s = rng.integers(-2000, 2000, n).astype(np.int64)
    df = spark.createDataFrame(
        [(1, bytearray(audio.encode_wav_pcm16(s, 8000)))],
        "id long, content binary",
    )
    frames = audio.frame_energy(df, "content", "id", frame_len).collect()
    assert sum(r["n_samples"] for r in frames) == n
    assert sum(r["energy"] for r in frames) == int((s * s).sum())
    assert len(frames) == -(-n // frame_len)


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=1, max_value=8),
    st.booleans(),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)
@settings(max_examples=100, deadline=None)
def test_gif_walk_counts_whatever_we_encode(seed, n_frames, animated, w, h):
    b = multimodal.encode_gif_frames(w, h, n_frames, animated=animated)
    frames, exts, trailer = multimodal.gif_frame_walk(b)
    assert frames == n_frames
    assert exts == (n_frames if animated else 0)
    assert trailer
    # arbitrary truncation never crashes and never overcounts
    rng = np.random.default_rng(seed)
    cut = int(rng.integers(0, len(b)))
    res = multimodal.gif_frame_walk(b[:cut])
    if res is not None:
        assert res[0] <= n_frames


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_ppm_video_walk_roundtrip(seed, n_frames):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (int(rng.integers(1, 8)), int(rng.integers(1, 8)), 3)).astype(
            np.uint8
        )
        for _ in range(n_frames)
    ]
    blob = b"".join(multimodal.encode_ppm_pixels(f) for f in frames)
    out = list(multimodal.iter_ppm_frames(blob))
    assert len(out) == n_frames
    for (idx, w, h, fb), src in zip(out, frames):
        np.testing.assert_array_equal(multimodal.decode_pixels(fb), src)
