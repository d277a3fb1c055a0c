"""IMA/DVI ADPCM WAV codec: independent-reference agreement + ops."""

import struct

import numpy as np
import pytest

from dataset_grouper_spark.operators import audio as A

# Independent scalar reference, written directly from the IMA ADPCM
# spec (step/index tables + nibble expansion) — NOT from the numpy
# production decoder. Agreement between the two is the codec test.
STEPS = [int(s) for s in A.IMA_STEP_TABLE]
IDX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def ref_expand(nibbles, pred, index):
    out = [pred]
    for n in nibbles:
        step = STEPS[index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        index = max(0, min(88, index + IDX[n]))
        out.append(pred)
    return out, index


def ref_decode_mono(b):
    hdr = A.parse_wav_adpcm_header(b)
    channels, rate, block_align, n_samples, off, data_len = hdr
    assert channels == 1
    raw = b[off : off + data_len]
    out = []
    for s in range(0, len(raw), block_align):
        blk = raw[s : s + block_align]
        pred, index, _ = struct.unpack("<hBB", blk[:4])
        nibs = []
        for byte in blk[4:]:
            nibs += [byte & 0xF, byte >> 4]
        vals, _ = ref_expand(nibs, pred, min(index, 88))
        out += vals
    return out[:n_samples], rate


def test_decode_matches_scalar_reference():
    rng = np.random.RandomState(5)
    sig = (2000 * np.sin(np.arange(3000) / 15)).astype(int) + rng.randint(
        -300, 300, 3000
    )
    b = A.encode_wav_ima_adpcm(sig, 8000, block_frames=505)
    fast, rate = A.decode_wav_ima_adpcm(b)
    slow, rrate = ref_decode_mono(b)
    assert rate == rrate == 8000
    assert fast[:, 0].tolist() == slow


def test_roundtrip_tracks_signal():
    t = np.arange(4000)
    sig = (5000 * np.sin(t / 40)).astype(int)
    b = A.encode_wav_ima_adpcm(sig, 16000)
    dec, _ = A.decode_wav_ima_adpcm(b)
    assert dec.shape == (4000, 1)
    err = np.abs(dec[:, 0] - sig)
    # smooth signal: ADPCM tracks within a small fraction of amplitude
    assert err.max() < 500 and err.mean() < 50


def test_fact_chunk_trims_padded_tail():
    sig = np.arange(600) % 100  # not a multiple of block_frames
    b = A.encode_wav_ima_adpcm(sig, 8000, block_frames=505)
    hdr = A.parse_wav_adpcm_header(b)
    assert hdr[3] == 600  # fact chunk wins over 2 * 505
    dec, _ = A.decode_wav_ima_adpcm(b)
    assert len(dec) == 600


def test_stereo_interleave():
    t = np.arange(2020)
    left = (1500 * np.sin(t / 30)).astype(int)
    right = (800 * np.cos(t / 50)).astype(int)
    b = A.encode_wav_ima_adpcm(np.column_stack([left, right]), 22050)
    dec, rate = A.decode_wav_ima_adpcm(b)
    assert rate == 22050 and dec.shape == (2020, 2)
    # channels decode independently; each tracks its own signal
    assert np.abs(dec[:, 0] - left).mean() < 20
    assert np.abs(dec[:, 1] - right).mean() < 20
    # and are not swapped
    assert np.abs(dec[:, 0] - left).mean() < np.abs(dec[:, 0] - right).mean()


def test_extremes_clamp_not_wrap():
    sig = np.array([0, 32767, -32768, 32767, -32768] * 200)
    b = A.encode_wav_ima_adpcm(sig, 8000)
    dec, _ = A.decode_wav_ima_adpcm(b)
    assert int(dec.max()) <= 32767 and int(dec.min()) >= -32768


def test_zero_signal_exact():
    b = A.encode_wav_ima_adpcm(np.zeros(1009, int), 8000)
    dec, _ = A.decode_wav_ima_adpcm(b)
    assert not dec.any()


def test_router_dispatch_and_invalid():
    pcm = A.encode_wav_pcm16(np.arange(100), 8000)
    _, _, bits = A.decode_wav_any(pcm)
    assert bits == 16
    adp = A.encode_wav_ima_adpcm(np.arange(100), 8000, block_frames=9)
    _, _, bits = A.decode_wav_any(adp)
    assert bits == 4
    with pytest.raises(ValueError):
        A.decode_wav_any(b"JUNK" * 30)
    # a PCM header never routes to the ADPCM parser and vice versa
    assert A.parse_wav_adpcm_header(pcm) is None
    assert A.parse_wav_header(adp) is None


def test_features_over_adpcm(spark):
    sig = (1000 + 200 * np.sin(np.arange(1009) / 10)).astype(int)
    payload = A.encode_wav_ima_adpcm(sig, 8000)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "id long, content binary"
    )
    row = A.audio_features(df, "content", "id").collect()[0]
    dec, _ = A.decode_wav_ima_adpcm(payload)
    s = dec[:, 0].astype(np.int64)
    assert row["bits"] == 4
    assert row["n_frames"] == 1009
    assert row["peak"] == int(np.abs(s).max())
    assert row["sum_sq"] == int((s * s).sum())
    assert row["zero_crossings"] == 0  # all positive
