"""Audio modality: WAV codec, features, framing, resample.

The codec is pure stdlib (struct + numpy) and must round-trip exactly;
the feature math is exact integer arithmetic mirrored by the DuckDB
oracle twins in __spark_entry__ (audio_features_wav / audio_frame_energy
/ audio_resample_wav).
"""

import numpy as np
import pytest

from dataset_grouper_spark.operators import audio


def _tone(n=100, ch=1, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(-3000, 3000, size=(n, ch))


def test_wav_roundtrip_mono():
    s = _tone(128, 1)
    b = audio.encode_wav_pcm16(s, 8000)
    dec, rate = audio.decode_wav_pcm(b)
    assert rate == 8000
    np.testing.assert_array_equal(dec, s)


def test_wav_roundtrip_stereo():
    s = _tone(64, 2)
    b = audio.encode_wav_pcm16(s, 44100)
    dec, rate = audio.decode_wav_pcm(b)
    assert rate == 44100
    assert dec.shape == (64, 2)
    np.testing.assert_array_equal(dec, s)


def test_header_parse_skips_unknown_chunks():
    s = _tone(10, 1)
    b = audio.encode_wav_pcm16(s, 16000)
    # splice a LIST chunk (odd size -> word-aligned skip) before fmt/data
    spliced = b[:12] + b"LIST" + bytes([5, 0, 0, 0]) + b"INFOx\x00" + b[12:]
    total = len(spliced) - 8
    spliced = spliced[:4] + total.to_bytes(4, "little") + spliced[8:]
    hdr = audio.parse_wav_header(spliced)
    assert hdr is not None
    ch, rate, bits, n, _, _ = hdr
    assert (ch, rate, bits, n) == (1, 16000, 16, 10)


def test_non_wav_and_float_pcm_rejected():
    assert audio.parse_wav_header(b"\x89PNG" + b"\x00" * 60) is None
    s = _tone(4, 1)
    b = bytearray(audio.encode_wav_pcm16(s, 8000))
    b[20] = 3  # IEEE float format tag
    assert audio.parse_wav_header(bytes(b)) is None


def test_8bit_pcm_decode():
    raw = bytes([0, 128, 255, 200])
    fmt = (
        b"RIFF"
        + (36 + 4).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little")
        + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + b"data"
        + (4).to_bytes(4, "little")
        + raw
    )
    dec, rate = audio.decode_wav_pcm(fmt)
    assert dec[:, 0].tolist() == [-128, 0, 127, 72]


def test_channel0_features_exact():
    s = np.array([[3], [-2], [0], [-1], [5]])
    peak, sum_sq, zc = audio._channel0_features(s)
    assert peak == 5
    assert sum_sq == 9 + 4 + 0 + 1 + 25
    # sign classes: + - + - + -> 4 crossings (0 counts as nonnegative)
    assert zc == 4


def test_audio_features_dataframe(spark):
    s1 = np.array([100, -100, 200, -200], dtype=np.int64)
    s2 = np.arange(10, dtype=np.int64) * 50
    rows = [
        (1, bytearray(audio.encode_wav_pcm16(s1, 8000))),
        (2, bytearray(audio.encode_wav_pcm16(s2, 16000))),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {
        r["id"]: r
        for r in audio.audio_features(df, "content", "id").collect()
    }
    assert got[1]["sum_sq"] == int((s1 * s1).sum())
    assert got[1]["zero_crossings"] == 3
    assert got[2]["peak"] == 450
    assert got[2]["zero_crossings"] == 0
    assert got[2]["duration_ms"] == 10 * 1000 // 16000


def test_frame_energy_partial_tail(spark):
    s = np.arange(10, dtype=np.int64)
    df = spark.createDataFrame(
        [(7, bytearray(audio.encode_wav_pcm16(s, 8000)))],
        "id long, content binary",
    )
    out = audio.frame_energy(df, "content", "id", frame_len=4).collect()
    out = sorted(out, key=lambda r: r["frame_idx"])
    assert [r["n_samples"] for r in out] == [4, 4, 2]
    assert out[0]["energy"] == 0 + 1 + 4 + 9
    assert out[2]["energy"] == 64 + 81
    assert out[2]["peak"] == 9


def test_frame_energy_hop_overlap(spark):
    s = np.arange(6, dtype=np.int64)
    df = spark.createDataFrame(
        [(1, bytearray(audio.encode_wav_pcm16(s, 8000)))],
        "id long, content binary",
    )
    out = audio.frame_energy(df, "content", "id", frame_len=4, hop=2).collect()
    assert len(out) == 3  # starts 0, 2, 4


def test_resample_nearest_halves(spark):
    s = np.arange(8, dtype=np.int64) * 10
    df = spark.createDataFrame(
        [(3, bytearray(audio.encode_wav_pcm16(s, 8000)))],
        "id long, content binary",
    )
    row = audio.resample_nearest(df, "content", "id", 4000).collect()[0]
    assert row["n_frames"] == 4
    dec, rate = audio.decode_wav_pcm(bytes(row["content"]))
    assert rate == 4000
    # j*n_in//n_out = j*8//4 -> samples 0,2,4,6
    assert dec[:, 0].tolist() == [0, 20, 40, 60]
    assert row["sum_sq"] == sum(v * v for v in (0, 20, 40, 60))


def test_audio_meta_null_for_non_wav(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not audio at all"))], "id long, content binary"
    )
    row = audio.audio_meta(df, "content", "id").collect()[0]
    assert row["channels"] is None and row["n_frames"] is None
    assert row["n_bytes"] == 16


def test_compressed_gate_raises():
    with pytest.raises((NotImplementedError, Exception)):
        audio.decode_compressed_audio(b"\xff\xfb\x90\x00")


def test_audio_features_skip_invalid(spark):
    import numpy as np

    good = audio.encode_wav_pcm16(np.arange(8, dtype=np.int64), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"garbage bytes here"))],
        "id long, content binary",
    )
    rows = {
        r["id"]: r
        for r in audio.audio_features(
            df, "content", "id", skip_invalid=True
        ).collect()
    }
    assert rows[1]["n_frames"] == 8
    assert rows[2]["n_frames"] is None and rows[2]["peak"] is None
    # strict mode still raises
    with pytest.raises(Exception):
        audio.audio_features(df, "content", "id").collect()
