"""G.711 mu-law / A-law WAV codec (format tags 7 / 6).

The decode tables are pinned against the published ITU-T G.711 values
(16-bit linear scale, the convention of the classic public-domain
reference implementation): mu-law spans ±32124 with two zero codes,
A-law spans ±32256 with no zero code (its smallest magnitudes are ±8).
An independent scalar re-derivation in this file guards the table
builder; the encoder is nearest-reconstruction-level quantization, so
every representable level round-trips exactly.
"""

import numpy as np
import pytest

from dataset_grouper_spark.operators import audio
from dataset_grouper_spark.operators.audio import (
    _ALAW_ENCODE,
    _ALAW_TABLE,
    _ULAW_ENCODE,
    _ULAW_TABLE,
    decode_wav_any,
    decode_wav_g711,
    encode_wav_g711,
    parse_wav_g711_header,
)


class TestTables:
    def test_ulaw_known_values(self):
        assert _ULAW_TABLE[0x00] == -32124
        assert _ULAW_TABLE[0x80] == 32124
        # both zero codes decode to exactly 0
        assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
        # monotone decreasing over the negative half (codes 0x00-0x7E)
        neg = _ULAW_TABLE[:0x7F]
        assert (np.diff(neg) > 0).all()

    def test_alaw_known_values(self):
        assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
        assert _ALAW_TABLE[0x2A] == -32256 and _ALAW_TABLE[0xAA] == 32256
        # A-law has no zero level; smallest magnitude is 8
        assert np.abs(_ALAW_TABLE).min() == 8

    def test_ulaw_independent_rederivation(self):
        # G.711 mu-law decode restated via the textbook formula
        # value = ((2*mant + 33) << seg) - 33 on the 13-bit (x4) scale
        # (the bias 132 = 4*33, the <<3 mantissa = 8 = 4*2)
        for u in range(256):
            c = (~u) & 0xFF
            seg = (c >> 4) & 0x07
            mant = c & 0x0F
            mag = (((2 * mant + 33) << seg) - 33) * 4
            want = -mag if c & 0x80 else mag
            assert _ULAW_TABLE[u] == want, hex(u)

    def test_alaw_independent_rederivation(self):
        for a in range(256):
            c = a ^ 0x55
            seg = (c >> 4) & 0x07
            mant = c & 0x0F
            if seg == 0:
                mag = mant * 2 + 1
            else:
                mag = (mant * 2 + 33) << (seg - 1)
            mag *= 8  # 12-bit scale x8 = 16-bit scale
            want = mag if c & 0x80 else -mag
            assert _ALAW_TABLE[a] == want, hex(a)


class TestEncode:
    @pytest.mark.parametrize(
        "table,enc",
        [(_ULAW_TABLE, _ULAW_ENCODE), (_ALAW_TABLE, _ALAW_ENCODE)],
    )
    def test_levels_roundtrip_exact(self, table, enc):
        levels = table.astype(np.int64)
        assert (table[enc(levels)] == levels).all()

    @pytest.mark.parametrize(
        "table,enc",
        [(_ULAW_TABLE, _ULAW_ENCODE), (_ALAW_TABLE, _ALAW_ENCODE)],
    )
    def test_nearest_level_quantization(self, table, enc):
        rng = np.random.default_rng(7)
        x = rng.integers(-32768, 32768, 4000)
        got_err = np.abs(table[enc(x)].astype(np.int64) - x)
        best = np.abs(
            table[None, :].astype(np.int64) - x[:, None]
        ).min(axis=1)
        assert (got_err == best).all()


class TestContainer:
    def test_roundtrip_mono_and_stereo(self):
        rng = np.random.default_rng(3)
        for law in ("ulaw", "alaw"):
            for shape in ((40,), (40, 2)):
                s = rng.integers(-30000, 30000, shape)
                b = encode_wav_g711(s, 8000, law)
                hdr = parse_wav_g711_header(b)
                assert hdr[0] == law and hdr[2] == 8000
                dec, rate = decode_wav_g711(b)
                assert rate == 8000
                want = np.atleast_2d(s.reshape(len(s), -1))
                assert dec.shape == want.shape
                # every decoded value is a reconstruction level within
                # nearest-level error of the input
                table = (
                    _ULAW_TABLE if law == "ulaw" else _ALAW_TABLE
                ).astype(np.int64)
                best = np.abs(
                    table[None, :] - want.ravel()[:, None]
                ).min(axis=1)
                assert (
                    np.abs(dec.ravel() - want.ravel()) == best
                ).all()

    def test_decode_wav_any_routes_g711(self):
        s = np.array([0, 1000, -1000, 20000, -20000])
        for law in ("ulaw", "alaw"):
            b = encode_wav_g711(s, 16000, law)
            dec, rate, bits = decode_wav_any(b)
            assert bits == 8 and rate == 16000 and dec.shape == (5, 1)

    def test_pcm_wav_not_claimed(self):
        b = audio.encode_wav_pcm16(np.arange(10), 8000)
        assert parse_wav_g711_header(b) is None

    def test_truncated_and_garbage(self):
        assert parse_wav_g711_header(b"not a wav") is None
        b = encode_wav_g711(np.arange(100), 8000, "ulaw")
        # truncated data chunk: whole-byte samples survive, partial
        # frames are dropped (stereo truncation to an odd byte count)
        s2 = np.arange(50).reshape(25, 2)
        b2 = encode_wav_g711(s2, 8000, "alaw")
        cut = b2[:-3]
        dec, _ = decode_wav_g711(cut)
        assert dec.shape[1] == 2
        assert len(dec) == (len(b2) - 3 - (len(b2) - 50)) // 2
        with pytest.raises(ValueError):
            decode_wav_g711(b[:20] + b"x")

    def test_bad_law_raises(self):
        with pytest.raises(ValueError):
            encode_wav_g711(np.arange(4), 8000, "mp3")


class TestOperator:
    def test_features_match_hand_computation(self, spark):
        rng = np.random.default_rng(11)
        rows = []
        expect = {}
        for i in range(6):
            law = "ulaw" if i % 2 == 0 else "alaw"
            s = rng.integers(-32000, 32000, 30 + i)
            b = encode_wav_g711(s, 8000, law)
            dec, _ = decode_wav_g711(b)
            ch0 = dec[:, 0].astype(np.int64)
            nonneg = ch0 >= 0
            expect[i] = (
                len(ch0),
                int(np.abs(ch0).max()),
                int((ch0 * ch0).sum()),
                int((nonneg[1:] != nonneg[:-1]).sum()),
            )
            rows.append((i, b))
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        got = {
            r["id"]: (
                r["n_frames"],
                r["peak"],
                r["sum_sq"],
                r["zero_crossings"],
            )
            for r in audio.audio_features(
                df, "content", "doc_id"
            ).collect()
        }
        assert got == expect
