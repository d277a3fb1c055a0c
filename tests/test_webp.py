"""VP8L (WebP lossless) codec: roundtrip identity + hand-built spec
streams for every advanced decode path the literal encoder doesn't
emit (all four transforms, color cache, LZ77 refs, simple codes,
meta-prefix groups). Forward transforms in these tests are independent
spec implementations — agreement with the decoder's inverses is the
check.
"""

import struct

import numpy as np
import pytest

from dataset_grouper_spark.operators import webp as W


def _rgba(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 4)).astype(np.uint8)


def _header(bw, w, h):
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)


def _prefix_encode(v):
    """(code, extra_bits, extra_val) such that _prefix_value inverts."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        eb = (code - 2) >> 1
        off = (2 + (code & 1)) << eb
        if off + 1 <= v <= off + (1 << eb):
            return code, eb, v - off - 1
    raise ValueError(v)


class TestRoundtrip:
    @pytest.mark.parametrize("h,w", [(1, 1), (3, 5), (16, 24), (9, 31)])
    def test_lossless_identity(self, h, w):
        img = _rgba(h, w, seed=h * 31 + w)
        out = W.decode_vp8l_pixels(W.encode_webp_lossless(img))
        assert np.array_equal(out, img)

    def test_rgb_input_gets_opaque_alpha(self):
        img = _rgba(4, 4)[:, :, :3]
        out = W.decode_vp8l_pixels(W.encode_webp_lossless(img))
        assert np.array_equal(out[:, :, :3], img)
        assert (out[:, :, 3] == 255).all()

    def test_lossy_vp8_gated_and_junk_rejected(self):
        assert W.decode_vp8l_pixels(b"RIFF\x00\x00\x00\x00WEBPVP8 ") is None
        assert W.decode_vp8l_pixels(b"JUNKJUNKJUNKJUNKJUNK") is None
        good = W.encode_webp_lossless(_rgba(6, 6))
        assert W.decode_vp8l_pixels(good[:30]) is None  # truncated

    def test_vp8x_extended_container(self):
        img = _rgba(3, 3, seed=5)
        plain = W.encode_webp_lossless(img)
        vp8l_chunk = plain[12:]  # "VP8L" + size + payload (+pad)
        vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        body = b"WEBP" + vp8x + vp8l_chunk
        wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
        assert np.array_equal(W.decode_vp8l_pixels(wrapped), img)


class TestTransforms:
    def test_subtract_green(self):
        img = _rgba(5, 7, seed=2)
        res = img.copy()
        res[:, :, 0] = (img[:, :, 0].astype(int) - img[:, :, 1]) % 256
        res[:, :, 2] = (img[:, :, 2].astype(int) - img[:, :, 1]) % 256
        bw = W._BitsW()
        _header(bw, 7, 5)
        bw.put(1, 1)
        bw.put(2, 2)  # subtract green (no data)
        bw.put(0, 1)  # end of transforms
        W._emit_main_image(bw, res)
        assert np.array_equal(W.decode_vp8l_pixels(W._wrap_vp8l(bw)), img)

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_predictor_all_modes(self, mode):
        h, w = 6, 9
        img = _rgba(h, w, seed=mode)

        def s(px):
            return px.astype(np.int64)

        def avg2(a, b):
            return (np.asarray(a) + np.asarray(b)) >> 1

        res = np.zeros_like(img)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([0, 0, 0, 255])
                elif y == 0:
                    pred = s(img[0, x - 1])
                elif x == 0:
                    pred = s(img[y - 1, 0])
                else:
                    L = s(img[y, x - 1])
                    T = s(img[y - 1, x])
                    TL = s(img[y - 1, x - 1])
                    TR = s(img[y - 1, x + 1]) if x + 1 < w else s(img[y, 0])
                    if mode == 0:
                        pred = np.array([0, 0, 0, 255])
                    elif mode == 1:
                        pred = L
                    elif mode == 2:
                        pred = T
                    elif mode == 3:
                        pred = TR
                    elif mode == 4:
                        pred = TL
                    elif mode == 5:
                        pred = avg2(avg2(L, TR), T)
                    elif mode == 6:
                        pred = avg2(L, TL)
                    elif mode == 7:
                        pred = avg2(L, T)
                    elif mode == 8:
                        pred = avg2(TL, T)
                    elif mode == 9:
                        pred = avg2(T, TR)
                    elif mode == 10:
                        pred = avg2(avg2(L, TL), avg2(T, TR))
                    elif mode == 11:
                        p = L + T - TL
                        pred = (
                            L
                            if np.abs(p - L).sum() < np.abs(p - T).sum()
                            else T
                        )
                    elif mode == 12:
                        pred = np.clip(L + T - TL, 0, 255)
                    else:
                        a = avg2(L, T)
                        d = a - TL
                        half = np.where(d >= 0, d // 2, -((-d) // 2))
                        pred = np.clip(a + half, 0, 255)
                res[y, x] = (s(img[y, x]) - pred) % 256
        bw = W._BitsW()
        _header(bw, w, h)
        bw.put(1, 1)
        bw.put(0, 2)  # predictor
        bw.put(4 - 2, 3)  # size_bits=4: one 16x16 block covers all
        sub = np.zeros((1, 1, 4), dtype=np.uint8)
        sub[0, 0, 1] = mode  # mode rides the green channel
        W._emit_entropy_image(bw, sub)
        bw.put(0, 1)  # end of transforms
        W._emit_main_image(bw, res)
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        assert out is not None and np.array_equal(out, img), f"mode {mode}"

    def test_cross_color(self):
        h, w = 4, 6
        img = _rgba(h, w, seed=8)

        def s8(v):
            v = int(v) & 0xFF
            return v - 256 if v >= 128 else v

        g2r, g2b, r2b = 37, 201, 120
        res = img.copy()
        for y in range(h):
            for x in range(w):
                g = s8(img[y, x, 1])
                res[y, x, 0] = (
                    int(img[y, x, 0]) - ((s8(g2r) * g) >> 5)
                ) % 256
                # decoder's red-to-blue delta sees the RECONSTRUCTED
                # red (== original red), not the residual
                tmp = (int(img[y, x, 2]) - ((s8(g2b) * g) >> 5)) % 256
                res[y, x, 2] = (
                    tmp - ((s8(r2b) * s8(img[y, x, 0])) >> 5)
                ) % 256
        bw = W._BitsW()
        _header(bw, w, h)
        bw.put(1, 1)
        bw.put(1, 2)  # cross-color
        bw.put(3 - 2, 3)  # 8x8 block covers 6x4
        sub = np.zeros((1, 1, 4), dtype=np.uint8)
        sub[0, 0, 0] = r2b  # RED channel carries red_to_blue
        sub[0, 0, 1] = g2b  # GREEN carries green_to_blue
        sub[0, 0, 2] = g2r  # BLUE carries green_to_red
        W._emit_entropy_image(bw, sub)
        bw.put(0, 1)
        W._emit_main_image(bw, res)
        assert np.array_equal(W.decode_vp8l_pixels(W._wrap_vp8l(bw)), img)

    @pytest.mark.parametrize("pal_size,width_bits", [(4, 2), (20, 0)])
    def test_color_indexing(self, pal_size, width_bits):
        rng = np.random.RandomState(pal_size)
        pal = rng.randint(0, 256, (pal_size, 4)).astype(np.uint8)
        h, w = 3, 10
        idx = rng.randint(0, pal_size, (h, w))
        img = pal[idx]
        # palette subimage: per-channel delta from previous entry
        deltas = pal.astype(np.int64)
        deltas[1:] = (deltas[1:] - pal[:-1].astype(np.int64)) % 256
        pal_img = deltas.astype(np.uint8).reshape(1, pal_size, 4)
        bw = W._BitsW()
        _header(bw, w, h)
        bw.put(1, 1)
        bw.put(3, 2)  # color indexing
        bw.put(pal_size - 1, 8)
        W._emit_entropy_image(bw, pal_img)
        bw.put(0, 1)
        # packed main image: indices ride the green channel
        if width_bits:
            ppp = 1 << width_bits
            bits = 8 >> width_bits
            pw = -(-w // ppp)
            packed = np.zeros((h, pw, 4), dtype=np.uint8)
            for y in range(h):
                for px in range(pw):
                    v = 0
                    for sub_x in range(ppp):
                        x = px * ppp + sub_x
                        if x < w:
                            v |= int(idx[y, x]) << (sub_x * bits)
                    packed[y, px, 1] = v
        else:
            packed = np.zeros((h, w, 4), dtype=np.uint8)
            packed[:, :, 1] = idx
        W._emit_main_image(bw, packed)
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        assert out is not None and np.array_equal(out, img)


class TestEntropyFeatures:
    def test_lz77_backward_refs(self):
        # 1x8 image: 2 literals then copy 6 px from distance 2
        lit = [(10, 20, 30, 255), (40, 50, 60, 255)]
        expect = np.array(
            [lit[0], lit[1]] + [lit[0], lit[1]] * 3, dtype=np.uint8
        ).reshape(1, 8, 4)
        bw = W._BitsW()
        _header(bw, 8, 1)
        bw.put(0, 1)  # no transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        cg, cb = W._emit_prefix_codes(bw)
        cd = W._canonical(W._two_tier_lengths(40))
        for (r, g, b, a) in lit:
            bw.put_code(*cg[g])
            bw.put_code(*cb[r])
            bw.put_code(*cb[b])
            bw.put_code(*cb[a])
        # length 6, distance 2: dist value -> dcode 1 -> map (1,0) = 1?
        # use raw distance: value = 120 + dist -> dist = value - 120
        lcode, leb, lev = _prefix_encode(6)
        bw.put_code(*cg[256 + lcode])
        bw.put(lev, leb)
        dcode, deb, dev = _prefix_encode(120 + 2)
        bw.put_code(*cd[dcode])
        bw.put(dev, deb)
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        assert np.array_equal(out, expect)

    def test_lz77_2d_distance_map(self):
        # 2x4 image; second row copies the first via map entry (0, 1)
        row = [(i * 10, i * 20 % 256, i * 30 % 256, 255) for i in range(4)]
        expect = np.array([row, row], dtype=np.uint8)
        bw = W._BitsW()
        _header(bw, 4, 2)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        cg, cb = W._emit_prefix_codes(bw)
        cd = W._canonical(W._two_tier_lengths(40))
        for (r, g, b, a) in row:
            bw.put_code(*cg[g])
            bw.put_code(*cb[r])
            bw.put_code(*cb[b])
            bw.put_code(*cb[a])
        lcode, leb, lev = _prefix_encode(4)
        bw.put_code(*cg[256 + lcode])
        bw.put(lev, leb)
        # dist_code value 1 -> map index 0 -> (0,1) -> dist = xsize = 4
        dcode, deb, dev = _prefix_encode(1)
        bw.put_code(*cd[dcode])
        bw.put(dev, deb)
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        assert np.array_equal(out, expect)

    def test_color_cache(self):
        cache_bits = 4
        px = (200 << 24) | (12 << 16) | (34 << 8) | 56  # ARGB
        idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
        bw = W._BitsW()
        _header(bw, 3, 1)
        bw.put(0, 1)  # no transforms
        bw.put(1, 1)  # cache present
        bw.put(cache_bits, 4)
        bw.put(0, 1)  # no meta
        gsize = 256 + 24 + (1 << cache_bits)
        green_l = W._two_tier_lengths(gsize)
        byte_l = W._two_tier_lengths(256)
        dist_l = W._two_tier_lengths(40)
        for lengths in (green_l, byte_l, byte_l, byte_l, dist_l):
            W._emit_code_lengths(bw, lengths)
        cg = W._canonical(green_l)
        cb = W._canonical(byte_l)
        # literal (fills cache), another literal, then a cache ref
        for (r, g, b, a) in [(12, 34, 56, 200), (1, 2, 3, 255)]:
            bw.put_code(*cg[g])
            bw.put_code(*cb[r])
            bw.put_code(*cb[b])
            bw.put_code(*cb[a])
        bw.put_code(*cg[256 + 24 + idx])
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        expect = np.array(
            [[(12, 34, 56, 200), (1, 2, 3, 255), (12, 34, 56, 200)]],
            dtype=np.uint8,
        )
        assert np.array_equal(out, expect)

    def test_simple_codes(self):
        # channels constrained to <=2 values -> all five codes simple
        bw = W._BitsW()
        _header(bw, 4, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)

        def simple2(s0, s1):
            bw.put(1, 1)  # simple
            bw.put(1, 1)  # two symbols
            bw.put(1, 1)  # first symbol in 8 bits
            bw.put(s0, 8)
            bw.put(s1, 8)
            # canonical: lower symbol value... spec: symbols as listed,
            # code 0 for the FIRST listed, 1 for the second
            return {s0: (0, 1), s1: (1, 1)}

        def simple1(s0):
            bw.put(1, 1)
            bw.put(0, 1)  # one symbol
            bw.put(1, 1)
            bw.put(s0, 8)
            return {s0: (0, 0)}

        cg = simple2(7, 9)
        cr = simple2(100, 101)
        cbl = simple1(55)
        ca = simple1(255)
        simple2(0, 1)  # distance code (unused)
        pixels = [(100, 7, 55, 255), (101, 9, 55, 255),
                  (101, 7, 55, 255), (100, 9, 55, 255)]
        for (r, g, b, a) in pixels:
            bw.put_code(*cg[g])
            bw.put_code(*cr[r])
            bw.put_code(*cbl[b])
            bw.put_code(*ca[a])
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        assert np.array_equal(out, np.array([pixels], dtype=np.uint8))

    def test_meta_prefix_groups(self):
        # 8x1 image, meta block size 4 -> two groups; both use the
        # standard two-tier codes, decoding exercises group switching
        img = _rgba(1, 8, seed=4)
        bw = W._BitsW()
        _header(bw, 8, 1)
        bw.put(0, 1)  # no transforms
        bw.put(0, 1)  # no cache
        bw.put(1, 1)  # meta present
        meta_bits = 2
        bw.put(meta_bits - 2, 3)
        meta = np.zeros((1, 2, 4), dtype=np.uint8)
        meta[0, 0, 1] = 0  # group 0
        meta[0, 1, 1] = 1  # group 1
        W._emit_entropy_image(bw, meta)
        cg0, cb0 = W._emit_prefix_codes(bw)  # group 0
        cg1, cb1 = W._emit_prefix_codes(bw)  # group 1
        for x in range(8):
            cg, cb = (cg0, cb0) if x < 4 else (cg1, cb1)
            r, g, b, a = (int(v) for v in img[0, x])
            bw.put_code(*cg[g])
            bw.put_code(*cb[r])
            bw.put_code(*cb[b])
            bw.put_code(*cb[a])
        out = W.decode_vp8l_pixels(W._wrap_vp8l(bw))
        assert np.array_equal(out, img)
