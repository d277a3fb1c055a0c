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


def test_resize_and_embed_raise_without_codecs(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "img_id: long, content: binary")
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.resize_images(df, "content", "img_id", 2, 2)
    with _pytest.raises(NotImplementedError):
        multimodal.image_embeddings(df, "content", "img_id")
