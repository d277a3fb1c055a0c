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


def test_decode_requires_fake_flag(blobs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_meta(blobs, "content", "doc_id", fake=False)


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
