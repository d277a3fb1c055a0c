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
