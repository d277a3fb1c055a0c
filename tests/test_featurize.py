"""Hashed-TF featurization: dense/sparse agreement, normalization,
near-dup detection on text."""

import math

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.functions import featurize
from dataset_grouper_spark.operators import similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),          # dup of 1
        (3, "alpha beta gamma delta epsilon different end"),  # near dup
        (4, "totally unrelated words appear in this one"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_dense_vectors_normalized(docs):
    vecs = featurize.hashed_tf(docs, "text", "doc_id", dim=32)
    rows = {r.doc_id: r.vector for r in vecs.collect()}
    assert len(rows) == 4 and all(len(v) == 32 for v in rows.values())
    for v in rows.values():
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)
    assert rows[1] == rows[2]


def test_sparse_pairs_find_dups(docs):
    pairs = featurize.sparse_cosine_pairs(docs, "text", "doc_id", 32, 0.8)
    got = {(r.id_a, r.id_b): r.cosine for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] < 1.0
    assert not any(4 in p for p in got)


def test_dense_and_sparse_agree(docs):
    # cosine from the dense vectors (array ops) must equal the
    # relational sparse computation
    vecs = featurize.hashed_tf(docs, "text", "doc_id", dim=32)
    dense_pairs = similarity.cosine_pairs(vecs, "vector", "doc_id", 0.0)
    sparse_pairs = featurize.sparse_cosine_pairs(docs, "text", "doc_id", 32, -1.0)
    d = {(r.id_a, r.id_b): r.cosine for r in dense_pairs.collect()}
    s = {(r.id_a, r.id_b): r.cosine for r in sparse_pairs.collect()}
    assert set(d) == set(s)
    for k in d:
        assert math.isclose(d[k], s[k], abs_tol=1e-5), k
