"""Product quantization: codebook fit, encode, ADC+rerank search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import pq, similarity
from dataset_grouper_spark.sources import read_table

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF001, "embeddings")


def test_fit_is_deterministic(emb):
    b1 = pq.fit_pq_codebooks(emb, "embedding", "vec_id", m=8, ksub=8)
    b2 = pq.fit_pq_codebooks(emb, "embedding", "vec_id", m=8, ksub=8)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (8, 8, 8)


def test_fit_rejects_bad_dims(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.fit_pq_codebooks(emb, "embedding", "vec_id", m=7)


def test_encode_codes_in_range(spark, emb):
    books = pq.fit_pq_codebooks(emb, "embedding", "vec_id", m=8, ksub=8)
    codes = pq.pq_encode(emb, "embedding", "vec_id", books)
    stats = codes.select(
        F.size("codes").alias("m"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("m"), F.max("m"), F.min("lo"), F.max("hi")
    ).collect()[0]
    assert stats[0] == stats[1] == 8
    assert stats[2] >= 0 and stats[3] <= 7
    # reconstruction from codes is closer than a wrong codeword (spot)
    row = codes.limit(1).collect()[0]
    assert len(row["codes"]) == 8


def test_pq_topk_recall_vs_exact(spark, emb):
    queries = emb.filter(F.col("vec_id") % 50 == 0)  # 10 queries
    exact = similarity.cosine_topk(
        emb, queries, "embedding", "vec_id", "vec_id", k=10
    )
    approx = pq.pq_topk(
        emb, queries, "embedding", "vec_id", "vec_id",
        k=10, m=8, ksub=16, shortlist=8,
    )
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"recall@10 = {recall}"
    # the self-match always survives the shortlist + rerank
    selfs = {p for p in ap if p[0] == p[1]}
    assert len(selfs) == approx.select("query_id").distinct().count()


def test_pq_topk_batching_equivalence(spark, emb):
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    one = pq.pq_topk(
        emb, queries, "embedding", "vec_id", "vec_id", k=5
    )
    many = pq.pq_topk(
        emb, queries, "embedding", "vec_id", "vec_id", k=5,
        batch_queries=2,  # forces several hash-blocks
    )
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_pq_topk_rank_contract(spark, emb):
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    out = pq.pq_topk(emb, queries, "embedding", "vec_id", "vec_id", k=5)
    pdf = out.toPandas()
    for _, g in pdf.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
        srt = g.sort_values("rank")
        assert (srt["cosine"].diff().dropna() <= 1e-12).all()
