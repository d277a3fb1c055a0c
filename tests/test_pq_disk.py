"""IVF+PQ disk index: pruning + compression composed on disk."""

import glob
import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import plans
from dataset_grouper_spark.operators import pq
from dataset_grouper_spark.sources import read_table

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    emb = read_table(spark, SF001, "embeddings")
    path = tempfile.mkdtemp(prefix="ivfpq_")
    idx = pq.IvfPqDiskIndex.build(
        emb, "embedding", "vec_id", path, num_centroids=8, m=8, ksub=16
    )
    return idx, emb


def test_layout_is_cell_partitioned(spark, index):
    idx, _ = index
    cells = glob.glob(idx.path + "/codes/_cluster=*")
    assert len(cells) == 8
    # static cell filter prunes at the partition level (footer-free)
    scan = spark.read.parquet(idx.path + "/codes").filter(
        F.col("_cluster").isin([0, 1])
    )
    assert "PartitionFilters" in plans.plan_text(scan, "simple")


def test_search_self_match_and_rank_contract(spark, index):
    idx, emb = index
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = idx.search(queries, "embedding", "vec_id", k=5, nprobe=2)
    pdf = out.toPandas()
    nq = queries.count()
    # the query's own cell is always its nearest -> self-match survives
    selfs = pdf[pdf["query_id"] == pdf["neighbor_id"]]
    assert len(selfs) == nq
    assert (selfs["rank"] == 1).all()
    assert (selfs["cosine"] == 1.0).all()
    for _, g in pdf.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))


def test_all_cells_probed_equals_plain_pq(spark, index):
    idx, emb = index
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    disk = idx.search(
        queries, "embedding", "vec_id", k=5, nprobe=8, shortlist=4
    )
    plain = pq.pq_topk(
        emb, queries, "embedding", "vec_id", "vec_id",
        k=5, m=8, ksub=16, shortlist=4,
    )
    assert sorted(map(tuple, disk.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_search_deterministic(spark, index):
    idx, emb = index
    queries = emb.filter(F.col("vec_id") % 250 == 0)
    a = idx.search(queries, "embedding", "vec_id", k=5, nprobe=3)
    b = idx.search(queries, "embedding", "vec_id", k=5, nprobe=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
