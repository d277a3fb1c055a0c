"""Scale stress for the LLM-pipeline tier (slow-marked, run with -m slow).

Each test replicates the sf0.1 synthetic tables well past bench size
and asserts the scale-path operators complete with sane outputs — the
committed evidence that the candidate-generation joins and the as-of
window hold their shape as data grows (plan guards elsewhere pin the
shapes; this pins behavior). Timings recorded in PERF.md.
"""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import dedup, similarity
from dataset_grouper_spark.operators.asof import asof_join
from dataset_grouper_spark.sources import read_table

SF = "/root/testdata/sf0.1"


def _replicate(df, times, id_col, id_stride):
    out = df
    for i in range(1, times):
        out = out.unionAll(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * id_stride))
        )
    return out


@pytest.mark.slow
def test_minhash_lsh_at_16x_documents(spark):
    # 80k docs (16 x 5000): signatures + banded candidates complete;
    # replicas collide with their originals, so the candidate count is
    # at least the replica pairing and far below all-pairs
    docs = _replicate(
        read_table(spark, SF, "documents"), 16, "doc_id", 1_000_000
    )
    sigs = dedup.minhash_signatures(docs, "text", "doc_id", 3, 16, 42)
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 4)
    n = cands.count()
    n_docs = docs.count()
    assert n_docs == 80_000
    assert n >= 15 * n_docs / 16  # every original pairs with 15 replicas
    assert n < n_docs * 200  # nowhere near quadratic


@pytest.mark.slow
def test_cosine_pairs_blocked_at_4x_embeddings(spark):
    # 20k vectors through the triangle tile join (no driver collect)
    base = read_table(spark, SF, "embeddings")
    n_base = base.count()
    emb = _replicate(base, 4, "vec_id", 1_000_000)
    pairs = similarity.cosine_pairs(emb, "embedding", "vec_id", 0.999)
    n = pairs.count()
    # each replica group (cosine 1.0): C(4,2) pairs per original vector
    assert n >= 6 * n_base


@pytest.mark.slow
def test_asof_join_at_16x_events(spark):
    # 1.6M events, purchases asof-joined to clicks in one window pass
    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    ).withColumn("ts_us", F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "value"
    )
    out = asof_join(left, right, "ts_us", ["user_id"], ["value"])
    total = out.count()
    matched = out.filter(F.col("value_asof").isNotNull()).count()
    assert total == left.count()
    assert matched > total * 0.9  # dense click history -> most match
