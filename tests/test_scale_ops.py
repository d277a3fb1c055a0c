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


@pytest.mark.slow
def test_salted_join_hot_key_at_16x(spark):
    # 1.6M left rows with ONE manufactured 100x-hot key: the salted
    # join must produce aggregates identical to the plain join while
    # spreading the hot key's reducer across the salt sub-keys
    import time

    from dataset_grouper_spark.operators.joins import salted_join

    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    )
    # key 0 swallows ~99% of rows; everything else keeps its user
    left = ev.select(
        "event_id",
        F.when(F.col("event_id") % 100 != 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("key"),
        "value",
    )
    right = (
        read_table(spark, SF, "events")
        .select(F.col("user_id").alias("key"))
        .distinct()
        .withColumn("tag", F.concat(F.lit("t"), F.col("key")))
    )
    t0 = time.time()
    plain = (
        left.join(right.hint("shuffle_hash"), ["key"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()[0]
    )
    t_plain = time.time() - t0
    t0 = time.time()
    salted = (
        salted_join(left, right, ["key"], num_salts=32)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("s"),
        )
        .collect()[0]
    )
    t_salted = time.time() - t0
    assert (plain.n, plain.s) == (salted.n, salted.s)
    # record, don't flake: single-host timing noise can swamp the win,
    # but the salted path must never be catastrophically slower
    assert t_salted < t_plain * 3, (t_plain, t_salted)


@pytest.mark.slow
def test_interval_join_at_16x_events(spark):
    # 1.6M points against per-user hour intervals: equijoin on
    # (user, bin) with the span fuse active at its default
    from dataset_grouper_spark.operators.joins import interval_join

    ev = _replicate(
        read_table(spark, SF, "events"), 16, "event_id", 10_000_000
    ).withColumn("ts_us", F.expr("CAST(ts DIV 1000 AS BIGINT)"))
    points = ev.select("event_id", "user_id", "ts_us")
    hour = 3_600_000_000
    intervals = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts_us").alias("iv_start"),
            (F.col("ts_us") + hour).alias("iv_end"),
            F.col("event_id").alias("iv_id"),
        )
    )
    out = interval_join(
        points, intervals, "ts_us", "iv_start", "iv_end",
        by=["user_id"], bin_width=hour,
    )
    n = out.count()
    assert n >= intervals.count()  # each interval matches its own point
