"""Distributed prefix sum and token-balanced shards."""

import tempfile

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import prefix


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(10_000).select(
        F.col("id").alias("ord"), (F.col("id") % 37 + 1).alias("v")
    )


def test_running_sum_equals_single_partition_window(spark, df):
    fast = prefix.running_sum(df, "v", "ord", num_partitions=16)
    w = Window.orderBy("ord")
    slow = df.withColumn(prefix.CUM_COL, F.sum("v").over(w).cast("long"))
    a = {r["ord"]: r[prefix.CUM_COL] for r in fast.collect()}
    b = {r["ord"]: r[prefix.CUM_COL] for r in slow.collect()}
    assert a == b


def test_running_sum_is_partition_parallel(spark, df):
    # the point of the two-pass spelling: no single-partition window
    from dataset_grouper_spark import plans

    fast = prefix.running_sum(df, "v", "ord", num_partitions=16)
    assert "rangepartitioning" in plans.plan_text(fast, "simple").lower()


def test_token_shards_contiguous_and_budgeted(spark, df):
    budget = 20_000
    sharded = prefix.with_token_shards(df, "v", "ord", budget, 8)
    rows = sorted(
        (r["ord"], r["shard"], r["v"]) for r in sharded.collect()
    )
    # shards nondecreasing in corpus order, starting at 0
    shards = [s for _, s, _ in rows]
    assert shards[0] == 0
    assert all(a <= b for a, b in zip(shards, shards[1:]))
    # every non-last shard totals within one max-row of the budget
    per = {}
    for _, s, v in rows:
        per[s] = per.get(s, 0) + v
    last = max(per)
    assert all(
        budget - 37 <= per[s] <= budget + 37 for s in per if s != last
    )


def test_write_token_shards_layout(spark, df):
    import glob

    out = tempfile.mkdtemp(prefix="tokshard_")
    prefix.write_token_shards(df, out, "v", "ord", 50_000, 8)
    dirs = glob.glob(out + "/shard=*")
    assert len(dirs) >= 3
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    # shard dirs are contiguous ranges of ord
    pdf = back.select("shard", "ord").toPandas()
    bounds = pdf.groupby("shard")["ord"].agg(["min", "max"]).sort_index()
    prev_max = -1
    for _, r in bounds.iterrows():
        assert r["min"] == prev_max + 1
        prev_max = r["max"]


def test_running_sum_property_random_values(spark):
    import random

    rng = random.Random(5)
    rows = [(i, rng.randrange(1, 1000)) for i in range(3000)]
    rng.shuffle(rows)  # arrival order != ord order
    df = spark.createDataFrame(rows, "ord long, v long")
    fast = {
        r["ord"]: r[prefix.CUM_COL]
        for r in prefix.running_sum(df, "v", "ord", 7).collect()
    }
    acc = 0
    for o, v in sorted(rows):
        acc += v
        assert fast[o] == acc
