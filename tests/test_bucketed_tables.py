"""Spark-native bucketed tables: the join must be shuffle-free."""

import tempfile

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import plans
from dataset_grouper_spark.sinks import bucketed_tables as bt


@pytest.fixture(scope="module")
def two_bucketed(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    ln = bt.temp_table_name("t_left")
    rn = bt.temp_table_name("t_right")
    bt.write_bucketed_table(
        spark, left, ln, tempfile.mkdtemp(prefix="bt_l_"), ["k"], 4, ["k"]
    )
    bt.write_bucketed_table(
        spark, right, rn, tempfile.mkdtemp(prefix="bt_r_"), ["k"], 4, ["k"]
    )
    yield ln, rn
    spark.sql(f"DROP TABLE IF EXISTS {ln}")
    spark.sql(f"DROP TABLE IF EXISTS {rn}")


def test_join_has_zero_exchanges(spark, two_bucketed):
    ln, rn = two_bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bt.colocated_join(spark, ln, rn, "k")
        txt = plans.plan_text(j, "simple")
        assert "SortMergeJoin" in txt
        assert plans.count_exchanges(j) == 0, txt
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_one_file_per_bucket(spark, two_bucketed):
    import glob

    ln, _ = two_bucketed
    loc = (
        spark.sql(f"DESCRIBE EXTENDED {ln}")
        .filter("col_name = 'Location'")
        .collect()[0][1]
        .replace("file:", "")
    )
    files = [p for p in glob.glob(loc + "/part-*") if p.endswith(".parquet")]
    assert len(files) == 4  # exactly num_buckets data files


def test_join_results_correct(spark, two_bucketed):
    ln, rn = two_bucketed
    j = bt.colocated_join(spark, ln, rn, "k")
    assert j.count() == 500
    row = j.filter(F.col("k") == 42).collect()[0]
    assert (row["lv"], row["rv"]) == (84, 126)


def test_groupby_on_bucket_key_zero_exchanges(spark, two_bucketed):
    ln, _ = two_bucketed
    agg = spark.table(ln).groupBy("k").agg(F.sum("lv").alias("s"))
    assert plans.count_exchanges(agg) == 0
