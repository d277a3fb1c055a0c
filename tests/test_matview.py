"""Incremental materialized sums: fold-in equals recompute, atomic swap."""

import os
import tempfile

from pyspark.sql import functions as F

from dataset_grouper_spark.operators import matview


def _read(spark, path):
    return {
        r["g"]: (r["n"], r["s"])
        for r in spark.read.parquet(path).collect()
    }


def test_refresh_equals_full_recompute(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="mv_"), "agg")
    sums = {"n": F.lit(1), "s": F.col("v")}
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, v long"
    )
    b2 = spark.createDataFrame(
        [("a", 10), ("c", 5)], "g string, v long"
    )
    b3 = spark.createDataFrame([("c", 1)], "g string, v long")
    matview.create_materialized_sums(b1, ["g"], sums, path)
    matview.refresh_materialized_sums(spark, b2, ["g"], sums, path)
    matview.refresh_materialized_sums(spark, b3, ["g"], sums, path)
    got = _read(spark, path)
    # equals one aggregation over the concatenation
    assert got == {"a": (3, 13), "b": (1, 3), "c": (2, 6)}


def test_refresh_leaves_no_staging_dirs(spark):
    root = tempfile.mkdtemp(prefix="mv_")
    path = os.path.join(root, "agg")
    sums = {"n": F.lit(1)}
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    matview.create_materialized_sums(df, ["g"], sums, path)
    matview.refresh_materialized_sums(spark, df, ["g"], sums, path)
    leftovers = [d for d in os.listdir(root) if d != "agg"]
    assert leftovers == []
    rows = spark.read.parquet(path).collect()
    assert [(r["g"], r["n"]) for r in rows] == [("a", 2)]
