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


# ------------------------------------------------------- join views

A_OLD = [(1, "x"), (2, "y"), (2, "y2")]
B_OLD = [(1, 10), (3, 30)]
D_A = [(3, "z"), (1, "x2")]
D_B = [(2, 20), (2, 21), (4, 40)]
SCHEMA_A = "k long, a string"
SCHEMA_B = "k long, b long"


def _full_join_rows(spark):
    a = spark.createDataFrame(A_OLD + D_A, SCHEMA_A)
    b = spark.createDataFrame(B_OLD + D_B, SCHEMA_B)
    return sorted(tuple(r) for r in a.join(b, ["k"]).collect())


def test_join_delta_identity_with_multiplicities(spark):
    a_old = spark.createDataFrame(A_OLD, SCHEMA_A)
    b_old = spark.createDataFrame(B_OLD, SCHEMA_B)
    d_a = spark.createDataFrame(D_A, SCHEMA_A)
    d_b = spark.createDataFrame(D_B, SCHEMA_B)
    old_join = sorted(
        tuple(r) for r in a_old.join(b_old, ["k"]).collect()
    )
    delta = sorted(
        tuple(r)
        for r in matview.join_delta(a_old, d_a, b_old, d_b, ["k"]).collect()
    )
    assert sorted(old_join + delta) == _full_join_rows(spark)
    # duplicate-key multiplicity: k=2 has 2 A-rows x 2 new B-rows
    assert sum(1 for r in delta if r[0] == 2) == 4


def test_refresh_materialized_join_equals_full(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="mvj_"), "view")
    a_old = spark.createDataFrame(A_OLD, SCHEMA_A)
    b_old = spark.createDataFrame(B_OLD, SCHEMA_B)
    d_a = spark.createDataFrame(D_A, SCHEMA_A)
    d_b = spark.createDataFrame(D_B, SCHEMA_B)
    matview.create_materialized_join(a_old, b_old, ["k"], path)
    matview.refresh_materialized_join(
        spark, path, a_old, d_a, b_old, d_b, ["k"]
    )
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == _full_join_rows(spark)


def test_refresh_materialized_join_tag_replay_noop(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="mvj_"), "view")
    a_old = spark.createDataFrame(A_OLD, SCHEMA_A)
    b_old = spark.createDataFrame(B_OLD, SCHEMA_B)
    d_a = spark.createDataFrame(D_A, SCHEMA_A)
    d_b = spark.createDataFrame(D_B, SCHEMA_B)
    matview.create_materialized_join(a_old, b_old, ["k"], path)
    assert matview.refresh_materialized_join(
        spark, path, a_old, d_a, b_old, d_b, ["k"], tag="e0"
    )
    n1 = spark.read.parquet(path).count()
    # replayed epoch: no-op, no double-fold
    assert not matview.refresh_materialized_join(
        spark, path, a_old, d_a, b_old, d_b, ["k"], tag="e0"
    )
    assert spark.read.parquet(path).count() == n1


def test_empty_deltas_change_nothing(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="mvj_"), "view")
    a_old = spark.createDataFrame(A_OLD, SCHEMA_A)
    b_old = spark.createDataFrame(B_OLD, SCHEMA_B)
    empty_a = spark.createDataFrame([], SCHEMA_A)
    empty_b = spark.createDataFrame([], SCHEMA_B)
    matview.create_materialized_join(a_old, b_old, ["k"], path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    matview.refresh_materialized_join(
        spark, path, a_old, empty_a, b_old, empty_b, ["k"]
    )
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert before == after
