"""Differentially-private group releases: calibrated seeded Laplace."""

import math

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.functions import dp


@pytest.fixture(scope="module")
def groups_df(spark):
    # 1000 groups x 10 rows each
    return spark.range(10_000).select(
        (F.col("id") % 1000).alias("g"), F.lit(1).alias("v")
    )


def test_dp_counts_deterministic_and_centered(spark, groups_df):
    a = dp.dp_group_counts(groups_df, "g", epsilon=1.0, seed=7)
    b = dp.dp_group_counts(groups_df, "g", epsilon=1.0, seed=7)
    ra = {r["group_id"]: r["dp_count"] for r in a.collect()}
    rb = {r["group_id"]: r["dp_count"] for r in b.collect()}
    assert ra == rb
    errs = [v - 10 for v in ra.values()]
    n = len(errs)
    mean = sum(errs) / n
    # Laplace(0, 1): mean ~ 0 within a few std errors (std = sqrt(2))
    assert abs(mean) < 4 * math.sqrt(2) / math.sqrt(n)
    # noise is actually present
    assert sum(1 for e in errs if abs(e) > 0.01) > n * 0.9


def test_dp_scale_tracks_epsilon(spark, groups_df):
    tight = dp.dp_group_counts(groups_df, "g", epsilon=10.0, seed=7)
    loose = dp.dp_group_counts(groups_df, "g", epsilon=0.1, seed=7)
    mt = sum(
        abs(r["dp_count"] - 10) for r in tight.collect()
    ) / 1000
    ml = sum(
        abs(r["dp_count"] - 10) for r in loose.collect()
    ) / 1000
    # mean |Laplace(b)| = b -> ratio of epsilons = 100x
    assert ml / mt > 50


def test_different_seeds_differ(spark, groups_df):
    a = {
        r["group_id"]: r["dp_count"]
        for r in dp.dp_group_counts(
            groups_df, "g", epsilon=1.0, seed=1
        ).collect()
    }
    b = {
        r["group_id"]: r["dp_count"]
        for r in dp.dp_group_counts(
            groups_df, "g", epsilon=1.0, seed=2
        ).collect()
    }
    assert sum(1 for k in a if a[k] != b[k]) > 900


def test_dp_sums_clamp_bounds_sensitivity(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 1e9), ("b", -3.0)], "g string, v double"
    )
    out = {
        r["group_id"]: r["dp_sum"]
        for r in dp.dp_group_sums(
            df, "g", "v", epsilon=1000.0, clamp=10.0, seed=3
        ).collect()
    }
    # the 1e9 outlier contributes at most the clamp
    assert out["a"] < 5.0 + 10.0 + 1.0
    assert out["b"] > -10.0 - 1.0


def test_sql_twin_matches_spark(spark, groups_df):
    import duckdb

    got = {
        r["group_id"]: r["dp_count"]
        for r in dp.dp_group_counts(
            groups_df, "g", epsilon=2.0, seed=11
        ).collect()
    }
    noise = dp.laplace_noise_sql("CAST(g AS VARCHAR)", 0.5, 11, tag="c")
    duck = duckdb.sql(
        f"""
        WITH t AS (SELECT range % 1000 AS g FROM range(10000))
        SELECT CAST(g AS VARCHAR) AS gid,
               round(count(*) + {noise}, 6) AS dp
        FROM t GROUP BY g
        """
    ).fetchall()
    dd = {r[0]: r[1] for r in duck}
    assert got == dd


def test_thresholded_release_suppresses_small_groups(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 10 + [("b", 1)] * 2 + [("c", 1)] * 5,
        "g string, v int",
    )
    out = {
        r["group_id"]: r["n"]
        for r in dp.thresholded_group_counts(df, "g", 5).collect()
    }
    assert out == {"a": 10, "c": 5}  # b (2 rows) suppressed


def test_geometric_counts_integer_and_deterministic(spark, groups_df):
    a = dp.dp_group_counts_geometric(groups_df, "g", epsilon=0.5, seed=9)
    b = dp.dp_group_counts_geometric(groups_df, "g", epsilon=0.5, seed=9)
    ra = {r["group_id"]: r["dp_count"] for r in a.collect()}
    rb = {r["group_id"]: r["dp_count"] for r in b.collect()}
    assert ra == rb
    assert all(isinstance(v, int) for v in ra.values())
    errs = [v - 10 for v in ra.values()]
    # discrete Laplace(eps=0.5): mean 0, noisy for most groups
    assert abs(sum(errs)) / len(errs) < 1.0
    assert sum(1 for e in errs if e != 0) > len(errs) * 0.5


def test_geometric_sql_twin_matches_spark(spark, groups_df):
    import duckdb

    got = {
        r["group_id"]: r["dp_count"]
        for r in dp.dp_group_counts_geometric(
            groups_df, "g", epsilon=1.5, seed=4
        ).collect()
    }
    noise = dp.geometric_noise_sql("CAST(g AS VARCHAR)", 1.5, 4)
    duck = duckdb.sql(
        f"""
        WITH t AS (SELECT range % 1000 AS g FROM range(10000))
        SELECT CAST(g AS VARCHAR), count(*) + {noise} FROM t GROUP BY g
        """
    ).fetchall()
    assert got == {r[0]: r[1] for r in duck}


def test_count_and_sum_noise_are_independent(spark, groups_df=None):
    # the count and sum mechanisms must NOT share a noise dimension:
    # with shared noise, knowing a group's true count recovers its
    # true sum exactly (noise_sum = scale_ratio * noise_count)
    df = spark.createDataFrame(
        [("a", 1.0)] * 10 + [("b", 2.0)] * 5, "g string, v double"
    )
    counts = {
        r["group_id"]: r["dp_count"]
        for r in dp.dp_group_counts(df, "g", epsilon=1.0, seed=3).collect()
    }
    sums = {
        r["group_id"]: r["dp_sum"]
        for r in dp.dp_group_sums(
            df, "g", "v", epsilon=1.0, clamp=2.0, seed=3
        ).collect()
    }
    true_counts = {"a": 10, "b": 5}
    true_sums = {"a": 10.0, "b": 10.0}
    ratios = [
        (sums[g] - true_sums[g]) / (counts[g] - true_counts[g])
        for g in ("a", "b")
        if abs(counts[g] - true_counts[g]) > 1e-9
    ]
    # under shared noise every ratio equals clamp/sensitivity exactly
    assert len(set(round(r, 6) for r in ratios)) > 1 or all(
        abs(r - 2.0) > 1e-6 for r in ratios
    )


def test_epsilon_must_be_positive(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    for bad in (0.0, -1.0):
        with _pytest.raises(ValueError):
            dp.dp_group_counts(df, "g", epsilon=bad)
        with _pytest.raises(ValueError):
            dp.dp_group_sums(df, "g", "v", epsilon=bad, clamp=1.0)
        with _pytest.raises(ValueError):
            dp.dp_group_counts_geometric(df, "g", epsilon=bad)
