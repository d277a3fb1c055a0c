"""Closed-form distributed OLS over sufficient statistics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import regress


@pytest.fixture()
def xy(spark):
    rng = np.random.RandomState(7)
    x0 = rng.randint(0, 200, 400)
    x1 = rng.randint(0, 50, 400)
    # integral response with real noise and a known-ish structure
    y = (3 + 2 * x0 + 5 * x1 + rng.randint(-10, 11, 400)).astype(int)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(x0, x1, y)]
    df = spark.createDataFrame(rows, "x0 long, x1 long, y long")
    return df, np.column_stack([np.ones(400), x0, x1]), y.astype(float)


def test_ols_fit2_matches_numpy(spark, xy):
    df, X, y = xy
    row = regress.ols_fit2(df, "y", ["x0", "x1"], digits=6).collect()[0]
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    assert row["n"] == 400
    assert row["beta0"] == pytest.approx(beta[0], abs=2e-6)
    assert row["beta1"] == pytest.approx(beta[1], abs=2e-6)
    assert row["beta2"] == pytest.approx(beta[2], abs=2e-6)
    resid = y - X @ beta
    r2 = 1 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert row["r2"] == pytest.approx(r2, abs=2e-6)


def test_ols_fit2_matches_sql_twin_bitwise(spark, xy):
    import duckdb

    df, _, _ = xy
    srow = regress.ols_fit2(df, "y", ["x0", "x1"]).collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    orow = con.sql(
        regress.ols_fit2_sql("t", "y", ["x0", "x1"])
    ).df().iloc[0]
    # determinism contract: identical floats, not approx
    assert (srow["beta0"], srow["beta1"], srow["beta2"], srow["r2"]) == (
        orow["beta0"], orow["beta1"], orow["beta2"], orow["r2"],
    )


def test_ols_fit_general_k(spark):
    rng = np.random.RandomState(11)
    X = rng.randint(0, 100, size=(300, 4))
    y = 7 + X @ np.array([1, -2, 3, 4]) + rng.randint(-5, 6, 300)
    rows = [tuple(int(v) for v in r) + (int(t),) for r, t in zip(X, y)]
    df = spark.createDataFrame(
        rows, "x0 long, x1 long, x2 long, x3 long, y long"
    )
    beta = regress.ols_fit(df, "y", ["x0", "x1", "x2", "x3"])
    Xd = np.column_stack([np.ones(300), X])
    expect = np.linalg.lstsq(Xd, y.astype(float), rcond=None)[0]
    assert np.allclose(beta, expect, atol=1e-8)


def test_ols_fit2_requires_two_features(spark, xy):
    df, _, _ = xy
    with pytest.raises(ValueError):
        regress.ols_fit2(df, "y", ["x0"])


def test_gram_sums_single_pass_no_shuffle_explosion(spark, xy):
    df, _, _ = xy
    plan = regress.ols_fit2(df, "y", ["x0", "x1"])._jdf.queryExecution(
    ).executedPlan().toString()
    # one hash-aggregate pair (partial + final), no join, no window
    assert "Join" not in plan and "Window" not in plan


def test_incremental_ols_via_matview(spark, tmp_path):
    """The Gram row is ADDITIVE, so the closed-form fit composes with
    the incremental-matview fold: maintaining the sufficient stats as
    a materialized rollup and solving on read equals the batch fit —
    a continuously-updated linear model with O(batch) refresh cost."""
    import os

    from pyspark.sql import functions as F

    from dataset_grouper_spark.operators import matview

    rng = np.random.RandomState(3)
    x0 = rng.randint(0, 100, 600)
    x1 = rng.randint(0, 30, 600)
    y = 10 + 4 * x0 - 2 * x1 + rng.randint(-3, 4, 600)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(x0, x1, y)]
    df = spark.createDataFrame(rows, "x0 long, x1 long, y long")
    sums = {
        "n": F.lit(1),
        "sx0": F.col("x0"),
        "sx0y": F.col("x0") * F.col("y"),
        "sx0x0": F.col("x0") * F.col("x0"),
        "sx0x1": F.col("x0") * F.col("x1"),
        "sx1": F.col("x1"),
        "sx1y": F.col("x1") * F.col("y"),
        "sx1x1": F.col("x1") * F.col("x1"),
        "sy": F.col("y"),
        "syy": F.col("y") * F.col("y"),
    }
    path = os.path.join(str(tmp_path), "gram")
    df0, df1, df2 = (df.filter(F.col("x0") % 3 == i) for i in range(3))
    matview.create_materialized_sums(df0.withColumn("k", F.lit(1)), ["k"], sums, path)
    for i, batch in enumerate((df1, df2)):
        matview.refresh_materialized_sums(
            spark, batch.withColumn("k", F.lit(1)), ["k"], sums, path,
            tag=f"b{i}",
        )
    stored = spark.read.parquet(path).drop("k")
    incr = regress._cramer2(stored, 6).collect()[0]
    batch_fit = regress.ols_fit2(df, "y", ["x0", "x1"], 6).collect()[0]
    assert incr.asDict() == batch_fit.asDict()
