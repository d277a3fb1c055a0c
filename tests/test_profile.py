"""Group numeric profiling: exact quantiles, naming, null handling."""

from dataset_grouper_spark.operators.profile import group_numeric_profile


def test_profile_exact_values(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)] + [("b", 10.0)],
        "g: string, v: double",
    )
    rows = {r.g: r for r in group_numeric_profile(df, ["g"], "v").collect()}
    a = rows["a"]
    assert (a.n, a.min_v, a.max_v, a.mean_v) == (5, 1.0, 5.0, 3.0)
    # interpolated: p25 of [1..5] = 2.0, p50 = 3.0, p95 = 4.8
    assert (a.p25, a.p50, a.p95) == (2.0, 3.0, 4.8)
    b = rows["b"]
    assert (b.n, b.p50, b.p99) == (1, 10.0, 10.0)


def test_quantile_column_naming(spark):
    df = spark.createDataFrame([("a", 1.0)], "g: string, v: double")
    out = group_numeric_profile(df, ["g"], "v", quantiles=(0.5, 0.999))
    assert "p50" in out.columns and "p99_9" in out.columns
