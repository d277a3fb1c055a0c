"""Group numeric profiling: exact quantiles, naming, null handling."""

import pytest
from pyspark.sql import functions as F
from dataset_grouper_spark.operators import profile
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


def test_equidepth_bins_balanced_and_ordered(spark):
    # 100 rows, 4 bins -> 25 each; skewed values (50 identical zeros)
    # still split evenly because ties order by id
    rows = [(i, 0.0 if i < 50 else float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_id: long, value: double")
    out = {
        r["bin"]: (r["n_rows"], r["lo"], r["hi"])
        for r in profile.equidepth_bins(df, "value", "event_id", 4).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert all(n == 25 for n, _, _ in out.values())
    assert out[0] == (25, 0.0, 0.0)       # hot value fills bin 0
    assert out[1][0] == 25 and out[1][1] == 0.0
    # bins are value-ordered: lo of each >= hi of previous
    assert out[2][1] >= out[1][2]
    assert out[3][1] >= out[2][2]


def test_equidepth_bins_uneven_total(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "event_id: long, value: double"
    )
    out = profile.equidepth_bins(df, "value", "event_id", 3).collect()
    sizes = sorted(r["n_rows"] for r in out)
    assert sizes == [3, 3, 4]
    assert sum(sizes) == 10


def test_distribution_drift_closed_form(spark):
    import math

    a = spark.createDataFrame(
        [("x",)] * 6 + [("y",)] * 2, "source: string"
    )
    b = spark.createDataFrame(
        [("x",)] * 2 + [("z",)] * 2, "source: string"
    )
    out = {
        r["category"]: r
        for r in profile.distribution_drift(a, b, "source", k=0.5).collect()
    }
    assert set(out) == {"x", "y", "z"}
    # union vocab V=3, ta=8, tb=4; share_a(x) = 6.5/9.5, share_b(x)=2.5/5.5
    pa_x, pb_x = 6.5 / 9.5, 2.5 / 5.5
    assert out["x"]["share_a"] == pytest.approx(pa_x, abs=1e-12)
    assert out["x"]["kl_term"] == pytest.approx(
        pa_x * math.log(pa_x / pb_x), abs=1e-12
    )
    # one-sided categories get the k-floor, counts show 0
    assert out["z"]["n_a"] == 0 and out["z"]["n_b"] == 2
    assert out["y"]["n_b"] == 0
    # KL of identical distributions is 0
    same = profile.distribution_drift(a, a, "source").agg(
        F.sum("kl_term").alias("kl")
    ).collect()[0]["kl"]
    assert same == pytest.approx(0.0, abs=1e-12)
