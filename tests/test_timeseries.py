"""gap_fill / resample: dense-axis construction and fill strategies."""

import datetime

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators.timeseries import (
    gap_fill,
    resample,
    time_bucket,
)


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # group "a": days 1, 2, 5 observed (gap at 3, 4)
        ("a", _ts(1), 10.0),
        ("a", _ts(2), 20.0),
        ("a", _ts(2, 6), 30.0),
        ("a", _ts(5), 50.0),
        # group "b": single observation — axis must be exactly 1 bucket
        ("b", _ts(3), 7.0),
    ]
    return spark.createDataFrame(rows, "g string, ts timestamp, v double")


def test_resample_skips_empty_buckets(events):
    out = resample(
        events,
        "ts",
        86400,
        ["g"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")],
    )
    got = {(r["g"], r["bucket_start"]): (r["n"], r["sv"]) for r in out.collect()}
    day1 = int(_ts(1).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert got[("a", day1 + 86400)] == (2, 50.0)  # two events on day 2
    assert len([k for k in got if k[0] == "a"]) == 3  # no empty buckets


def test_gap_fill_zero_and_span(events):
    out = gap_fill(
        events,
        "ts",
        86400,
        ["g"],
        [F.count(F.lit(1)).alias("n")],
        fill={"n": "zero"},
    ).collect()
    a = sorted((r["bucket_start"], r["n"]) for r in out if r["g"] == "a")
    assert len(a) == 5  # days 1..5 dense
    assert [n for _, n in a] == [1, 2, 0, 0, 1]
    b = [r for r in out if r["g"] == "b"]
    assert len(b) == 1 and b[0]["n"] == 1


def test_gap_fill_ffill_and_linear(events):
    out = gap_fill(
        events,
        "ts",
        86400,
        ["g"],
        [F.avg("v").alias("f"), F.avg("v").alias("li")],
        fill={"f": "ffill", "li": "linear"},
    ).collect()
    a = sorted(
        ((r["bucket_start"], r["f"], r["li"]) for r in out if r["g"] == "a")
    )
    # observed day-2 average is (20+30)/2 = 25
    assert [round(x[1], 6) for x in a] == [10.0, 25.0, 25.0, 25.0, 50.0]
    # linear: day 3 = 25 + (50-25)*1/3, day 4 = 25 + (50-25)*2/3
    assert [round(x[2], 6) for x in a] == [
        10.0,
        25.0,
        round(25 + 25 / 3, 6),
        round(25 + 50 / 3, 6),
        50.0,
    ]


def test_gap_fill_leading_gap_linear_falls_back(spark):
    # first bucket NULL-valued is impossible by construction (axis
    # spans observed buckets), but a leading run of buckets where a
    # DIFFERENT column is observed exercises the pv-NULL edge: value
    # column observed only late in the span.
    rows = [
        ("g", _ts(1), None),
        ("g", _ts(3), 30.0),
        ("g", _ts(5), None),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = gap_fill(
        df,
        "ts",
        86400,
        ["g"],
        [F.max("v").alias("m")],
        fill={"m": "linear"},
    ).collect()
    vals = [r["m"] for r in sorted(out, key=lambda r: r["bucket_start"])]
    # days 1,2 lean on the only later observation; days 4,5 on the
    # only earlier one
    assert vals == [30.0, 30.0, 30.0, 30.0, 30.0]


def test_time_bucket_validates():
    with pytest.raises(ValueError):
        time_bucket(F.col("ts"), 0)


def test_gap_fill_validates_fill_columns(events):
    with pytest.raises(ValueError, match="unknown columns"):
        gap_fill(
            events,
            "ts",
            86400,
            ["g"],
            [F.count(F.lit(1)).alias("n")],
            fill={"nope": "zero"},
        )
    with pytest.raises(ValueError, match="group column"):
        gap_fill(events, "ts", 86400, [], [F.count(F.lit(1)).alias("n")])
    with pytest.raises(ValueError, match="unknown fill strategy"):
        gap_fill(
            events,
            "ts",
            86400,
            ["g"],
            [F.count(F.lit(1)).alias("n")],
            fill={"n": "cubic"},
        )


def test_rolling_time_range(spark):
    from dataset_grouper_spark.operators.timeseries import rolling

    rows = [
        ("g", 0, 1.0),
        ("g", 50, 2.0),
        ("g", 100, 4.0),   # window [0,100]: all three
        ("g", 161, 8.0),   # window [61,161]: 100 and itself
        ("h", 100, 16.0),  # other group isolated
    ]
    df = spark.createDataFrame(rows, "g string, sec long, v double")
    out = rolling(
        df,
        "sec",
        100,
        ["g"],
        {"n": F.count(F.lit(1)), "sv": F.sum("v")},
    )
    got = {(r["g"], r["sec"]): (r["n"], r["sv"]) for r in out.collect()}
    assert got[("g", 0)] == (1, 1.0)
    assert got[("g", 50)] == (2, 3.0)
    assert got[("g", 100)] == (3, 7.0)
    assert got[("g", 161)] == (2, 12.0)
    assert got[("h", 100)] == (1, 16.0)


def test_rolling_same_second_peers(spark):
    from dataset_grouper_spark.operators.timeseries import rolling

    df = spark.createDataFrame(
        [("g", 5, 1.0), ("g", 5, 2.0)], "g string, sec long, v double"
    )
    out = rolling(df, "sec", 10, ["g"], {"sv": F.sum("v")}).collect()
    # frame-peers: both rows see both values
    assert [r["sv"] for r in out] == [3.0, 3.0]


def test_rolling_validates(spark):
    from dataset_grouper_spark.operators.timeseries import rolling

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, sec long, v double")
    with pytest.raises(ValueError, match="window_seconds"):
        rolling(df, "sec", 0, ["g"], {"n": F.count(F.lit(1))})


def test_rolling_name_collision_raises(spark):
    from dataset_grouper_spark.operators.timeseries import rolling

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, sec long, v double")
    with pytest.raises(ValueError, match="collide"):
        rolling(df, "sec", 10, ["g"], {"v": F.sum("v")})
