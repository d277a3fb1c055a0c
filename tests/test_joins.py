"""Binned interval join and salted skew join: equivalence + plan shape."""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators.joins import interval_join, salted_join


def _frames(spark):
    points = spark.createDataFrame(
        [(i, "u%d" % (i % 2), i * 100) for i in range(40)],
        "pid: long, k: string, t: long",
    )
    intervals = spark.createDataFrame(
        [
            (1, "u0", 150, 450),     # hits t=200,400 for u0
            (2, "u1", 100, 100),     # point interval: exactly t=100
            (3, "u0", 3800, 10000),  # tail
            (4, "u1", 900, 700),     # malformed: matches nothing
        ],
        "iid: long, k: string, t_start: long, t_end: long",
    )
    return points, intervals


def _naive(points, intervals, by):
    cond = (points["t"] >= intervals["t_start"]) & (
        points["t"] <= intervals["t_end"]
    )
    for c in by:
        cond = cond & (points[c] == intervals[c])
    return {
        (r.pid, r.iid)
        for r in points.join(
            intervals.drop(*by) if by else intervals, cond
        ).collect()
    }


def test_interval_join_matches_naive_range_join(spark):
    points, intervals = _frames(spark)
    for width in (50, 100, 1000, 7):
        got = {
            (r.pid, r.iid)
            for r in interval_join(
                points, intervals, "t", "t_start", "t_end", by=["k"],
                bin_width=width,
            ).collect()
        }
        naive = {
            (r.pid, r.iid)
            for r in points.alias("p")
            .join(
                intervals.alias("i"),
                (F.col("p.k") == F.col("i.k"))
                & (F.col("p.t") >= F.col("i.t_start"))
                & (F.col("p.t") <= F.col("i.t_end")),
            )
            .collect()
        }
        assert got == naive and got, f"bin_width={width}"


def test_interval_join_without_keys_and_reserved_names(spark):
    points, intervals = _frames(spark)
    got = interval_join(
        points.drop("k"), intervals.drop("k"), "t", "t_start", "t_end",
        bin_width=100,
    )
    assert got.count() > 0
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(points, intervals.withColumnRenamed("iid", "pid"),
                      "t", "t_start", "t_end", by=["k"])


def test_interval_join_is_hash_join_not_nested_loop(spark):
    points, intervals = _frames(spark)
    plan = (
        interval_join(points, intervals, "t", "t_start", "t_end", by=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_span_guard_raises_on_sentinel(spark):
    # one open-ended interval (end = Long.MAX sentinel) must fail the
    # job with a clear message instead of sequencing ~10^12 bins
    points, intervals = _frames(spark)
    poisoned = intervals.union(
        spark.createDataFrame(
            [(99, "u0", 0, 2**62)],
            "iid: long, k: string, t_start: long, t_end: long",
        )
    )
    out = interval_join(
        points, poisoned, "t", "t_start", "t_end", by=["k"], bin_width=100
    )
    with pytest.raises(Exception, match="interval_join: interval spans"):
        out.collect()
    # under the cap the guard is transparent: a tight-but-sufficient cap
    # yields exactly the rows the unguarded default produces
    tight = interval_join(
        points, intervals, "t", "t_start", "t_end", by=["k"],
        bin_width=100, max_bins_per_interval=100,
    )
    base = interval_join(
        points, intervals, "t", "t_start", "t_end", by=["k"], bin_width=100
    )
    assert {(r.pid, r.iid) for r in tight.collect()} == {
        (r.pid, r.iid) for r in base.collect()
    }


def test_interval_join_rejects_non_integral_time_columns(spark):
    points, intervals = _frames(spark)
    with pytest.raises(TypeError, match="must be integral"):
        interval_join(
            points.withColumn("t", F.col("t").cast("double")),
            intervals, "t", "t_start", "t_end", by=["k"],
        )
    with pytest.raises(TypeError, match="must be integral"):
        interval_join(
            points, intervals.withColumn("t_end", F.col("t_end").cast("decimal(20,2)")),
            "t", "t_start", "t_end", by=["k"],
        )


def test_salted_join_identical_to_plain(spark):
    left = spark.createDataFrame(
        # skewed: key 0 holds half the rows
        [(i, i % 7 if i % 2 else 0) for i in range(200)],
        "lid: long, key: long",
    )
    right = spark.createDataFrame(
        [(k, "payload%d" % k) for k in range(7)], "key: long, tag: string"
    )
    plain_inner = {(r.lid, r.tag) for r in left.join(right, ["key"]).collect()}
    salted_inner = {
        (r.lid, r.tag)
        for r in salted_join(left, right, ["key"], num_salts=5).collect()
    }
    assert salted_inner == plain_inner
    # left join keeps unmatched left rows exactly once
    right_partial = right.filter(F.col("key") < 3)
    plain_left = sorted(
        (r.lid, r.tag) for r in left.join(right_partial, ["key"], "left").collect()
    )
    salted_left = sorted(
        (r.lid, r.tag)
        for r in salted_join(left, right_partial, ["key"], num_salts=5,
                             how="left").collect()
    )
    assert salted_left == plain_left
    with pytest.raises(ValueError, match="inner"):
        salted_join(left, right, ["key"], how="outer")


def test_interval_join_left_keeps_unmatched_points(spark):
    pts = spark.createDataFrame(
        [(1, 5, "a"), (1, 50, "b"), (2, 5, "c"), (1, 5, "d")],
        "k: long, t: long, tag: string",
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, "early"), (1, 40, 60, "late")],
        "k: long, lo: long, hi: long, label: string",
    )
    out = interval_join(
        pts, ivs, "t", "lo", "hi", by=["k"], bin_width=10, how="left"
    )
    rows = {(r.k, r.t, r.tag): r.label for r in out.collect()}
    assert rows == {
        (1, 5, "a"): "early",
        (1, 50, "b"): "late",
        (1, 5, "d"): "early",
        (2, 5, "c"): None,  # key with no intervals: NULL interval cols
    }
    # a point sharing a BIN but failing the range filter still gets its
    # NULL row (the naive left-join-over-bins would lose it)
    pts2 = spark.createDataFrame([(1, 15, "x")], "k: long, t: long, tag: string")
    out2 = interval_join(
        pts2, ivs, "t", "lo", "hi", by=["k"], bin_width=10, how="left"
    ).collect()
    assert len(out2) == 1 and out2[0].label is None
    # inner result is exactly the left result minus NULL rows
    inner = interval_join(
        pts, ivs, "t", "lo", "hi", by=["k"], bin_width=10
    )
    assert inner.count() == sum(1 for v in rows.values() if v is not None)
    with pytest.raises(ValueError, match="how="):
        interval_join(pts, ivs, "t", "lo", "hi", how="full")
