"""Backward as-of join: inclusive ties, left-outer nulls, tolerance."""

from dataset_grouper_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "l1"), ("u1", 20, "l2"), ("u2", 5, "l3"), ("u3", 9, "l4")],
        "k: string, t: long, tag: string",
    )
    right = spark.createDataFrame(
        [("u1", 8, 1.5), ("u1", 10, 2.5), ("u1", 19, 3.5), ("u2", 6, 9.9)],
        "k: string, t: long, v: double",
    )
    return left, right


def test_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = {
        r.tag: (r.t_asof, r.v_asof)
        for r in asof_join(left, right, "t", ["k"], ["v"]).collect()
    }
    assert out["l1"] == (10, 2.5)   # tie at t=10 matches (inclusive)
    assert out["l2"] == (19, 3.5)
    assert out["l3"] == (None, None)  # right row is later -> no match
    assert out["l4"] == (None, None)  # key with no right rows at all
    assert len(out) == 4


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    out = {
        r.tag: (r.t_asof, r.v_asof)
        for r in asof_join(left, right, "t", ["k"], ["v"], tolerance=1).collect()
    }
    assert out["l1"] == (10, 2.5)    # age 0 <= 1
    assert out["l2"] == (19, 3.5)    # age 1 <= 1
    assert out["l3"] == (None, None)


def test_struct_payload_row_consistency(spark):
    # right columns with nulls must still come from ONE matched row
    left = spark.createDataFrame([("u1", 10, "l1")], "k: string, t: long, tag: string")
    right = spark.createDataFrame(
        [("u1", 5, 1.0, None), ("u1", 8, None, "b8")],
        "k: string, t: long, v: double, w: string",
    )
    r = asof_join(left, right, "t", ["k"], ["v", "w"]).collect()[0]
    # matched row is t=8: v must be NULL from that row, not 1.0 from t=5
    assert (r.t_asof, r.v_asof, r.w_asof) == (8, None, "b8")


def test_single_exchange_plan(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "t", ["k"], ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 2  # union sides feed ONE window shuffle
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_reserved_helper_names_raise(spark):
    import pytest

    left = spark.createDataFrame(
        [("u1", 10, "x")], "k: string, t: long, _side: string"
    )
    right = spark.createDataFrame([("u1", 8, 1.5)], "k: string, t: long, v: double")
    with pytest.raises(ValueError, match="_side"):
        asof_join(left, right, "t", ["k"], ["v"])
    # collision on the RIGHT side raises too
    right2 = spark.createDataFrame(
        [("u1", 8, 1.5)], "k: string, t: long, _rpay: double"
    )
    left2 = spark.createDataFrame([("u1", 10, "x")], "k: string, t: long, tag: string")
    with pytest.raises(ValueError, match="_rpay"):
        asof_join(left2, right2, "t", ["k"], ["_rpay"])
