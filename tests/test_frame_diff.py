"""frame_diff: keyed reconciliation and exact multiset diff."""

import pytest

from dataset_grouper_spark.operators.diff import frame_diff


def test_keyed_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None)],
        "id long, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
        "id long, s string, v int",
    )
    got = {
        (r["id"], r["status"])
        for r in frame_diff(old, new, keys=["id"]).collect()
    }
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


def test_keyed_null_safe_change_detection(spark):
    old = spark.createDataFrame([(1, None)], "id long, v int")
    new_same = spark.createDataFrame([(1, None)], "id long, v int")
    new_set = spark.createDataFrame([(1, 5)], "id long, v int")
    assert frame_diff(old, new_same, keys=["id"]).count() == 0
    rows = frame_diff(old, new_set, keys=["id"]).collect()
    assert [(r["id"], r["status"]) for r in rows] == [(1, "changed")]


def test_multiset_diff(spark):
    old = spark.createDataFrame(
        [("x",), ("x",), ("y",)], "s string"
    )
    new = spark.createDataFrame(
        [("x",), ("y",), ("y",), ("z",)], "s string"
    )
    got = {
        (r["s"], r["status"], r["multiplicity"])
        for r in frame_diff(old, new).collect()
    }
    assert got == {
        ("x", "removed", 1),
        ("y", "added", 1),
        ("z", "added", 1),
    }


def test_validation(spark):
    a = spark.createDataFrame([(1,)], "id long")
    b = spark.createDataFrame([(1, 2)], "id long, v long")
    with pytest.raises(ValueError, match="column mismatch"):
        frame_diff(a, b)
    with pytest.raises(ValueError, match="not in columns"):
        frame_diff(a, a, keys=["nope"])
