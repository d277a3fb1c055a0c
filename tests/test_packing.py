"""Byte-cap packing semantics — the MergeWithLimitFn goldens.

FIXTURES F7 (from beam_transforms_test.py:70-122): payload sizes
group1=[1,1,1], group2=[2,2]; caps 3/4/5. Cap rule: keep row iff
inclusive running byte sum < limit, in stable ord order.
"""

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.operators import packing


@pytest.fixture()
def cap_df(spark):
    rows = [
        ("group1", b"a", 0),
        ("group1", b"b", 1),
        ("group1", b"c", 2),
        ("group2", b"dd", 0),
        ("group2", b"ee", 1),
    ]
    return spark.createDataFrame(rows, "group_id: string, payload: binary, ord: long")


def kept(df, limit):
    capped = packing.cap_prefix(
        df, "ord", F.octet_length("payload").cast("long"), limit
    )
    out = {}
    for r in capped.collect():
        out.setdefault(r.group_id, []).append(bytes(r.payload))
    return {g: v for g, v in out.items()}


def test_cap_limit_5(cap_df):
    assert kept(cap_df, 5) == {"group1": [b"a", b"b", b"c"], "group2": [b"dd", b"ee"]}


def test_cap_limit_4(cap_df):
    assert kept(cap_df, 4) == {"group1": [b"a", b"b", b"c"], "group2": [b"dd"]}


def test_cap_limit_3(cap_df):
    assert kept(cap_df, 3) == {"group1": [b"a", b"b"], "group2": [b"dd"]}


def test_pack_groups_orders_payloads(spark):
    # Packing returns per-group ordered arrays (deterministic by ord),
    # the relational stand-in for SequenceExample feature-lists
    # (serialization.py:51-62).
    df = spark.createDataFrame(
        [("x", 2, "late"), ("x", 1, "early"), ("y", 1, "only")],
        "k: string, ord: long, s: string",
    )
    out = packing.pack_groups(
        df, keys.by_feature("k"), "ord", limit=10**9, payload_col="s"
    )
    rows = {r.group_id: r for r in out.collect()}
    assert rows["x"].packed == ["early", "late"]
    assert rows["x"].num_examples == 2
    assert rows["y"].packed == ["only"]


def test_pack_groups_cap_drops_tail(spark):
    df = spark.createDataFrame(
        [("g", i, "x" * 10) for i in range(5)], "k: string, ord: long, s: string"
    )
    # each row: 8 (ord long) + 1 (k) + 10 (s) = 19 bytes; cap 40 keeps 2
    out = packing.pack_groups(df, keys.by_feature("k"), "ord", limit=40)
    row = out.collect()[0]
    assert row.num_examples == 2
