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


def test_monster_row_prefiltered_not_prefix_veto(spark):
    # a row whose individual size meets the limit can never be admitted;
    # it is excluded BEFORE the window, so rows ordered after it still
    # get the budget (prefix over admissible rows), and the audit twin
    # reports exactly what was excluded
    rows = [
        ("g", b"aa", 0),        # 2
        ("g", b"x" * 50, 1),    # monster: 50 >= limit 10
        ("g", b"bb", 2),        # 2
        ("g", b"cc", 3),        # 2
        ("h", b"dd", 0),
    ]
    df = spark.createDataFrame(
        rows, "group_id: string, payload: binary, ord: long"
    )
    size = F.octet_length("payload").cast("long")
    got = kept(df, 10)
    assert got == {"g": [b"aa", b"bb", b"cc"], "h": [b"dd"]}
    audit = {
        r.group_id: (r.n_oversized, r.oversized_bytes)
        for r in packing.oversized_rows(df, size, 10).collect()
    }
    assert audit == {"g": (1, 50)}


def test_monster_prefilter_runs_below_window_sort(spark):
    # the _sz >= limit exclusion must be a plain filter UPSTREAM of the
    # window's sort+exchange — tree text is parent-first, so the
    # pre-filter appears after (deeper than) the Window/Sort nodes
    from dataset_grouper_spark.plans import plan_text

    df = spark.createDataFrame(
        [("g", b"aa", 0)], "group_id: string, payload: binary, ord: long"
    )
    capped = packing.cap_prefix(
        df, "ord", F.octet_length("payload").cast("long"), 10
    )
    txt = plan_text(capped, "simple")
    win = txt.index("Window")
    assert "Sort" in txt
    # a filter mentioning the size bound sits deeper than the window
    below = txt[win:]
    assert "< 10" in below and "Filter" in below
