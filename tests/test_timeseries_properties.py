"""Randomized model tests: gap_fill against a pure-Python reference,
frame_diff against dict/Counter models."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dataset_grouper_spark.operators.diff import frame_diff
from dataset_grouper_spark.operators.timeseries import gap_fill

B = 10  # bucket width

events_st = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=99),  # sec
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=1,
    max_size=25,
)


@pytest.mark.filterwarnings("ignore")
@given(events_st)
@settings(max_examples=12, deadline=None)
def test_gap_fill_matches_python_reference(spark, events):
    df = spark.createDataFrame(events, "g string, sec long, v long")
    out = gap_fill(
        df,
        "sec",
        B,
        ["g"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")],
        fill={"n": "zero", "sv": "ffill"},
    ).collect()

    # reference model
    obs = {}
    for g, sec, v in events:
        k = (g, (sec // B) * B)
        n, sv = obs.get(k, (0, 0))
        obs[k] = (n + 1, sv + v)
    expect = {}
    for g in {e[0] for e in events}:
        buckets = [b for (gg, b) in obs if gg == g]
        last = None
        for b in range(min(buckets), max(buckets) + B, B):
            if (g, b) in obs:
                n, sv = obs[(g, b)]
                last = sv
            else:
                n, sv = 0, last  # ffill carries the last observed sum
            expect[(g, b)] = (n, sv)

    got = {(r["g"], r["bucket_start"]): (r["n"], r["sv"]) for r in out}
    assert got == expect


keyed_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.sampled_from(["x", "y", None]),
    ),
    max_size=12,
)


@pytest.mark.filterwarnings("ignore")
@given(keyed_st, keyed_st)
@settings(max_examples=12, deadline=None)
def test_frame_diff_matches_dict_model(spark, left_rows, right_rows):
    # unique keys per frame: last occurrence wins in the model, so
    # dedupe the generated rows first (caller contract)
    l = {k: v for k, v in left_rows}
    r = {k: v for k, v in right_rows}
    lf = spark.createDataFrame(
        list(l.items()) or [(None, None)], "id long, v string"
    ).filter("id IS NOT NULL")
    rf = spark.createDataFrame(
        list(r.items()) or [(None, None)], "id long, v string"
    ).filter("id IS NOT NULL")
    got = {
        (row["id"], row["status"])
        for row in frame_diff(lf, rf, keys=["id"]).collect()
    }
    expect = set()
    for k in set(l) | set(r):
        if k not in r:
            expect.add((k, "removed"))
        elif k not in l:
            expect.add((k, "added"))
        elif l[k] != r[k]:
            expect.add((k, "changed"))
    assert got == expect


@pytest.mark.filterwarnings("ignore")
@given(
    st.lists(st.sampled_from(["p", "q", "r"]), max_size=10),
    st.lists(st.sampled_from(["p", "q", "r"]), max_size=10),
)
@settings(max_examples=12, deadline=None)
def test_multiset_diff_matches_counter_model(spark, left_vals, right_vals):
    lf = spark.createDataFrame(
        [(v,) for v in left_vals] or [(None,)], "s string"
    ).filter("s IS NOT NULL")
    rf = spark.createDataFrame(
        [(v,) for v in right_vals] or [(None,)], "s string"
    ).filter("s IS NOT NULL")
    got = {
        (row["s"], row["status"], row["multiplicity"])
        for row in frame_diff(lf, rf).collect()
    }
    delta = Counter(right_vals)
    delta.subtract(Counter(left_vals))
    expect = {
        (v, "added" if d > 0 else "removed", abs(d))
        for v, d in delta.items()
        if d != 0
    }
    assert got == expect
