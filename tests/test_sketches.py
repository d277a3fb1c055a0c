"""Count-min sketch: overestimate-only guarantee, mergeability, bound."""

import math

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.functions import sketches


def _truth(rows):
    t = {}
    for (k,) in rows:
        t[k] = t.get(k, 0) + 1
    return t


def test_cms_never_underestimates_and_exact_when_wide(spark):
    rows = [(k,) for k in [1, 1, 1, 2, 2, 3] * 10 + [(x) for x in range(50)]]
    df = spark.createDataFrame(rows, "user_id: long")
    truth = _truth(rows)
    width, depth = 2048, 4  # wide: collisions vanish at 53 keys
    sk = sketches.cms_build(df, "user_id", width, depth)
    est = {
        r["user_id"]: r["est"]
        for r in sketches.cms_estimate(
            sk, df.select("user_id").distinct(), "user_id", width, depth
        ).collect()
    }
    assert est == truth  # wide sketch is exact on this cardinality


def test_cms_overestimates_only_under_collisions(spark):
    rows = [(k,) for k in range(500) for _ in (0, 1)]  # 500 keys x2
    df = spark.createDataFrame(rows, "user_id: long")
    width, depth = 64, 4  # narrow: collisions guaranteed
    sk = sketches.cms_build(df, "user_id", width, depth)
    est = {
        r["user_id"]: r["est"]
        for r in sketches.cms_estimate(
            sk, df.select("user_id").distinct(), "user_id", width, depth
        ).collect()
    }
    n = len(rows)
    for k, e in est.items():
        assert e >= 2  # never below truth
        # ε = e/width bound, crude sanity (deterministic for this data)
        assert e <= 2 + math.ceil(math.e / (width / n) / n * n)


def test_cms_merge_equals_single_build(spark):
    a = spark.createDataFrame([(k,) for k in [1, 2, 2, 3]], "user_id: long")
    b = spark.createDataFrame([(k,) for k in [2, 3, 3, 4]], "user_id: long")
    both = a.unionByName(b)
    width, depth = 128, 3
    merged = sketches.cms_merge(
        sketches.cms_build(a, "user_id", width, depth),
        sketches.cms_build(b, "user_id", width, depth),
    )
    single = sketches.cms_build(both, "user_id", width, depth)
    ms = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    ss = {(r["row"], r["bucket"]): r["cnt"] for r in single.collect()}
    assert ms == ss


def test_cms_unseen_key_estimates_zero_when_cells_empty(spark):
    df = spark.createDataFrame([(1,)], "user_id: long")
    width, depth = 4096, 4
    sk = sketches.cms_build(df, "user_id", width, depth)
    probe = spark.createDataFrame([(99_999,)], "user_id: long")
    est = sketches.cms_estimate(sk, probe, "user_id", width, depth).collect()
    assert est[0]["est"] == 0


def test_cms_null_keys_keep_overestimate_guarantee(spark):
    # NULL is a first-class key: its build rows must land in real
    # buckets and a NULL probe must estimate >= its true count (the
    # injective 'k'||key vs 'n' tagging — no sentinel collisions).
    rows = [(None,), (None,), (None,), (1,), (2,)]
    df = spark.createDataFrame(rows, "user_id: long")
    width, depth = 2048, 4
    sk = sketches.cms_build(df, "user_id", width, depth)
    est = {
        r["user_id"]: r["est"]
        for r in sketches.cms_estimate(
            sk, df.select("user_id").distinct(), "user_id", width, depth
        ).collect()
    }
    assert est[None] == 3
    assert est[1] == 1 and est[2] == 1


def test_cms_rejects_bad_params(spark):
    df = spark.createDataFrame([(1,)], "user_id: long")
    with pytest.raises(ValueError):
        sketches.cms_build(df, "user_id", 0, 4)


def test_cms_estimate_rejects_mismatched_params(spark):
    df = spark.createDataFrame([(1,)], "user_id: long")
    sk = sketches.cms_build(df, "user_id", 2048, 4)
    with pytest.raises(ValueError):
        sketches.cms_estimate(sk, df, "user_id", 1024, 4)
    with pytest.raises(ValueError):
        sketches.cms_merge(sk, sketches.cms_build(df, "user_id", 64, 4))
