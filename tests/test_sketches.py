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


class TestHll:
    def test_registers_match_pure_python_reference(self, spark):
        # independent scalar spec: md5 via hashlib, same layout
        import hashlib

        p, width = 5, 55
        m = 1 << p
        rows = [(f"k{i}",) for i in range(200)]
        want = {}
        for (k,) in rows:
            h = int(hashlib.md5(("k" + k).encode()).hexdigest()[:15], 16)
            reg, w = h % m, h >> p
            rho = width + 1 if w == 0 else width - w.bit_length() + 1
            want[reg] = max(want.get(reg, 0), rho)
        df = spark.createDataFrame(rows, "key: string")
        got = {
            r["reg"]: r["mx"]
            for r in sketches.hll_build(df, "key", p=5).collect()
        }
        assert got == want

    def test_estimate_within_standard_error(self, spark):
        # sigma = 1.04/sqrt(m) ~ 4.6% at p=9; allow 3 sigma
        n = 5000
        df = spark.createDataFrame([(i,) for i in range(n)], "key: long")
        est = sketches.hll_estimate(
            sketches.hll_build(df, "key", p=9), p=9
        ).collect()[0]["est"]
        assert abs(est - n) / n < 3 * 1.04 / math.sqrt(512)

    def test_linear_counting_near_exact_small_n(self, spark):
        n = 30  # far below 2.5m: linear counting, near-exact
        df = spark.createDataFrame([(i,) for i in range(n)], "key: long")
        est = sketches.hll_estimate(
            sketches.hll_build(df, "key", p=9), p=9
        ).collect()[0]["est"]
        assert abs(est - n) <= 2

    def test_merge_equals_single_build(self, spark):
        rows = [(i % 700,) for i in range(2000)]
        df = spark.createDataFrame(rows, "key: long")
        a = sketches.hll_build(df.filter(F.col("key") < 350), "key", p=7)
        b = sketches.hll_build(df.filter(F.col("key") >= 300), "key", p=7)
        merged = sketches.hll_merge(a, b).collect()
        single = sketches.hll_build(df, "key", p=7).collect()
        assert {(r["reg"], r["mx"]) for r in merged} == {
            (r["reg"], r["mx"]) for r in single
        }

    def test_duplicates_do_not_move_estimate(self, spark):
        once = spark.createDataFrame([(i,) for i in range(100)], "k: long")
        thrice = once.union(once).union(once)
        e1 = sketches.hll_estimate(
            sketches.hll_build(once, "k", p=8), p=8
        ).collect()[0]["est"]
        e3 = sketches.hll_estimate(
            sketches.hll_build(thrice, "k", p=8), p=8
        ).collect()[0]["est"]
        assert e1 == e3

    def test_null_is_one_distinct_key(self, spark):
        df = spark.createDataFrame(
            [(None,), (None,), (1,), (2,)], "k: long"
        )
        est = sketches.hll_estimate(
            sketches.hll_build(df, "k", p=9), p=9
        ).collect()[0]["est"]
        assert abs(est - 3) <= 1

    def test_grouped_build_and_estimate(self, spark):
        rows = [("a", i) for i in range(50)] + [("b", i) for i in range(400)]
        df = spark.createDataFrame(rows, "g: string, k: long")
        out = {
            r["g"]: r["est"]
            for r in sketches.hll_estimate(
                sketches.hll_build(df, "k", ("g",), p=9), ("g",), p=9
            ).collect()
        }
        assert abs(out["a"] - 50) <= 3 and abs(out["b"] - 400) / 400 < 0.15

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1,)], "k: long")
        with pytest.raises(ValueError, match="p must be"):
            sketches.hll_build(df, "k", p=3)
        sk7 = sketches.hll_build(df, "k", p=7)
        with pytest.raises(ValueError, match="built with p=7"):
            sketches.hll_estimate(sk7, p=9)
        sk9 = sketches.hll_build(df, "k", p=9)
        with pytest.raises(ValueError, match="different p"):
            sketches.hll_merge(sk7, sk9).collect()


class TestKmv:
    def test_exact_below_k(self, spark):
        df = spark.createDataFrame(
            [(i % 20,) for i in range(300)], "k: long"
        )
        out = sketches.kmv_estimate(
            sketches.kmv_build(df, "k", k=64), k=64
        ).collect()[0]
        # 20 distinct < k=64: the sketch IS the distinct hash set
        assert out["n_hashes"] == 20 and out["est"] == 20.0

    def test_estimator_accuracy(self, spark):
        df = spark.createDataFrame([(i,) for i in range(5000)], "k: long")
        out = sketches.kmv_estimate(
            sketches.kmv_build(df, "k", k=256), k=256
        ).collect()[0]
        assert out["n_hashes"] == 256
        # KMV stderr ~ n/sqrt(k-2): 5000/16 ≈ 313; allow 3 sigma
        assert abs(out["est"] - 5000) < 1000

    def test_duplicate_invariance(self, spark):
        a = spark.createDataFrame([(i,) for i in range(100)], "k: long")
        b = spark.createDataFrame(
            [(i,) for i in range(100) for _ in range(5)], "k: long"
        )
        ha = sorted(
            r["h"] for r in sketches.kmv_build(a, "k", k=32).collect()
        )
        hb = sorted(
            r["h"] for r in sketches.kmv_build(b, "k", k=32).collect()
        )
        assert ha == hb and len(ha) == 32

    def test_null_keys_first_class(self, spark):
        df = spark.createDataFrame(
            [(None,), (None,), (1,), (2,)], "k: long"
        )
        out = sketches.kmv_estimate(
            sketches.kmv_build(df, "k", k=16), k=16
        ).collect()[0]
        assert out["n_hashes"] == 3 and out["est"] == 3.0

    def test_merge_equals_single_build(self, spark):
        a = spark.createDataFrame([(i,) for i in range(400)], "k: long")
        b = spark.createDataFrame(
            [(i,) for i in range(200, 600)], "k: long"
        )
        merged = sketches.kmv_merge(
            sketches.kmv_build(a, "k", k=64),
            sketches.kmv_build(b, "k", k=64),
        )
        direct = sketches.kmv_build(a.unionByName(b), "k", k=64)
        assert sorted(r["h"] for r in merged.collect()) == sorted(
            r["h"] for r in direct.collect()
        )

    def test_group_rollup_equals_global(self, spark):
        rows = [("a", i) for i in range(300)] + [
            ("b", i) for i in range(150, 500)
        ]
        df = spark.createDataFrame(rows, "g: string, k: long")
        rolled = sketches.kmv_merge(
            sketches.kmv_build(df, "k", ("g",), k=48), group_cols=()
        )
        direct = sketches.kmv_build(df, "k", k=48)
        assert sorted(r["h"] for r in rolled.collect()) == sorted(
            r["h"] for r in direct.collect()
        )

    def test_intersection_estimate(self, spark):
        # |A|=600, |B|=600, |A∩B|=300 -> jaccard 1/3
        a = spark.createDataFrame([(i,) for i in range(600)], "k: long")
        b = spark.createDataFrame(
            [(i,) for i in range(300, 900)], "k: long"
        )
        out = sketches.kmv_intersect_estimate(
            sketches.kmv_build(a, "k", k=128),
            sketches.kmv_build(b, "k", k=128),
            k=128,
        ).collect()[0]
        assert out["n_union"] == 128
        assert abs(out["est_union"] - 900) / 900 < 0.35
        assert abs(out["est_intersect"] - 300) / 300 < 0.5

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1,)], "k: long")
        with pytest.raises(ValueError, match="k must be"):
            sketches.kmv_build(df, "k", k=1)
        sk = sketches.kmv_build(df, "k", k=16)
        with pytest.raises(ValueError, match="built with k=16"):
            sketches.kmv_estimate(sk, k=32)
        with pytest.raises(ValueError, match="different k"):
            sketches.kmv_merge(
                sk, sketches.kmv_build(df, "k", k=32)
            ).collect()

    def test_sql_twin_bit_exact(self, spark):
        import duckdb

        rows = [("g%d" % (i % 3), i % 97) for i in range(500)]
        df = spark.createDataFrame(rows, "g: string, k: long")
        got = {
            (r["g"], r["n_hashes"], r["est"])
            for r in sketches.kmv_estimate(
                sketches.kmv_build(df, "k", ("g",), k=32), ("g",), k=32
            ).collect()
        }
        con = duckdb.connect()
        con.register("t", df.toPandas())
        want = {
            tuple(r)
            for r in con.sql(
                sketches.kmv_estimate_sql("t", "k", ("g",), k=32)
            ).fetchall()
        }
        assert got == want
