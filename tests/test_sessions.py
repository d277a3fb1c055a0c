"""Sessionization and deterministic sampling semantics."""

from pyspark.sql import functions as F

from dataset_grouper_spark.operators import sessions


def test_sessionize_gap_splits(spark):
    rows = [
        ("u1", 0), ("u1", 10), ("u1", 100), ("u1", 105),   # gap>30 at 100
        ("u2", 50),
    ]
    df = spark.createDataFrame(rows, "user: string, t: long")
    out = sessions.sessionize(df, "user", "t", gap=30)
    got = {(r.user, r.session_id): (r.n_events, r.duration) for r in out.collect()}
    assert got[("u1", 0)] == (2, 10)
    assert got[("u1", 1)] == (2, 5)
    assert got[("u2", 0)] == (1, 0)


def test_sessionize_single_shuffle(spark):
    from dataset_grouper_spark.plans import count_exchanges

    df = spark.createDataFrame([("u", i) for i in range(10)], "user: string, t: long")
    out = sessions.sessionize(df, "user", "t", gap=3)
    # lag window + cumsum window + groupBy all share hash(user)
    assert count_exchanges(out) == 1


def test_sample_groups_deterministic_partition(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id: long")
    kept = sessions.sample_groups(df, "id", 20)
    kept_again = sessions.sample_groups(df, "id", 20)
    a = {r.id for r in kept.collect()}
    assert a == {r.id for r in kept_again.collect()}
    assert 100 < len(a) < 300  # ~20%
    # complements partition the corpus exactly
    rest = {r.id for r in sessions.sample_groups(df, "id", 100).collect()}
    assert rest == set(range(1000))


def test_sample_groups_extreme_ids_no_overflow(spark):
    # ids at the int64 edges with a positive salt: the pre-scramble
    # addition must not overflow (ANSI mode throws on long overflow)
    df = spark.createDataFrame(
        [(2**63 - 1,), (2**63 - 2,), (-(2**63),), (0,)], "id: long"
    )
    got = sessions.sample_groups(df, "id", 100, salt=12345)
    assert got.count() == 4  # 100% keeps all; no ARITHMETIC_OVERFLOW
    sessions.sample_groups(df, "id", 50, salt=2**40).count()  # huge salt too


def test_cap_per_group_deterministic(spark):
    from dataset_grouper_spark.operators import sessions

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(30)], "id: long, g: string"
    )
    out = sessions.cap_per_group(df, "g", "id", 4)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.g, set()).add(r.id)
    assert all(len(v) == 4 for v in per.values())
    # deterministic across invocations
    again = {(r.g, r.id) for r in sessions.cap_per_group(df, "g", "id", 4).collect()}
    assert {(r.g, r.id) for r in rows} == again
    # cap larger than group keeps everything
    assert sessions.cap_per_group(df, "g", "id", 99).count() == 30


def test_split_by_group_leakage_safe(spark):
    from dataset_grouper_spark.operators import sessions

    df = spark.createDataFrame(
        [(i, f"g{i % 20}") for i in range(200)], "id: long, g: string"
    )
    out = sessions.split_by_group(df, "g", {"train": 80, "val": 10, "test": 10})
    rows = out.collect()
    # every group maps to exactly one split
    per_group = {}
    for r in rows:
        per_group.setdefault(r.g, set()).add(r.split)
    assert all(len(v) == 1 for v in per_group.values())
    assert {r.split for r in rows} <= {"train", "val", "test"}
    # deterministic; salt changes the assignment of at least one group
    again = {(r.id, r.split) for r in sessions.split_by_group(
        df, "g", {"train": 80, "val": 10, "test": 10}).collect()}
    assert {(r.id, r.split) for r in rows} == again
    salted = {(r.id, r.split) for r in sessions.split_by_group(
        df, "g", {"train": 80, "val": 10, "test": 10}, salt="v2").collect()}
    assert salted != again

    import pytest as _p
    with _p.raises(ValueError):
        sessions.split_by_group(df, "g", {"train": 90, "val": 5})


def test_temperature_mix_flattens_head(spark):
    # 1000 'web' rows vs 50 'wiki': at T=2 web's acceptance must be
    # below wiki's (which is kept whole), and the surviving shares
    # must be closer together than the input shares
    rows = [(i, "web") for i in range(1000)] + [
        (10_000 + i, "wiki") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    out = sessions.temperature_mix(df, "source", "doc_id", temperature=2.0)
    kept = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert kept["wiki"] == 50  # smallest stratum kept whole
    # target web share: sqrt(20):sqrt(1) ~ 4.47:1 vs input 20:1
    assert 50 * 2 < kept["web"] < 50 * 8
    assert kept["web"] < 1000 * 0.5


def test_temperature_mix_t1_is_noop(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(10)],
        "doc_id: long, source: string",
    )
    out = sessions.temperature_mix(df, "source", "doc_id", temperature=1.0)
    assert out.count() == 110


def test_temperature_mix_salt_gives_independent_draw(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(2000)] + [(10_000 + i, "b") for i in range(100)],
        "doc_id: long, source: string",
    )
    a = {r["doc_id"] for r in
         sessions.temperature_mix(df, "source", "doc_id", 2.0, salt=0)
         .select("doc_id").collect()}
    b = {r["doc_id"] for r in
         sessions.temperature_mix(df, "source", "doc_id", 2.0, salt=99)
         .select("doc_id").collect()}
    assert a != b           # different membership ...
    assert abs(len(a) - len(b)) < 0.2 * len(a)  # ... same expected size


def test_temperature_mix_rejects_bad_temperature(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a")], "doc_id: long, source: string")
    with _pytest.raises(ValueError):
        sessions.temperature_mix(df, "source", "doc_id", temperature=0.0)


def test_probability_sample_extremes_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, 1.0 if i < 100 else 0.0) for i in range(200)],
        "doc_id: long, p: double",
    )
    kept = sessions.probability_sample(df, "p", "doc_id").collect()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == list(range(100))  # p=1 always kept, p=0 never
    again = sorted(
        r["doc_id"]
        for r in sessions.probability_sample(df, "p", "doc_id").collect()
    )
    assert again == ids


def test_probability_sample_rate_tracks_probability(spark):
    df = spark.createDataFrame(
        [(i, 0.3) for i in range(5000)], "doc_id: long, p: double"
    )
    n = sessions.probability_sample(df, "p", "doc_id").count()
    assert 0.25 * 5000 < n < 0.35 * 5000
    # clamping: p>1 behaves as 1, p<0 as 0
    hot = spark.createDataFrame(
        [(i, 7.5) for i in range(50)] + [(100 + i, -3.0) for i in range(50)],
        "doc_id: long, p: double",
    )
    kept = sessions.probability_sample(hot, "p", "doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == list(range(50))


def test_contrastive_negatives_contract(spark):
    df = spark.createDataFrame([(i * 10,) for i in range(20)], "doc_id: long")
    out = sessions.contrastive_negatives(df, "doc_id", 3).collect()
    assert len(out) == 20 * 3
    by_anchor = {}
    for r in out:
        assert r["neg_id"] != r["anchor_id"]  # never self
        by_anchor.setdefault(r["anchor_id"], set()).add(r["neg_rank"])
    assert all(ranks == {0, 1, 2} for ranks in by_anchor.values())
    # deterministic across runs, different salt differs
    again = {(r["anchor_id"], r["neg_rank"]): r["neg_id"]
             for r in sessions.contrastive_negatives(df, "doc_id", 3).collect()}
    first = {(r["anchor_id"], r["neg_rank"]): r["neg_id"] for r in out}
    assert again == first
    other = {(r["anchor_id"], r["neg_rank"]): r["neg_id"]
             for r in sessions.contrastive_negatives(df, "doc_id", 3, salt=5).collect()}
    assert other != first


def test_contrastive_negatives_single_row_empty(spark):
    df = spark.createDataFrame([(1,)], "doc_id: long")
    assert sessions.contrastive_negatives(df, "doc_id", 2).count() == 0
