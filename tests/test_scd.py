"""SCD Type 2: rebuild from a change log vs a pure-python reference,
collapse of re-stated values, NULL-attribute changes, incremental
apply == full rebuild law, SQL-twin agreement."""

import duckdb
import pytest

from dataset_grouper_spark.operators import scd

# (key, attr1, attr2, ts)
LOG = [
    (1, "gold", "nyc", 10),
    (1, "gold", "nyc", 20),     # re-stated -> collapsed
    (1, "plat", "nyc", 30),     # tier change
    (1, "plat", "sf", 40),      # city change
    (1, "plat", "sf", 50),      # re-stated
    (2, "silver", None, 15),    # NULL attribute value
    (2, "silver", "la", 25),    # NULL -> value IS a change
    (2, "silver", None, 35),    # value -> NULL IS a change
    (3, "bronze", "chi", 12),   # single-version key
]
SCHEMA = "k: long, tier: string, city: string, ts: long"


def _ref_scd2(rows):
    out = []
    bykey = {}
    for k, a1, a2, ts in sorted(rows, key=lambda r: (r[0], r[3])):
        bykey.setdefault(k, []).append((a1, a2, ts))
    for k, seq in bykey.items():
        versions = []
        for a1, a2, ts in seq:
            if versions and versions[-1][:2] == (a1, a2):
                continue
            versions.append((a1, a2, ts))
        for i, (a1, a2, ts) in enumerate(versions):
            nxt = versions[i + 1][2] if i + 1 < len(versions) else None
            out.append((k, a1, a2, ts, nxt, nxt is None))
    return set(out)


def test_rebuild_matches_reference(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    got = {
        tuple(r)
        for r in scd.scd2_from_changes(
            df, "k", ["tier", "city"], "ts"
        ).collect()
    }
    assert got == _ref_scd2(LOG)


def test_restated_values_collapse(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    out = scd.scd2_from_changes(df, "k", ["tier", "city"], "ts")
    assert out.filter("k = 1").count() == 3  # 5 log rows -> 3 versions


def test_null_transitions_are_changes(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    k2 = (
        scd.scd2_from_changes(df, "k", ["tier", "city"], "ts")
        .filter("k = 2")
        .collect()
    )
    assert len(k2) == 3
    cities = [r["city"] for r in sorted(k2, key=lambda r: r["valid_from"])]
    assert cities == [None, "la", None]


def test_exactly_one_current_per_key(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    out = scd.scd2_from_changes(df, "k", ["tier", "city"], "ts")
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
    assert out.filter("is_current AND valid_to IS NOT NULL").count() == 0


def test_apply_equals_full_rebuild(spark):
    old = [r for r in LOG if r[3] <= 25]
    new = [r for r in LOG if r[3] > 25]
    dim = scd.scd2_from_changes(
        spark.createDataFrame(old, SCHEMA), "k", ["tier", "city"], "ts"
    )
    merged = scd.scd2_apply(
        dim,
        spark.createDataFrame(new, SCHEMA),
        "k",
        ["tier", "city"],
        "ts",
    )
    full = scd.scd2_from_changes(
        spark.createDataFrame(LOG, SCHEMA), "k", ["tier", "city"], "ts"
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_apply_restating_batch_is_noop(spark):
    dim = scd.scd2_from_changes(
        spark.createDataFrame(LOG, SCHEMA), "k", ["tier", "city"], "ts"
    )
    # a batch repeating every key's current attribute values, later ts
    restate = [(1, "plat", "sf", 99), (2, "silver", None, 99),
               (3, "bronze", "chi", 99)]
    merged = scd.scd2_apply(
        dim,
        spark.createDataFrame(restate, SCHEMA),
        "k",
        ["tier", "city"],
        "ts",
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in dim.collect()
    }


def test_sql_twin_agrees(spark):
    df = spark.createDataFrame(LOG, SCHEMA)
    got = {
        tuple(r)
        for r in scd.scd2_from_changes(
            df, "k", ["tier", "city"], "ts"
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE log AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, '%s', %s, %d)"
            % (k, a1, "NULL" if a2 is None else "'%s'" % a2, ts)
            for k, a1, a2, ts in LOG
        )
        + ") v(k, tier, city, ts)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            scd.scd2_from_changes_sql(
                "SELECT * FROM log", "k", ["tier", "city"], "ts"
            )
        ).fetchall()
    }
    assert got == want


def test_tiebreak_order_cols(spark):
    rows = [(1, "a", "x", 10, 1), (1, "b", "x", 10, 2)]
    df = spark.createDataFrame(
        rows, "k: long, tier: string, city: string, ts: long, seq: long"
    )
    out = scd.scd2_from_changes(
        df, "k", ["tier", "city"], "ts", order_cols=["seq"]
    ).collect()
    cur = [r for r in out if r["is_current"]]
    assert len(cur) == 1 and cur[0]["tier"] == "b"


def test_apply_out_of_order_batch_raises(spark):
    dim = scd.scd2_from_changes(
        spark.createDataFrame(LOG, SCHEMA), "k", ["tier", "city"], "ts"
    )
    # key 1's open version starts at ts=40; a batch row at ts=35
    # violates the strictly-newer contract
    stale = spark.createDataFrame([(1, "dia", "sf", 35)], SCHEMA)
    merged = scd.scd2_apply(dim, stale, "k", ["tier", "city"], "ts")
    with pytest.raises(Exception, match="out-of-order batch"):
        merged.collect()


def test_apply_batch_at_exact_open_ts_allowed(spark):
    # ts == stored valid_from satisfies the >= contract (no raise)
    dim = scd.scd2_from_changes(
        spark.createDataFrame(LOG, SCHEMA), "k", ["tier", "city"], "ts"
    )
    same_ts = spark.createDataFrame([(1, "dia", "sf", 40)], SCHEMA)
    out = scd.scd2_apply(dim, same_ts, "k", ["tier", "city"], "ts")
    assert out.filter("k = 1 AND is_current").count() == 1


def test_apply_string_order_cols(spark):
    # non-long order columns must not hit a unionByName type mismatch
    schema = "k: long, tier: string, city: string, ts: long, seq: string"
    old = spark.createDataFrame([(1, "a", "x", 10, "s1")], schema)
    new = spark.createDataFrame([(1, "b", "x", 20, "s2")], schema)
    dim = scd.scd2_from_changes(
        old, "k", ["tier", "city"], "ts", order_cols=["seq"]
    )
    merged = scd.scd2_apply(
        dim, new, "k", ["tier", "city"], "ts", order_cols=["seq"]
    )
    full = scd.scd2_from_changes(
        old.unionByName(new), "k", ["tier", "city"], "ts",
        order_cols=["seq"],
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }
