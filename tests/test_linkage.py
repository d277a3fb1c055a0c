"""Entity resolution: blocking recall/precision mechanics, levenshtein
match scoring vs a pure-python reference, full pipeline clustering,
SQL-twin agreement."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.operators import linkage

ROWS = [
    # (id, name, city, segment)
    (1, "acme corp", "nyc", "A"),
    (2, "acme corp.", "nyc", "A"),      # near-dup of 1 (dist 1)
    (3, "acme corporation", "nyc", "B"),  # same prefix, farther
    (4, "globex", "la", "A"),
    (5, "globex", "la", "A"),            # exact dup of 4
    (6, "initech", "la", "A"),
    (7, "acme corp", "sf", "A"),         # same name, different block
    (8, None, "nyc", "A"),               # NULL name: blocks by city only
]
SCHEMA = "id: long, name: string, city: string, segment: string"


def _lev(a, b):
    if a is None or b is None:
        return 10**9
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_blocked_pairs_within_block_only(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in linkage.blocked_pairs(df, "id", [["city", "segment"]]).collect()
    }
    # (nyc, A): ids 1,2,8 ; (la, A): 4,5,6 ; singletons pair with nobody
    assert pairs == {(1, 2), (1, 8), (2, 8), (4, 5), (4, 6), (5, 6)}


def test_blocked_pairs_multi_pass_union(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in linkage.blocked_pairs(
            df, "id", [["city", "segment"], [F.substring("name", 1, 4)]]
        ).collect()
    }
    # prefix pass adds acme cross-city pairs (1,3),(2,3),(1,7)... and
    # globex pair (4,5) already found by pass 1 (deduped)
    assert {(1, 3), (2, 3), (1, 7), (2, 7), (3, 7)} <= pairs
    assert (1, 2) in pairs
    # NULL name never blocks in the prefix pass
    assert all(8 not in p for p in pairs if p not in {(1, 8), (2, 8)})


def test_blocked_pairs_max_block_size_drops_hot_block(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in linkage.blocked_pairs(
            df, "id", [["city", "segment"]], max_block_size=2
        ).collect()
    }
    assert pairs == set()  # both active blocks have 3 members


def test_match_pairs_levenshtein_reference(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    cand = linkage.blocked_pairs(
        df, "id", [["city", "segment"], [F.substring("name", 1, 4)]]
    )
    got = {
        (r["id_a"], r["id_b"]): (r["dist"], r["similarity"])
        for r in linkage.match_pairs(df, cand, "id", "name", 2).collect()
    }
    by_id = {i: n for i, n, _, _ in ROWS}
    for (a, b), (d, sim) in got.items():
        want = _lev(by_id[a], by_id[b])
        assert d == want and d <= 2
        assert sim == pytest.approx(
            1 - d / max(len(by_id[a]), len(by_id[b])), abs=1e-6
        )
    assert (1, 2) in got and (4, 5) in got
    assert got[(4, 5)][0] == 0
    assert (1, 3) not in got  # dist 7 > threshold


def test_resolve_entities_clusters_and_singletons(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    ent = {
        r["record_id"]: r["entity_id"]
        for r in linkage.resolve_entities(
            df,
            "id",
            "name",
            [["city", "segment"], [F.substring("name", 1, 4)]],
            max_dist=2,
        ).collect()
    }
    assert len(ent) == len(ROWS)
    # {1,2,7} merge via name prefix pass (dist<=2); {4,5} exact
    assert ent[1] == ent[2] == ent[7] == 1
    assert ent[4] == ent[5] == 4
    # singletons resolve to themselves
    for i in (3, 6, 8):
        assert ent[i] == i


def test_match_pairs_sql_twin_agrees(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    cand = linkage.blocked_pairs(
        df, "id", [["city", "segment"], [F.substring("name", 1, 4)]]
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"], r["similarity"])
        for r in linkage.match_pairs(df, cand, "id", "name", 2).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, %s, '%s', '%s')"
            % (i, "NULL" if n is None else "'%s'" % n, c, s)
            for i, n, c, s in ROWS
        )
        + ") v(id, name, city, segment)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            linkage.match_pairs_sql(
                "t",
                "id",
                "name",
                [["city", "segment"], ["substring(name, 1, 4)"]],
                2,
            )
        ).fetchall()
    }
    assert got == want


def test_match_pairs_sql_twin_agrees_with_cap(spark):
    """r9 verdict task 1: the SQL twin must mirror max_block_size so
    capped contract queries stay hash-identical cross-engine. The hot
    (city, segment) block exceeds the cap and is dropped on BOTH
    engines; the name-prefix pass still recovers its pairs."""
    rows = [
        # 4-record hot block (cap 3): attribute pass drops it
        (1, "Alice", "metro", "A"),
        (2, "Alicf", "metro", "A"),
        (3, "Zed", "metro", "A"),
        (4, "Zee", "metro", "A"),
        # small block survives the cap
        (5, "Bob", "rural", "B"),
        (6, "Bop", "rural", "B"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    blocks = [["city", "segment"], [F.substring("name", 1, 2)]]
    cand = linkage.blocked_pairs(df, "id", blocks, max_block_size=3)
    got = {
        (r["id_a"], r["id_b"], r["dist"], r["similarity"])
        for r in linkage.match_pairs(df, cand, "id", "name", 2).collect()
    }
    # Alice/Alicf via the 'Al' prefix block; Zed/Zee via 'Ze'; Bob/Bop
    # via both passes — the hot attribute block's drop loses nothing
    # the prefix pass doesn't recover here
    assert {(a, b) for a, b, _d, _s in got} == {(1, 2), (3, 4), (5, 6)}
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, '%s', '%s', '%s')" % r for r in rows
        )
        + ") v(id, name, city, segment)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            linkage.match_pairs_sql(
                "t",
                "id",
                "name",
                [["city", "segment"], ["substring(name, 1, 2)"]],
                2,
                max_block_size=3,
            )
        ).fetchall()
    }
    assert got == want
    # uncapped, the hot block's cross pair set is larger (sanity that
    # the cap actually bit): Zed/Zee at dist 2 appear either way, but
    # the candidate count shrinks
    uncapped = linkage.blocked_pairs(df, "id", blocks).count()
    assert uncapped > cand.count()


def test_block_sizes_audit_frame(spark):
    rows = [
        (1, "Alice", "metro", "A"),
        (2, "Alicf", "metro", "A"),
        (3, "Zed", "metro", "A"),
        (4, "Bob", "rural", "B"),
        (5, None, None, "B"),  # NULL keys never block, never audited
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    audit = linkage.block_sizes(
        df, [["city", "segment"], [F.substring("name", 1, 2)]]
    ).collect()
    assert audit[0]["pass_idx"] == 0 and audit[0]["n_records"] == 3
    by_pass = {}
    for r in audit:
        by_pass.setdefault(r["pass_idx"], []).append(r["n_records"])
    assert sorted(by_pass[0]) == [1, 3]      # metro/A=3, rural/B=1
    # name-prefix pass: 'Al'x2, 'Ze', 'Bo' (NULL name dropped)
    assert sorted(by_pass[1]) == [1, 1, 2]


def test_block_key_injective_on_separator_bytes(spark):
    # a separator-concat block key would collide ('x\x1f', 'y') with
    # ('x', '\x1fy'); the struct key must NOT pair them
    df = spark.createDataFrame(
        [(1, "n1", "x\x1f", "y"), (2, "n2", "x", "\x1fy"),
         (3, "n3", "x\x1f", "y")],
        SCHEMA,
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in linkage.blocked_pairs(df, "id", [["city", "segment"]]).collect()
    }
    assert pairs == {(1, 3)}


def test_non_ascii_char_semantics(spark):
    # Spark levenshtein + F.length are CHARACTER-based: 'café'->'cafe'
    # is ONE edit over 12 chars, never the 2-byte-edit/14-byte answer a
    # byte-based engine gives (DuckDB's levenshtein is byte-based, so
    # the SQL twin's exactness contract is ASCII-only — documented on
    # match_pairs_sql)
    rows = [
        (1, "café münchen", "x", "A"),
        (2, "cafe münchen", "x", "A"),
        (3, "caffè münchèn", "x", "A"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): (r["dist"], r["similarity"])
        for r in linkage.match_pairs(
            df, linkage.blocked_pairs(df, "id", [["city"]]), "id", "name", 4
        ).collect()
    }
    by_id = {i: n for i, n, _, _ in rows}
    for (a, b), (d, sim) in got.items():
        assert d == _lev(by_id[a], by_id[b])  # char-level reference
        assert sim == pytest.approx(
            1 - d / max(len(by_id[a]), len(by_id[b])), abs=1e-6
        )
    assert got[(1, 2)][0] == 1
    assert got[(1, 2)][1] == pytest.approx(1 - 1 / 12, abs=1e-6)


def test_empty_strings_similarity_one(spark):
    df = spark.createDataFrame(
        [(1, "", "x", "A"), (2, "", "x", "A")], SCHEMA
    )
    out = linkage.match_pairs(
        df, linkage.blocked_pairs(df, "id", [["city"]]), "id", "name", 0
    ).collect()
    assert len(out) == 1 and out[0]["similarity"] == 1.0
