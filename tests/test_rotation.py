"""Pin the driver-oracle rotation to tools/rotation.py (VERDICT r7 #1).

The driver oracles only the first 50 ``queries()`` entries per round,
so the dict order IS the verification schedule.  These tests make the
schedule mechanical: ``_QUERY_ORDER`` in ``__spark_entry__.py`` must be
exactly what ``tools/rotation.py`` computes from the committed
CORRECTNESS_r*.json history at commit time.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import __spark_entry__ as entry  # noqa: E402
import rotation  # noqa: E402


def test_query_order_matches_rotation_tool():
    computed = rotation.compute_order(
        list(entry._query_registry().keys())
    )
    declared = list(entry.queries().keys())
    assert declared == computed, (
        "queries() order is stale vs the committed CORRECTNESS history; "
        "run: python tools/rotation.py --update"
    )


def test_window_prefers_never_oracled():
    """Every window slot is never-driver-green while any such query
    remains (the never bucket outnumbers the window today, so all 50
    must come from it)."""
    greens = rotation.last_green_rounds()
    order = list(entry.queries().keys())
    never = [n for n in order if n not in greens]
    window = order[:50]
    expected_never_in_window = min(50, len(never))
    assert [n for n in window if n not in greens] == never[
        :expected_never_in_window
    ]


def test_order_covers_registry_exactly():
    reg = set(entry._query_registry())
    order = entry._QUERY_ORDER
    assert len(order) == len(set(order)), "duplicate names in _QUERY_ORDER"
    assert set(order) == reg


def test_readme_query_count_is_current():
    """VERDICT r7 #7: the README's stated query count must track
    len(queries()) — a stale capability doc misleads the next round."""
    readme = open(os.path.join(REPO, "README.md")).read()
    n = len(entry._query_registry())
    assert f"`queries()` ({n} operator queries" in readme, (
        f"README query count is stale; update it to {n}"
    )
    # VERDICT r10 #6: pin the twin count the same way — every query
    # must carry a DuckDB oracle, and the README must say so
    assert len(entry.oracle_sql()) == n, (
        "a query is missing its DuckDB twin"
    )
    assert f"DuckDB twins for all {n}" in readme, (
        f"README twin count is stale; update it to {n}"
    )


def test_rotation_green_semantics():
    """The tool's 'green' predicate: hash-green rows count, failed or
    error rows do not, and rows-only queries count on a recorded
    spark_rows."""
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "err": None}
    bad_hash = dict(ok, hash_match=False)
    errored = dict(ok, err="boom")
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 5, "err": "no_oracle"}
    rows_only_dead = dict(rows_only, spark_rows=None)
    assert rotation._green(ok)
    assert not rotation._green(bad_hash)
    assert not rotation._green(errored)
    assert rotation._green(rows_only)
    assert not rotation._green(rows_only_dead)
    # r10: a query that GRADUATED to an oracle must not coast on old
    # rows-only records — it re-verifies under its new hash check
    assert not rotation._green(rows_only, has_oracle=True)
    assert rotation._green(ok, has_oracle=True)


def test_boundary_proof_manifest():
    """VERDICT r8 'What's wrong' #1: an untracked CORRECTNESS file the
    driver drops AFTER the final commit must not change the computed
    order — history is pinned by the committed manifest, and only
    ``--update`` (the round-start ritual) repins it."""
    import json
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        os.mkdir(os.path.join(tmp, "tools"))
        # committed state: one history file, pinned by the manifest
        shutil.copy(
            os.path.join(REPO, "CORRECTNESS_r01.json"),
            os.path.join(tmp, "CORRECTNESS_r01.json"),
        )
        rotation.refresh_manifest(tmp)
        before = rotation.last_green_rounds(tmp)
        # driver drops a new, untracked record at the round boundary
        with open(os.path.join(tmp, "CORRECTNESS_r99.json"), "w") as f:
            json.dump(
                {"zz_new": {"rows_match": True, "schema_match": True,
                            "hash_match": True, "err": None}}, f
            )
        assert rotation.last_green_rounds(tmp) == before, (
            "unpinned CORRECTNESS file leaked into the rotation input"
        )
        # the ritual repins and the new record takes effect
        rotation.refresh_manifest(tmp)
        after = rotation.last_green_rounds(tmp)
        assert after["zz_new"] == 99


def test_manifest_pins_current_history():
    """The committed manifest must list exactly the CORRECTNESS files
    tracked at commit time (the ritual keeps this current)."""
    import glob
    import json

    with open(os.path.join(REPO, "tools", "rotation_manifest.json")) as f:
        pinned = set(json.load(f)["correctness_files"])
    tracked = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    }
    # Pinned ⊆ present always; present-but-unpinned is only legal for
    # a file newer than every pinned one (the boundary artifact).
    assert pinned <= tracked
    extra = tracked - pinned
    if extra:
        newest_pinned = max(pinned)
        assert all(n > newest_pinned for n in extra), (
            f"stale manifest: run python tools/rotation.py --update "
            f"(unpinned: {sorted(extra)})"
        )


def test_rotation_order_policy():
    """Never-green first (registry order), then stalest-first."""
    import unittest.mock as mock

    names = ["a", "b", "c", "d"]
    with mock.patch.object(
        rotation, "last_green_rounds", return_value={"b": 7, "d": 4}
    ):
        assert rotation.compute_order(names) == ["a", "c", "d", "b"]
