"""Hudi CoW: timeline walk, file-slice resolution, time travel,
copy-on-write upsert at file-group granularity, replacecommit."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sources import hudi


def _rows(spark, t, **kw):
    return sorted(
        tuple(r) for r in hudi.read_hudi(spark, t, **kw).collect()
    )


def test_insert_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "htbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    inst = hudi.hudi_insert(spark, df, t, record_key="id")
    assert _rows(spark, t) == [(1, "a"), (2, "b"), (3, "c")]
    # layout fidelity: hoodie.properties + three timeline states
    assert os.path.exists(os.path.join(t, ".hoodie", "hoodie.properties"))
    states = {s for _ts, _a, s in hudi.hudi_timeline(t)}
    assert states == {"requested", "inflight", "completed"}
    # meta columns live in the files, dropped by default
    meta = hudi.read_hudi(spark, t, keep_meta=True)
    assert "_hoodie_record_key" in meta.columns
    assert {r["_hoodie_commit_time"] for r in meta.collect()} == {inst}


def test_second_insert_appends(spark, tmp_path):
    t = str(tmp_path / "htbl")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string").coalesce(1)
    i1 = hudi.hudi_insert(spark, mk([(1, "a")]), t, record_key="id")
    i2 = hudi.hudi_insert(spark, mk([(2, "b")]), t, record_key="id")
    assert int(i2) == int(i1) + 1
    assert _rows(spark, t) == [(1, "a"), (2, "b")]
    # time travel to the first instant
    assert _rows(spark, t, as_of=i1) == [(1, "a")]


def test_upsert_rewrites_only_touched_group(spark, tmp_path):
    t = str(tmp_path / "htbl")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string").coalesce(1)
    i1 = hudi.hudi_insert(spark, mk([(1, "a"), (2, "b")]), t, "id")
    i2 = hudi.hudi_insert(spark, mk([(3, "c"), (4, "d")]), t, "id")
    slices_before = {
        fid: (inst, path)
        for _p, fid, inst, path in hudi.hudi_file_slices(t)
    }
    i3 = hudi.hudi_upsert(spark, mk([(2, "B!"), (9, "new")]), t)
    assert _rows(spark, t) == [
        (1, "a"), (2, "B!"), (3, "c"), (4, "d"), (9, "new"),
    ]
    slices_after = {
        fid: (inst, path)
        for _p, fid, inst, path in hudi.hudi_file_slices(t)
    }
    rewritten = [
        fid
        for fid in slices_before
        if fid in slices_after and slices_after[fid] != slices_before[fid]
    ]
    untouched = [
        fid
        for fid in slices_before
        if slices_after.get(fid) == slices_before[fid]
    ]
    new_groups = set(slices_after) - set(slices_before)
    # group holding id=2 got ONE new slice under the SAME fileId; the
    # i2 group is byte-untouched; the insert opened fresh group(s)
    assert len(rewritten) == 1 and len(untouched) == 1
    assert new_groups and all(
        slices_after[g][0] == i3 for g in new_groups
    )
    assert slices_after[rewritten[0]][0] == i3
    # time travel: pre-upsert snapshot still serves the old slices
    assert _rows(spark, t, as_of=i2) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]
    assert _rows(spark, t, as_of=i1) == [(1, "a"), (2, "b")]


def test_partitioned_insert_upsert_nonglobal_identity(spark, tmp_path):
    t = str(tmp_path / "ptbl")
    df = spark.createDataFrame(
        [(1, "en", "x"), (1, "de", "y"), (2, "en", "z")],
        "id long, lang string, v string",
    )
    hudi.hudi_insert(spark, df, t, "id", partition_by=["lang"])
    assert _rows(spark, t) == [
        (1, "de", "y"), (1, "en", "x"), (2, "en", "z"),
    ]
    # hive-style dirs + partition metadata markers
    assert os.path.isdir(os.path.join(t, "lang=en"))
    assert os.path.exists(
        os.path.join(t, "lang=en", ".hoodie_partition_metadata")
    )
    # non-global index: updating (1, en) must NOT touch (1, de)
    hudi.hudi_upsert(
        spark,
        spark.createDataFrame(
            [(1, "en", "X!")], "id long, lang string, v string"
        ),
        t,
    )
    assert _rows(spark, t) == [
        (1, "de", "y"), (1, "en", "X!"), (2, "en", "z"),
    ]


def test_inflight_commit_invisible(spark, tmp_path):
    t = str(tmp_path / "htbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    hudi.hudi_insert(spark, df, t, "id")
    # forge an inflight write: data file present, no completed marker
    import shutil

    live = hudi.hudi_file_slices(t)[0][3]
    forged = os.path.join(
        os.path.dirname(live), "deadbeef_0-0-0_20990101000000000.parquet"
    )
    shutil.copy(live, forged)
    hp = os.path.join(t, ".hoodie")
    for s in ("commit.requested", "commit.inflight"):
        with open(os.path.join(hp, f"20990101000000000.{s}"), "w") as f:
            f.write("{}")
    assert _rows(spark, t) == [(1, "a")]  # forged slice invisible


def test_replacecommit_excludes_groups(spark, tmp_path):
    t = str(tmp_path / "htbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).coalesce(1)
    hudi.hudi_insert(spark, df, t, "id")
    part, fid, _inst, path = hudi.hudi_file_slices(t)[0]
    # clustering: rewrite the group's rows under a NEW fileId and
    # declare the old group replaced
    inst = hudi._next_instant(t)
    import shutil

    shutil.copy(path, os.path.join(t, f"newfid{inst}_0-0-0_{inst}.parquet"))
    hp = os.path.join(t, ".hoodie")
    for s in ("commit.requested", "commit.inflight"):
        with open(os.path.join(hp, f"{inst}.{s}"), "w") as f:
            f.write("{}")
    with open(os.path.join(hp, f"{inst}.replacecommit"), "w") as f:
        json.dump({"partitionToReplaceFileIds": {part: [fid]}}, f)
    assert _rows(spark, t) == [(1, "a"), (2, "b")]  # no double-count
    live = hudi.hudi_file_slices(t)
    assert len(live) == 1 and live[0][1].startswith("newfid")


def test_validation_and_gates(spark, tmp_path):
    t = str(tmp_path / "htbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    hudi.hudi_insert(spark, df, t, "id")
    with pytest.raises(ValueError, match="record key mismatch"):
        hudi.hudi_insert(spark, df, t, "v")
    with pytest.raises(ValueError, match="duplicate identities"):
        hudi.hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "x"), (1, "y")], "id long, v string"
            ),
            t,
        )
    # a MoR table with no log files reads as its base slices (r8: MoR
    # is now a real read path, not a gate)
    props = os.path.join(t, ".hoodie", "hoodie.properties")
    body = open(props).read().replace("COPY_ON_WRITE", "MERGE_ON_READ")
    open(props, "w").write(body)
    assert [tuple(r) for r in hudi.read_hudi(spark, t).collect()] == [
        (1, "a")
    ]
    # unknown table types still gate honestly
    open(props, "w").write(
        body.replace("MERGE_ON_READ", "SOMETHING_ELSE")
    )
    with pytest.raises(NotImplementedError, match="SOMETHING_ELSE"):
        hudi.read_hudi(spark, t)


# ---------------------------------------------------------- MoR + meta

def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string").coalesce(1)


def test_hudi_partitions_metadata(spark, tmp_path):
    t = str(tmp_path / "hparts")
    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "b"), (3, "de", "c")],
        "id long, lang string, v string",
    ).coalesce(1)
    hudi.hudi_insert(spark, df, t, record_key="id", partition_by=["lang"])
    rows = {
        r["partition"]: (r["n_slices"], r["n_rows"])
        for r in hudi.hudi_partitions(spark, t).collect()
    }
    assert rows == {"lang=en": (1, 2), "lang=de": (1, 1)}
    # unpartitioned: one NULL row
    t2 = str(tmp_path / "hparts2")
    hudi.hudi_insert(spark, _mk(spark, [(1, "a"), (2, "b")]), t2,
                     record_key="id")
    r2 = hudi.hudi_partitions(spark, t2).collect()
    assert len(r2) == 1 and r2[0]["partition"] is None
    assert r2[0]["n_rows"] == 2


def test_mor_upsert_appends_log_not_base(spark, tmp_path):
    t = str(tmp_path / "mor1")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    bases_before = {p for _pt, _f, _i, p in hudi.hudi_file_slices(t)}
    hudi.hudi_mor_upsert(spark, _mk(spark, [(2, "B"), (9, "z")]), t)
    # updated key lands in a LOG; base files of touched groups unchanged
    bases_after = {p for _pt, _f, _i, p in hudi.hudi_file_slices(t)}
    assert bases_before <= bases_after  # old bases still live
    assert hudi._log_files(t)  # a log file exists and is committed
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "a"), (2, "B"), (3, "c"), (9, "z")]


def test_mor_delete_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "mor2")
    i1 = hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(spark, _mk(spark, [(1, "A")]), t)
    hudi.hudi_mor_delete(spark, _mk(spark, [(2, "x")]).select("id"), t)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "A")]
    # time travel: before any log, the insert snapshot
    got1 = sorted(
        tuple(r) for r in hudi.read_hudi(spark, t, as_of=i1).collect()
    )
    assert got1 == [(1, "a"), (2, "b")]


def test_mor_compaction_folds_logs(spark, tmp_path):
    t = str(tmp_path / "mor3")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(spark, _mk(spark, [(2, "B"), (5, "e")]), t)
    before = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    inst = hudi.hudi_compact(spark, t)
    assert inst is not None
    after = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert after == before == [(1, "a"), (2, "B"), (5, "e")]
    # compaction superseded the logged base: the live slice set has no
    # group whose (fid, instant) still binds a log file
    logs = hudi._log_files(t)
    live = {(f, i) for _p, f, i, _pa in hudi.hudi_file_slices(t)}
    assert not any((f, b) in live for (_pt, f, b) in logs)
    # idempotent: nothing left to compact
    assert hudi.hudi_compact(spark, t) is None


def test_mor_truncated_foreign_log_tolerated(spark, tmp_path):
    t = str(tmp_path / "mor4")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    # a HoodieLogFormat file whose only block is truncated decodes as
    # one corrupt region (Hudi's recovery rule): tolerated, zero rows —
    # the r8 "foreign framing raises" gate is gone (tests/test_hudi_log
    # covers the real decode); unrecognizable files still raise there.
    part, fid, base, path = hudi.hudi_file_slices(t)[0]
    foreign = os.path.join(t, f".{fid}_{base}.log.1_0-21-31")
    with open(foreign, "w") as f:
        f.write("#HUDI#")
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "a")]


def test_mor_upsert_requires_mor_table(spark, tmp_path):
    t = str(tmp_path / "mor5")
    hudi.hudi_insert(spark, _mk(spark, [(1, "a")]), t, record_key="id")
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        hudi.hudi_mor_upsert(spark, _mk(spark, [(1, "b")]), t)


def test_hudi_clean_removes_superseded_slices(spark, tmp_path):
    t = str(tmp_path / "hclean")
    pre = hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b")]), t, record_key="id"
    )
    hudi.hudi_upsert(spark, _mk(spark, [(2, "B")]), t)
    # dry run names exactly the superseded base slice
    doomed = hudi.hudi_clean(t, dry_run=True)
    assert len(doomed) == 1 and pre in doomed[0]
    removed = hudi.hudi_clean(t)
    assert removed == doomed
    # latest snapshot unaffected; time travel to the cleaned instant
    # raises, naming the cleaned-slice cause (ADVICE r8)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "a"), (2, "B")]
    with pytest.raises(ValueError, match="clean has removed"):
        hudi.read_hudi(spark, t, as_of=pre)
    # a clean marker landed on the timeline; nothing left to clean
    assert any(a == "clean" for _t, a, s in hudi.hudi_timeline(t))
    assert hudi.hudi_clean(t) == []


def test_hudi_clean_reaps_compacted_logs(spark, tmp_path):
    t = str(tmp_path / "hclean2")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(spark, _mk(spark, [(2, "B")]), t)
    hudi.hudi_compact(spark, t)
    doomed = hudi.hudi_clean(t, dry_run=True)
    # the pre-compaction base AND its log are both superseded
    assert len(doomed) == 2
    assert any(".log." in d for d in doomed)
    hudi.hudi_clean(t)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "a"), (2, "B")]
    # never reaps uncommitted files (in-flight writer protection)
    stray = os.path.join(t, "deadbeef_0-0-0_99990101000000000.parquet")
    with open(stray, "wb") as f:
        f.write(b"x")
    assert hudi.hudi_clean(t, dry_run=True) == []


def test_mor_partitioned_nonglobal_identity(spark, tmp_path):
    """MoR identity is (key, partition), matching the CoW upsert's
    non-global index: updating (1, en) must not touch (1, de), and a
    delete must name its partition."""
    t = str(tmp_path / "mor_part")
    df = spark.createDataFrame(
        [(1, "en", "x"), (1, "de", "y"), (2, "en", "z")],
        "id long, lang string, v string",
    ).coalesce(1)
    hudi.hudi_insert(
        spark, df, t, record_key="id", partition_by=["lang"],
        table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(
        spark,
        spark.createDataFrame(
            [(1, "en", "X!")], "id long, lang string, v string"
        ).coalesce(1),
        t,
    )
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "de", "y"), (1, "en", "X!"), (2, "en", "z")]
    # delete requires the partition columns (non-global index)
    with pytest.raises(ValueError, match="partition columns"):
        hudi.hudi_mor_delete(
            spark,
            spark.createDataFrame([(1,)], "id long"),
            t,
        )
    hudi.hudi_mor_delete(
        spark,
        spark.createDataFrame([(1, "en")], "id long, lang string"),
        t,
    )
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "de", "y"), (2, "en", "z")]
    # compaction preserves the partitioned merge
    hudi.hudi_compact(spark, t)
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "de", "y"), (2, "en", "z")]


def test_mor_multiple_logs_latest_instant_wins(spark, tmp_path):
    """A file group carrying SEVERAL log files must merge them in
    instant order — the newest upsert of a key wins across logs, a
    delete in a later log beats an earlier upsert, and a re-upsert
    after a delete resurrects the key."""
    t = str(tmp_path / "mor_multi")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "v0"), (2, "v0"), (3, "v0")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(spark, _mk(spark, [(1, "v1"), (2, "v1")]), t)
    hudi.hudi_mor_upsert(spark, _mk(spark, [(1, "v2")]), t)
    hudi.hudi_mor_delete(spark, _mk(spark, [(2, "x")]).select("id"), t)
    hudi.hudi_mor_upsert(spark, _mk(spark, [(2, "v3")]), t)  # resurrect
    # four logs on one group
    logs = hudi._log_files(t)
    assert sum(len(v) for v in logs.values()) == 4
    got = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got == [(1, "v2"), (2, "v3"), (3, "v0")]
    # time travel threads the same ordering at each instant
    tl = [ts for ts, a, s in hudi.hudi_timeline(t)
          if s == "completed" and a in ("commit", "deltacommit")]
    tl.sort()
    assert sorted(
        tuple(r) for r in hudi.read_hudi(spark, t, as_of=tl[3]).collect()
    ) == [(1, "v2"), (3, "v0")]  # post-delete, pre-resurrect
    # compaction folds all four logs into one new slice, same result
    hudi.hudi_compact(spark, t)
    got2 = sorted(tuple(r) for r in hudi.read_hudi(spark, t).collect())
    assert got2 == got


def test_clean_then_time_travel_partial_raises(spark, tmp_path):
    """ADVICE r8 (medium): after a clean, time travel to an instant
    whose slice for SOME group was reaped must raise — not silently
    serve the surviving groups as a shrunken snapshot."""
    t = str(tmp_path / "hclean3")
    i1 = hudi.hudi_insert(spark, _mk(spark, [(1, "a")]), t, record_key="id")
    hudi.hudi_insert(spark, _mk(spark, [(2, "b")]), t, record_key="id")
    # rewrite ONLY group 1's slice, then reap the superseded file
    hudi.hudi_upsert(spark, _mk(spark, [(1, "A")]), t)
    removed = hudi.hudi_clean(t)
    assert len(removed) == 1 and i1 in removed[0]
    # latest snapshot intact
    assert _rows(spark, t) == [(1, "A"), (2, "b")]
    # as_of=i1: group 2 did not exist yet; group 1's slice is gone.
    # The old listing-based discovery returned [] rows for group 1 and
    # nothing else -> here EVERY expected group is missing, but the
    # dedicated message must name the cleaned-slice cause.
    with pytest.raises(ValueError, match="clean has removed"):
        hudi.read_hudi(spark, t, as_of=i1)
    # the partial-shrink case proper: i2 expects BOTH groups; group 2
    # survives, group 1's i1 slice is cleaned -> raise, never 1 row
    i2 = sorted(ts for ts, a, s in hudi.hudi_timeline(t) if s == "completed")[1]
    with pytest.raises(ValueError, match="clean has removed"):
        hudi.read_hudi(spark, t, as_of=i2)


def test_commit_race_cross_action_aborts(spark, tmp_path):
    """ADVICE r8: two writers racing one instant with DIFFERENT
    actions must not both complete — the claim is action-agnostic."""
    t = str(tmp_path / "hrace")
    hudi.hudi_insert(spark, _mk(spark, [(1, "a")]), t, record_key="id")
    nxt = hudi._next_instant(t)
    # a rival writer (different action) already owns the next instant
    hudi._claim_instant(t, nxt, "deltacommit")
    with pytest.raises(RuntimeError, match="lost the commit race"):
        hudi.hudi_upsert(spark, _mk(spark, [(1, "A")]), t)
    # the loser's placed files were removed: no base file at the
    # contested instant, table still serves the original rows
    assert not any(
        inst == nxt for _p, _f, inst, _path in hudi._base_files(t)
    )
    assert _rows(spark, t) == [(1, "a")]
    # same-action races still lose the claim too
    with pytest.raises(FileExistsError):
        hudi._claim_instant(t, nxt, "deltacommit")


def test_rollback_latest_commit(spark, tmp_path):
    t = str(tmp_path / "hrb")
    i1 = hudi.hudi_insert(spark, _mk(spark, [(1, "a"), (2, "b")]), t, "id")
    hudi.hudi_upsert(spark, _mk(spark, [(2, "B!"), (9, "new")]), t)
    removed = hudi.hudi_rollback(t)
    # the upsert's rewritten slice AND its new group are gone
    assert len(removed) == 2
    assert _rows(spark, t) == [(1, "a"), (2, "b")]
    # rollback landed on the timeline; time travel to i1 still works
    assert any(a == "rollback" for _ts, a, _s in hudi.hudi_timeline(t))
    assert _rows(spark, t, as_of=i1) == [(1, "a"), (2, "b")]
    # only-latest guard
    hudi.hudi_upsert(spark, _mk(spark, [(1, "A")]), t)
    with pytest.raises(ValueError, match="latest completed"):
        hudi.hudi_rollback(t, instant=i1)


def test_rollback_mor_deltacommit_and_refusal_after_clean(spark, tmp_path):
    t = str(tmp_path / "hrb2")
    hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(spark, _mk(spark, [(2, "B!")]), t)
    removed = hudi.hudi_rollback(t)
    assert len(removed) == 1 and ".log." in removed[0]
    assert _rows(spark, t) == [(1, "a"), (2, "b")]
    # now: upsert + clean reaps the pre-upsert slice -> rollback of the
    # upsert would leave the group with no base file; must refuse
    hudi.hudi_upsert(spark, _mk(spark, [(1, "A")]), t)
    hudi.hudi_clean(t)
    with pytest.raises(ValueError, match="clean has removed"):
        hudi.hudi_rollback(t)
    assert _rows(spark, t) == [(1, "A"), (2, "b")]


def test_rollback_first_insert_empties_table(spark, tmp_path):
    t = str(tmp_path / "hrb3")
    hudi.hudi_insert(spark, _mk(spark, [(1, "a")]), t, "id")
    removed = hudi.hudi_rollback(t)
    assert len(removed) == 1
    with pytest.raises(ValueError, match="no completed file slices"):
        hudi.read_hudi(spark, t)


def test_read_hudi_changes_mor_cdc(spark, tmp_path):
    """Incremental trio symmetry: MoR log rows ARE the CDC stream."""
    t = str(tmp_path / "hcdc")
    i1 = hudi.hudi_insert(
        spark, _mk(spark, [(1, "a"), (2, "b"), (3, "c")]), t,
        record_key="id", table_type="MERGE_ON_READ",
    )
    hudi.hudi_mor_upsert(spark, _mk(spark, [(2, "B!"), (9, "new")]), t)
    hudi.hudi_mor_delete(spark, _mk(spark, [(3, "x")]).select("id"), t)
    ch = hudi.read_hudi_changes(spark, t, starting_instant=i1)
    got = sorted(
        (r["_change_type"], r["_change_key"], r["id"], r["v"])
        for r in ch.collect()
    )
    assert got == [
        ("delete", "3", 3, None),
        ("insert", "9", 9, "new"),       # new group opened by the upsert
        ("update_postimage", "2", 2, "B!"),
    ]
    # compaction is a logical no-op for CDC
    c = hudi.hudi_compact(spark, t)
    after = hudi.read_hudi_changes(spark, t, starting_instant=i1)
    assert sorted(
        (r["_change_type"], r["_change_key"]) for r in after.collect()
    ) == [("delete", "3"), ("insert", "9"), ("update_postimage", "2")]
    assert c is not None
    # empty range
    assert hudi.read_hudi_changes(spark, t, starting_instant=c).count() == 0


def test_read_hudi_changes_cow_contract(spark, tmp_path):
    t = str(tmp_path / "hcdc2")
    i1 = hudi.hudi_insert(spark, _mk(spark, [(1, "a")]), t, "id")
    hudi.hudi_insert(spark, _mk(spark, [(2, "b")]), t, "id")
    ch = hudi.read_hudi_changes(spark, t, starting_instant=i1)
    assert sorted(
        (r["_change_type"], r["id"], r["v"]) for r in ch.collect()
    ) == [("insert", 2, "b")]
    # a CoW upsert rewrites slices: append-only honesty
    hudi.hudi_upsert(spark, _mk(spark, [(1, "A")]), t)
    with pytest.raises(ValueError, match="UPSERT"):
        hudi.read_hudi_changes(spark, t, starting_instant=i1).collect()
