"""Snapshot store: immutable files, manifest time travel, CoW pruning.

The reference has no dataset versioning at all (every write replaces
the output in place, tfds_pipelines.py:25-78); these tests pin the
lakehouse contract sinks/snapshots.py adds on top of plain parquet.
"""

import os

import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sinks import snapshots as snap


def _rows(df):
    return sorted(
        (r["doc_id"], r["text"], r["score"]) for r in df.collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "snap_tbl")
    df = spark.createDataFrame(
        [(i, f"text-{i}", i * 10) for i in range(1, 9)],
        "doc_id long, text string, score long",
    ).repartition(4)
    v = snap.snapshot_write(df, path)
    assert v == 1
    return path


def test_write_and_read_latest(spark, table):
    out = snap.read_snapshot(spark, table)
    assert _rows(out) == [(i, f"text-{i}", i * 10) for i in range(1, 9)]


def test_append_carries_old_files_by_reference(spark, table):
    v1_files = set(snap._manifest(table, 1)["files"])
    extra = spark.createDataFrame(
        [(9, "text-9", 90)], "doc_id long, text string, score long"
    )
    v = snap.snapshot_append(extra, table)
    assert v == 2
    m2 = snap._manifest(table, 2)
    assert v1_files < set(m2["files"])  # strict superset: shared, not copied
    assert len(_rows(snap.read_snapshot(spark, table, 2))) == 9
    assert len(_rows(snap.read_snapshot(spark, table, 1))) == 8


def test_upsert_replaces_and_inserts_cow(spark, table):
    updates = spark.createDataFrame(
        [(2, "REPLACED", 999), (100, "NEW", 1)],
        "doc_id long, text string, score long",
    )
    v = snap.snapshot_upsert(updates, table, id_col="doc_id")
    assert v == 2
    got = dict(
        (r["doc_id"], (r["text"], r["score"]))
        for r in snap.read_snapshot(spark, table, 2).collect()
    )
    assert got[2] == ("REPLACED", 999)
    assert got[100] == ("NEW", 1)
    assert got[3] == ("text-3", 30)
    assert len(got) == 9
    # time travel: v1 unchanged
    assert _rows(snap.read_snapshot(spark, table, 1)) == [
        (i, f"text-{i}", i * 10) for i in range(1, 9)
    ]
    # CoW: files NOT containing doc_id=2 are carried by reference
    m1, m2 = snap._manifest(table, 1), snap._manifest(table, 2)
    carried = set(m1["files"]) & set(m2["files"])
    assert carried, "untouched files must be shared across versions"


def test_upsert_last_wins_on_order_col(spark, table):
    updates = spark.createDataFrame(
        [(5, "old", 1), (5, "newest", 7), (5, "mid", 3)],
        "doc_id long, text string, score long",
    )
    snap.snapshot_upsert(updates, table, id_col="doc_id", order_col="score")
    got = {
        r["doc_id"]: r["text"]
        for r in snap.read_snapshot(spark, table).collect()
    }
    assert got[5] == "newest"
    assert len(got) == 8


def test_delete_rows_and_time_travel(spark, table):
    v = snap.snapshot_delete(
        spark, table, F.col("doc_id").isin(1, 2, 3)
    )
    assert v == 2
    assert [r["doc_id"] for r in snap.read_snapshot(spark, table, 1)
            .select("doc_id").collect()] != []
    left = sorted(
        r["doc_id"] for r in snap.read_snapshot(spark, table, 2).collect()
    )
    assert left == [4, 5, 6, 7, 8]


def test_delete_everything_stays_readable(spark, table):
    snap.snapshot_delete(spark, table, F.lit(True))
    out = snap.read_snapshot(spark, table)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "text", "score"}


def test_vacuum_keeps_retained_versions_readable(spark, table):
    snap.snapshot_upsert(
        spark.createDataFrame(
            [(1, "v2", 0)], "doc_id long, text string, score long"
        ),
        table,
        id_col="doc_id",
    )
    snap.snapshot_delete(spark, table, F.col("doc_id") == 8)
    assert snap.snapshot_versions(table) == [1, 2, 3]
    stats = snap.vacuum_snapshots(table, keep_last=2, min_age_seconds=0)
    assert stats["kept_versions"] == [2, 3]
    assert 1 in stats["removed_versions"]
    # retained versions still read correctly after the file reclaim
    assert len(_rows(snap.read_snapshot(spark, table, 2))) == 8
    assert len(_rows(snap.read_snapshot(spark, table, 3))) == 7
    with pytest.raises(FileNotFoundError):
        snap._manifest(table, 1)
    # every surviving data file is referenced by a retained manifest
    referenced = set(snap._manifest(table, 2)["files"]) | set(
        snap._manifest(table, 3)["files"]
    )
    on_disk = {
        f"{snap.DATA_DIR}/{n}"
        for n in os.listdir(os.path.join(table, snap.DATA_DIR))
    }
    assert on_disk == referenced


def test_conflict_detected_on_stale_base(spark, table):
    # simulate a racing committer claiming v2 first
    m1 = snap._manifest(table, 1)
    snap._commit(table, "append", m1["files"], expected_parent=1)
    with pytest.raises(snap.SnapshotConflictError):
        snap._commit(table, "upsert", [], expected_parent=1)


def test_append_retries_past_conflict(spark, table):
    # another committer claims v2 between append's stage and commit;
    # append must land at v3 with BOTH commits' rows visible
    extra = spark.createDataFrame(
        [(50, "fifty", 500)], "doc_id long, text string, score long"
    )
    orig_latest = snap.latest_version

    calls = {"n": 0}

    def racing_latest(path):
        v = orig_latest(path)
        if calls["n"] == 0:
            calls["n"] += 1
            snap._commit(path, "append", snap._manifest(path, v)["files"], v)
        return v

    snap.latest_version, saved = racing_latest, snap.latest_version
    try:
        v = snap.snapshot_append(extra, table)
    finally:
        snap.latest_version = saved
    assert v == 3
    assert len(_rows(snap.read_snapshot(spark, table, 3))) == 9


def test_second_write_rejected(spark, table):
    df = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"),
        F.lit(0).alias("score"),
    )
    with pytest.raises(FileExistsError):
        snap.snapshot_write(df, table)


@pytest.mark.slow
def test_snapshot_cow_scale_1m_rows(spark, tmp_path):
    """1M rows in 64 immutable files: a 100-row upsert must rewrite a
    bounded handful of files and carry the rest by reference, and a
    point delete must not grow the file count."""
    import pyspark.sql.functions as F  # noqa: N812

    path = str(tmp_path / "snap1m")
    # range-partitioned write: files hold contiguous id runs — the
    # id-clustered layout appends naturally produce (batch = id range)
    base = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 97).alias("score"),
    ).repartitionByRange(64, "doc_id")
    snap.snapshot_write(base, path)
    m1 = snap._manifest(path, 1)
    assert len(m1["files"]) == 64

    # a CONCENTRATED 100-id update (one batch's range): CoW must
    # rewrite only the file(s) whose run contains those ids and carry
    # everything else by reference
    updates = spark.range(100).select(
        (F.col("id") + 500_000).alias("doc_id"),
        F.lit("UPDATED").alias("text"),
        F.lit(-1).alias("score"),
    )
    snap.snapshot_upsert(updates, path, id_col="doc_id")
    m2 = snap._manifest(path, 2)
    carried = set(m1["files"]) & set(m2["files"])
    assert len(carried) >= 60  # ~62-63 of 64 untouched, never rewritten
    out = snap.read_snapshot(spark, path, 2)
    assert out.count() == 1_000_000
    assert out.filter("text = 'UPDATED'").count() == 100

    # delete one specific id: only the file holding it is touched
    snap.snapshot_delete(spark, path, F.col("doc_id") == 777)
    m3 = snap._manifest(path, 3)
    carried3 = set(m2["files"]) & set(m3["files"])
    assert len(carried3) >= len(m2["files"]) - 2  # ≥ all-but-the-hit-file
    assert snap.read_snapshot(spark, path, 3).count() == 999_999


def test_delete_null_predicate_keeps_row(spark, table):
    # add a row with NULL score; DELETE WHERE score < 20 must keep it
    snap.snapshot_append(
        spark.createDataFrame(
            [(50, "nullscore", None)], "doc_id long, text string, score long"
        ),
        table,
    )
    snap.snapshot_delete(spark, table, F.col("score") < 20)
    ids = {r["doc_id"] for r in snap.read_snapshot(spark, table).collect()}
    assert 50 in ids          # NULL predicate -> kept
    assert 1 not in ids       # score=10 -> deleted


def test_upsert_full_tie_is_deterministic(spark, tmp_path):
    # two updates with the SAME id and SAME order value: the survivor
    # must be chosen by content digest — identical across runs
    winners = []
    for run in range(2):
        p = str(tmp_path / f"snap_tie_{run}")
        base = spark.createDataFrame(
            [(5, "orig", 0)], "doc_id long, text string, score long"
        )
        snap.snapshot_write(base, p)
        ups = spark.createDataFrame(
            [(5, "alpha", 7), (5, "beta", 7)],
            "doc_id long, text string, score long",
        ).repartition(4)
        snap.snapshot_upsert(ups, p, id_col="doc_id", order_col="score")
        winners.append(
            snap.read_snapshot(spark, p).collect()[0]["text"]
        )
    assert winners[0] == winners[1]


def test_vacuum_age_guard_spares_young_files(spark, table):
    # an unreferenced young file (in-flight commit simulation) survives
    data_dir = os.path.join(table, snap.DATA_DIR)
    stray = os.path.join(data_dir, "inflight-part.parquet")
    with open(stray, "wb") as f:
        f.write(b"not yet committed")
    stats = snap.vacuum_snapshots(table, keep_last=2, min_age_seconds=3600)
    assert "data/inflight-part.parquet" not in stats["removed_files"]
    assert os.path.exists(stray)
    os.unlink(stray)


def test_tag_ledger_survives_vacuum(spark, table):
    extra = spark.createDataFrame(
        [(60, "sixty", 600)], "doc_id long, text string, score long"
    )
    v = snap.snapshot_append(extra, table, tag="epoch-1")
    # push two more versions so the tagged one expires
    snap.snapshot_append(
        spark.createDataFrame(
            [(61, "a", 1)], "doc_id long, text string, score long"
        ),
        table,
    )
    snap.snapshot_append(
        spark.createDataFrame(
            [(62, "b", 2)], "doc_id long, text string, score long"
        ),
        table,
    )
    snap.vacuum_snapshots(table, keep_last=2, min_age_seconds=0)
    assert v not in snap.snapshot_versions(table)  # manifest expired
    assert "epoch-1" in snap.committed_tags(table)  # ledger remembers
    n_before = snap.read_snapshot(spark, table).count()
    # replay of the expired epoch is STILL a no-op
    snap.snapshot_append(extra, table, tag="epoch-1")
    assert snap.read_snapshot(spark, table).count() == n_before


def test_snapshot_diff_added_removed_changed(spark, table):
    snap.snapshot_upsert(
        spark.createDataFrame(
            [(2, "CHANGED", 999), (100, "NEW", 1)],
            "doc_id long, text string, score long",
        ),
        table,
        id_col="doc_id",
    )
    snap.snapshot_delete(spark, table, F.col("doc_id") == 7)
    diff = {
        r["doc_id"]: r["change_type"]
        for r in snap.snapshot_diff(spark, table, 1, 3, "doc_id").collect()
    }
    assert diff == {2: "changed", 100: "added", 7: "removed"}
    # diff of a version with itself is empty
    assert snap.snapshot_diff(spark, table, 3, 3, "doc_id").count() == 0
