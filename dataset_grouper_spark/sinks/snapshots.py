"""Snapshot-versioned dataset store: immutable data files + manifest log.

The reference rewrites datasets wholesale and in place
(``tfds_pipelines.py:25-78`` writes one sharded output, readers re-list
it) — there is no notion of dataset versions, so a reader racing a
rewrite sees mixed state, and yesterday's corpus is gone the moment
today's lands. At 100 TB that contract is untenable: curation is
iterative (append a crawl, redact, dedup, delete on a GDPR request),
training jobs pin a corpus for days, and an audit needs the exact bytes
a run trained on.

This module adds the lakehouse contract on plain parquet, Iceberg/Delta
style but dependency-free:

- **Data files are immutable.** Every mutation writes NEW files under
  ``data/`` (uuid-named, so names never collide) and never touches an
  existing one.
- **Membership is a manifest.** ``_snapshots/v00001.json`` … each list
  the exact data files of that version. Readers resolve a manifest,
  then read precisely those files — a reader holding version N is
  unaffected by any later commit, with zero copying (unchanged files
  are shared across versions by reference).
- **Commits are atomic and exclusive.** The manifest is fully written
  to a temp name, then claimed via ``os.link`` (atomic fail-if-exists
  on POSIX). Concurrent committers race on the version number; the
  loser of an upsert/delete gets a ``SnapshotConflictError`` (its file
  pruning was computed against a stale base — optimistic concurrency),
  while ``snapshot_append`` recomputes its carried list and retries
  (appended files are disjoint from every other commit's).
- **Mutations are copy-on-write at FILE granularity.** Upsert/delete
  first locate the files that contain affected rows (one
  ``input_file_name()`` scan, collected as ≤ num_files names — bounded
  by file count, never row count), re-read ONLY those files for the
  rewrite, and carry every untouched file forward by reference.
  Appending an hour to a year of data writes the hour.
- **Space is reclaimed explicitly.** ``vacuum_snapshots(keep_last=k)``
  deletes data files referenced only by expired manifests — never by a
  retained one — so time travel and vacuum compose predictably.

Scale notes: the per-version metadata is one JSON listing (O(files));
reads pass the explicit file list to the parquet source, so Catalyst
still gets footer pruning and predicate pushdown per file. Group-major
read layouts (``write_partitioned``/bucketed) remain the serving
layouts; this store is the mutation log you curate in, with
``read_snapshot`` feeding the layout writer at publish time.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.compat import fs as _fs

SNAP_DIR = "_snapshots"
DATA_DIR = "data"
EMPTY_DIR = "_empty"
_STAGE_PREFIX = "_stage-"


class SnapshotConflictError(RuntimeError):
    """A concurrent commit advanced the table past the version this
    mutation was computed against."""


def _snap_path(path: str, version: int) -> str:
    return os.path.join(path, SNAP_DIR, f"v{version:05d}.json")


def _manifest(path: str, version: int) -> dict:
    return json.loads(_fs.read_text(_snap_path(path, version)))


def snapshot_versions(path: str) -> list[int]:
    """All committed versions, ascending."""
    d = os.path.join(path, SNAP_DIR)
    if not _fs.is_dir(d):
        return []
    out = []
    for name in _fs.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def latest_version(path: str) -> int:
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {path}")
    return versions[-1]


def _stage_files(df: DataFrame, path: str) -> list[str]:
    """Write ``df`` as immutable uuid-named files under data/, return
    their table-relative names. The parquet job writes to a private
    stage dir; files are then moved (same-filesystem rename) into
    ``data/`` under names no other commit can produce."""
    token = uuid.uuid4().hex
    stage = os.path.join(path, f"{_STAGE_PREFIX}{token}")
    df.write.mode("overwrite").parquet(stage)
    data_dir = os.path.join(path, DATA_DIR)
    _fs.makedirs(data_dir)
    rel_names = []
    for name in sorted(_fs.listdir(stage)):
        if not name.endswith(".parquet"):
            continue
        rel = f"{DATA_DIR}/{token}-{name}"
        _fs.move(os.path.join(stage, name), os.path.join(path, rel))
        rel_names.append(rel)
    _fs.rmtree(stage)
    return rel_names


TAGS_LOG = "tags.log"


def _tags_log_path(path: str) -> str:
    return os.path.join(path, SNAP_DIR, TAGS_LOG)


def _ledger_tags(path: str) -> set[str]:
    try:
        text = _fs.read_text(_tags_log_path(path))
    except FileNotFoundError:
        return set()
    return {line.strip() for line in text.splitlines() if line.strip()}


def _ledger_add(path: str, tags: set[str]) -> None:
    """Atomic-enough append (single short O_APPEND writes) of tags not
    yet in the ledger."""
    new = tags - _ledger_tags(path)
    if not new:
        return
    lp = _tags_log_path(path)
    if not _fs.is_uri(lp):
        with open(lp, "a") as f:  # true O_APPEND on the local path
            f.write("".join(t + "\n" for t in sorted(new)))
        return
    # object stores can't append: read-modify-write; the single-writer-
    # per-tag contract (stream checkpoints) makes the race benign
    prior = _fs.read_text(lp) if _fs.exists(lp) else ""
    _fs.write_text(lp, prior + "".join(t + "\n" for t in sorted(new)))


def committed_tags(path: str) -> set[str]:
    """All commit tags ever seen — the idempotency ledger for
    epoch-tagged writers (streaming foreachBatch replay detection).
    Union of the LIVE manifests and the append-only ``tags.log``
    ledger, which preserves the tags of manifests that vacuum has
    expired — so replay detection survives retention (a tag must
    outlive its manifest, else a crash-replay after vacuum would
    re-append an already-ingested epoch)."""
    live = {
        t
        for v in snapshot_versions(path)
        if (t := _manifest(path, v).get("tag")) is not None
    }
    return live | _ledger_tags(path)


def _commit(
    path: str,
    op: str,
    files: list[str],
    expected_parent: int,
    tag: str | None = None,
) -> int:
    """Atomically claim version ``expected_parent + 1``. The manifest is
    complete before it becomes visible (write temp + hard-link claim),
    so a crash can strand a temp file but never a half-readable
    manifest. Raises ``SnapshotConflictError`` if any other commit
    claimed the slot first — the caller's file set was computed against
    a base that is no longer latest."""
    snap_dir = os.path.join(path, SNAP_DIR)
    _fs.makedirs(snap_dir)
    version = expected_parent + 1
    body = {
        "op": op,
        "version": version,
        "parent": expected_parent,
        "files": sorted(files),
    }
    if tag is not None:
        body["tag"] = tag
    try:
        if not _fs.is_uri(path):
            # local: temp + hard link — complete-before-visible AND an
            # atomic fail-if-exists claim in one syscall
            tmp = os.path.join(snap_dir, f".tmp-{uuid.uuid4().hex}.json")
            with open(tmp, "w") as f:
                json.dump(body, f)
            try:
                os.link(tmp, _snap_path(path, version))
            finally:
                os.unlink(tmp)
        else:
            # remote: exclusive create + ONE write (pyarrow flushes on
            # close, so the manifest appears whole); CAS caveat as per
            # compat.fs.open_create
            with _fs.open_create(_snap_path(path, version)) as f:
                f.write(json.dumps(body).encode())
    except FileExistsError:
        raise SnapshotConflictError(
            f"{op} computed against v{expected_parent}, but v{version} "
            f"was committed concurrently; recompute against the new base"
        ) from None
    return version


def snapshot_write(df: DataFrame, path: str) -> int:
    """Create the table: data files + manifest v1 + a zero-row schema
    footer (so a later delete-everything version stays readable)."""
    _fs.makedirs(path)
    if snapshot_versions(path):
        raise FileExistsError(f"snapshot table already exists at {path}")
    df.limit(0).write.mode("overwrite").parquet(os.path.join(path, EMPTY_DIR))
    files = _stage_files(df, path)
    return _commit(path, "write", files, expected_parent=0)


def snapshot_append(df: DataFrame, path: str, tag: str | None = None) -> int:
    """Append-only commit: new files + everything the latest version
    references. Safe under concurrency — on a lost race it re-reads the
    new latest manifest and retries with the same staged files (they
    are disjoint from every other commit's).

    ``tag`` makes the append IDEMPOTENT per tag: if the tag was already
    committed, the call is a no-op returning the CURRENT LATEST version
    (not the version that originally carried the tag — that manifest
    may have been vacuumed away; appends are cumulative, so the latest
    version always contains the tagged batch's rows). This is the
    exactly-once hook for epoch-replaying writers (a streaming
    foreachBatch that crashed between append and checkpoint commit
    re-runs the epoch; the tag makes the re-run harmless). Tags are
    also recorded in the append-only ``tags.log`` ledger so the check
    survives vacuum retention. The check assumes one writer per tag —
    two concurrent committers with the SAME tag can both land (stream
    checkpoints guarantee the former)."""
    if tag is not None:
        if tag in _ledger_tags(path):
            return latest_version(path)
        for v in snapshot_versions(path):
            if _manifest(path, v).get("tag") == tag:
                # same contract as the ledger path: replays return
                # latest, regardless of which manifest carries the tag
                return latest_version(path)
    files = _stage_files(df, path)
    while True:
        parent = latest_version(path)
        carried = _manifest(path, parent)["files"]
        try:
            version = _commit(
                path, "append", carried + files, parent, tag=tag
            )
            if tag is not None:
                _ledger_add(path, {tag})
            return version
        except SnapshotConflictError:
            continue


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read one pinned version: exactly the manifest's files, never a
    directory listing — a concurrent commit cannot change what this
    frame reads. ``version=None`` resolves the latest ONCE, here."""
    if version is None:
        version = latest_version(path)
    files = _manifest(path, version)["files"]
    if not files:
        return spark.read.parquet(os.path.join(path, EMPTY_DIR))
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def _touched_rel_files(rows_with_file: DataFrame) -> list[str]:
    """Distinct source files of the given rows as table-relative names.
    ``input_file_name()`` yields absolute ``file:``/``hdfs:`` URIs; all
    snapshot data files live flat under ``data/`` with globally unique
    names, so the basename identifies the file. The collect is bounded
    by FILE count (≤ manifest length), never row count."""
    rows = rows_with_file.select(
        F.element_at(F.split(F.col("_file"), "/"), -1).alias("_name")
    ).distinct()
    return [f"{DATA_DIR}/{r['_name']}" for r in rows.collect()]


def snapshot_upsert(
    updates: DataFrame,
    path: str,
    id_col: str,
    order_col: str | None = None,
) -> int:
    """MERGE, copy-on-write: rows whose ``id_col`` matches an update are
    replaced, new ids are inserted. Only files CONTAINING a matched row
    are rewritten (re-read individually — true file pruning, not a
    post-scan filter); all others carry forward by reference. If
    ``order_col`` is given, duplicate ids inside ``updates`` resolve
    last-wins on it; full ties break on a content digest of the whole
    row (the id can't break ties — it is the window's partition key,
    constant within the group), so the survivor is deterministic on
    any cluster."""
    spark = updates.sparkSession
    base = latest_version(path)
    if order_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col(order_col).desc(),
            F.md5(F.to_json(F.struct(*updates.columns))),
        )
        updates = (
            updates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    cur = read_snapshot(spark, path, base).withColumn(
        "_file", F.input_file_name()
    )
    upd_ids = updates.select(F.col(id_col).alias("_upd_id")).distinct()
    # no broadcast hint: updates may be any size — size-based planning
    # (and AQE) picks the strategy; the collect below is file-bounded
    touched = _touched_rel_files(
        cur.join(upd_ids, cur[id_col] == F.col("_upd_id"), "left_semi")
    )
    new_files: list[str] = []
    if touched:
        touched_df = spark.read.parquet(
            *[os.path.join(path, f) for f in touched]
        )
        survivors = touched_df.join(
            upd_ids, F.col(id_col) == F.col("_upd_id"), "left_anti"
        )
        new_files = _stage_files(survivors.unionByName(updates), path)
    else:
        new_files = _stage_files(updates, path)
    touched_set = set(touched)
    carried = [
        f for f in _manifest(path, base)["files"] if f not in touched_set
    ]
    return _commit(path, "upsert", carried + new_files, base)


def snapshot_delete(
    spark: SparkSession, path: str, predicate: Column
) -> int:
    """DELETE WHERE, copy-on-write: files containing a matching row are
    rewritten without those rows; fully-deleted files simply drop out
    of the manifest (their rewrite yields zero rows, which the parquet
    writer still stages as an empty part — harmless, vacuumed later).

    SQL DELETE semantics: only rows where the predicate is TRUE are
    removed — a NULL-valued predicate KEEPS the row (``~NULL`` is NULL
    and a bare ``filter(~pred)`` would silently drop it)."""
    base = latest_version(path)
    cur = read_snapshot(spark, path, base).withColumn(
        "_file", F.input_file_name()
    )
    touched = _touched_rel_files(cur.filter(predicate))
    new_files: list[str] = []
    if touched:
        touched_df = spark.read.parquet(
            *[os.path.join(path, f) for f in touched]
        )
        survivors = touched_df.filter(~predicate | predicate.isNull())
        new_files = _stage_files(survivors, path)
    touched_set = set(touched)
    carried = [
        f for f in _manifest(path, base)["files"] if f not in touched_set
    ]
    return _commit(path, "delete", carried + new_files, base)


def vacuum_snapshots(
    path: str, keep_last: int = 2, min_age_seconds: float = 3600.0
) -> dict:
    """Expire all but the last ``keep_last`` versions: their manifests
    are removed (tags preserved in the ``tags.log`` ledger so epoch
    replay detection survives retention), and data files referenced by
    NO retained manifest are deleted. Stranded stage dirs (crashed
    writers) go too. Reads of any retained version are unaffected.

    ``min_age_seconds`` is the in-flight-writer guard (Delta's VACUUM
    retention, same idea): an unreferenced data file or stage dir
    younger than this is assumed to belong to a commit IN PROGRESS
    (files land in ``data/`` before the manifest publishes) and is
    left alone — deleting it would corrupt the commit the moment its
    manifest lands. Set 0 only when no writer can possibly be active."""
    import time

    now = time.time()
    versions = snapshot_versions(path)
    keep = versions[-keep_last:] if keep_last > 0 else []
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_manifest(path, v)["files"])
    expired_tags = {
        t
        for v in versions
        if v not in keep
        and (t := _manifest(path, v).get("tag")) is not None
    }
    if expired_tags:
        _ledger_add(path, expired_tags)
    removed_files = []
    data_dir = os.path.join(path, DATA_DIR)
    if _fs.is_dir(data_dir):
        for name in _fs.listdir(data_dir):
            rel = f"{DATA_DIR}/{name}"
            full = os.path.join(data_dir, name)
            if rel not in referenced and (
                now - _fs.mtime(full) >= min_age_seconds
            ):
                _fs.remove(full)
                removed_files.append(rel)
    removed_versions = []
    for v in versions:
        if v not in keep:
            _fs.remove(_snap_path(path, v))
            removed_versions.append(v)
    removed_stages = []
    for name in _fs.listdir(path):
        if name.startswith(_STAGE_PREFIX):
            full = os.path.join(path, name)
            if now - _fs.mtime(full) >= min_age_seconds:
                _fs.rmtree(full)
                removed_stages.append(name)
    return {
        "removed_files": sorted(removed_files),
        "removed_versions": removed_versions,
        "removed_stages": removed_stages,
        "kept_versions": keep,
    }


def snapshot_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    id_col: str,
) -> DataFrame:
    """Row-level audit between two pinned versions: what a compliance
    review or an incremental consumer needs from a versioned store.
    Returns (id, change_type) with change_type ∈ added | removed |
    changed — 'changed' decided by an md5 digest of the full row
    (column-name-sorted JSON, so column order never matters). One
    full-outer join on the id; both sides are manifest-pinned reads,
    so the diff is stable under concurrent commits."""
    from pyspark.sql import functions as F

    def digest(df: DataFrame) -> DataFrame:
        cols = sorted(c for c in df.columns if c != id_col)
        return df.select(
            F.col(id_col).alias("_id"),
            F.md5(F.to_json(F.struct(*[F.col(c) for c in cols]))).alias(
                "_h"
            ),
        )

    a = digest(read_snapshot(spark, path, from_version)).withColumnRenamed(
        "_h", "_ha"
    )
    b = digest(read_snapshot(spark, path, to_version)).withColumnRenamed(
        "_h", "_hb"
    )
    joined = a.join(b, "_id", "full_outer")
    return joined.select(
        F.col("_id").alias(id_col),
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .when(F.col("_ha") != F.col("_hb"), F.lit("changed"))
        .alias("change_type"),
    ).filter(F.col("change_type").isNotNull())
