"""Delta Lake table READER — pure transaction-log walk, no delta jar.

The Delta log format is public (the Delta Transaction Log Protocol):
``_delta_log/<20-digit version>.json`` holds line-delimited JSON
actions (``metaData``, ``add``, ``remove``, ``protocol``,
``commitInfo``); every ~10 commits a ``<version>.checkpoint.parquet``
snapshots the accumulated state, advertised by ``_last_checkpoint``.
A reader reconstructs any version's active-file set by replaying
add/remove actions (newest checkpoint first, then the JSON tail).

This module implements exactly that — enough to point the engine at a
Delta table a Spark/Databricks/Trino estate maintains and read it
(latest or TIME TRAVEL to any retained version) without the
delta-spark package:

- JSON commits + parquet checkpoints (both multipart-free forms)
- partition columns restored from ``add.partitionValues`` (Delta
  stores them OUTSIDE the data files), typed via the table's
  ``metaData.schemaString`` (a Spark StructType JSON — parsed with
  ``StructType.fromJson``)
- deletion-vector-free protocol (reader version <= 1 semantics); a
  table using deletion vectors raises rather than silently
  over-returning rows

Scale shape: the log walk is a driver-side metadata scan (file lists,
like every table format's planning step); DATA moves only through
``spark.read.parquet`` over the active files, so pushdown/pruning
behave exactly as on raw parquet, and per-file partition literals
prune in the plan (the union is by partition-value group, each group
one scan with constant columns).
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, _LOG_DIR)


def delta_versions(table_path: str) -> list[int]:
    """All commit versions present in the log, ascending."""
    log = _log_path(table_path)
    if not os.path.isdir(log):
        raise FileNotFoundError(f"not a Delta table (no {_LOG_DIR}): {table_path}")
    out = []
    for name in os.listdir(log):
        if name.endswith(".json") and name[:-5].isdigit():
            out.append(int(name[:-5]))
    return sorted(out)


def _latest_checkpoint(table_path: str, version: int):
    """(checkpoint_version, checkpoint_file) of the newest checkpoint
    at or below ``version``, or None."""
    log = _log_path(table_path)
    best = None
    for name in os.listdir(log):
        if name.endswith(".checkpoint.parquet"):
            head = name.split(".")[0]
            if head.isdigit() and int(head) <= version:
                if best is None or int(head) > best[0]:
                    best = (int(head), os.path.join(log, name))
    return best


def _replay(spark: SparkSession, table_path: str, version: int):
    """Active files + metadata at ``version``: checkpoint state (if
    any) then the JSON commits after it, newest action per path wins."""
    log = _log_path(table_path)
    adds: dict[str, dict] = {}
    meta = None
    ckpt = _latest_checkpoint(table_path, version)
    start = 0
    if ckpt is not None:
        cp_version, cp_file = ckpt
        start = cp_version + 1
        for row in spark.read.parquet(cp_file).collect():
            d = row.asDict(recursive=True)
            if d.get("add"):
                a = d["add"]
                adds[a["path"]] = a
            if d.get("remove"):
                adds.pop(d["remove"]["path"], None)
            if d.get("metaData") and d["metaData"].get("schemaString"):
                meta = d["metaData"]
    versions = [v for v in delta_versions(table_path) if start <= v <= version]
    expect = list(range(start, version + 1))
    if versions != expect:
        raise ValueError(
            f"Delta log is missing commits {sorted(set(expect) - set(versions))} "
            f"for version {version} (vacuumed past retention?)"
        )
    for v in versions:
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    if a.get("deletionVector"):
                        raise NotImplementedError(
                            "Delta deletion vectors are not supported by "
                            "this reader (rows would be over-returned)"
                        )
                    adds[a["path"]] = a
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
    if meta is None:
        raise ValueError(f"Delta log has no metaData action: {table_path}")
    return adds, meta


def read_delta(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table at ``version`` (default: latest) — the pinned
    snapshot a Delta reader contract guarantees: exactly the files the
    chosen commit considered live, regardless of later writes.

    Partitioned tables come back with their partition columns restored
    from the log's ``partitionValues`` and cast to the schema's types;
    an empty active set returns an empty frame with the table schema.
    """
    versions = delta_versions(table_path)
    ckpt = _latest_checkpoint(table_path, 1 << 60)
    if not versions and ckpt is None:
        raise FileNotFoundError(f"empty Delta log: {table_path}")
    if version is None:
        # a fully-cleaned log may hold ONLY a checkpoint — the table's
        # latest state is then the checkpoint's version
        target = max(versions) if versions else ckpt[0]
    else:
        target = version
    adds, meta = _replay(spark, table_path, target)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    if not adds:
        return spark.createDataFrame([], schema)
    if not part_cols:
        paths = [os.path.join(table_path, a["path"]) for a in adds.values()]
        return spark.read.schema(
            StructType([f for f in schema.fields])
        ).parquet(*paths)
    # group files by partition values; each group is one scan with its
    # partition literals attached (typed via the table schema)
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    types = {f.name: f.dataType for f in schema.fields}
    groups: dict[tuple, list[str]] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            os.path.join(table_path, a["path"])
        )
    frames = []
    # None-safe ordering: a null partition value must sort, not crash
    for key, paths in sorted(
        groups.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    ):
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            lit = (
                F.lit(None).cast(types[c])
                if raw is None
                else F.lit(raw).cast(types[c])
            )
            df = df.withColumn(c, lit)
        frames.append(df.select([f.name for f in schema.fields]))
    return reduce(DataFrame.unionByName, frames)


def delta_append(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    partition_by: list[str] | None = None,
    max_retries: int = 10,
) -> int:
    """APPEND ``df`` to a Delta table as one atomic commit; creates the
    table (protocol + metaData at version 0) when the log is absent.
    Returns the committed version.

    Commit protocol per the spec: data files land first (invisible
    until committed), then the ``<version>.json`` log entry is claimed
    with an EXCLUSIVE create (``open(..., 'x')`` — put-if-absent); a
    concurrent writer losing the race retries at the next version,
    which is safe for blind appends (no remove actions to rebase).
    Partitioned writes stage through ``partitionBy`` so partition
    columns live OUTSIDE the data files, Delta-style, and land in
    ``add.partitionValues``.

    Scope (honest): append-only — no update/merge/remove actions, no
    schema evolution against an existing table (schema must match),
    writerVersion 2 semantics without invariants/CDC.
    """
    import glob
    import shutil
    import tempfile
    import uuid

    part_cols = list(partition_by or [])
    log = _log_path(table_path)
    exists = os.path.isdir(log) and any(
        n.endswith(".json") for n in os.listdir(log)
    )
    if exists:
        _adds, meta = _replay(spark, table_path, max(delta_versions(table_path)))
        existing_schema = StructType.fromJson(json.loads(meta["schemaString"]))
        if [f.name for f in existing_schema.fields] != df.columns:
            raise ValueError(
                f"delta_append: schema mismatch — table has "
                f"{[f.name for f in existing_schema.fields]}, frame has "
                f"{df.columns}"
            )
        if list(meta.get("partitionColumns") or []) != part_cols:
            raise ValueError("delta_append: partition columns mismatch")
    os.makedirs(log, exist_ok=True)
    stage = tempfile.mkdtemp(prefix="_delta_stage_")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(stage)
    adds = []
    if part_cols:
        pattern = os.path.join(stage, *["*"] * len(part_cols), "part-*.parquet")
    else:
        pattern = os.path.join(stage, "part-*.parquet")
    for src in sorted(glob.glob(pattern)):
        rel_dir = os.path.relpath(os.path.dirname(src), stage)
        pv = {}
        if part_cols:
            for piece in rel_dir.split(os.sep):
                k, _, v = piece.partition("=")
                pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
        name = f"part-{uuid.uuid4().hex}.parquet"
        rel = os.path.join(rel_dir, name) if rel_dir != "." else name
        os.makedirs(
            os.path.dirname(os.path.join(table_path, rel)) or table_path,
            exist_ok=True,
        )
        shutil.move(src, os.path.join(table_path, rel))
        adds.append(
            {
                "add": {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": pv,
                    "size": os.path.getsize(os.path.join(table_path, rel)),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    actions = []
    if not exists:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": part_cols,
                    "configuration": {},
                    "createdTime": 0,
                }
            }
        )
    actions.extend(adds)
    version = (max(delta_versions(table_path)) + 1) if exists else 0
    for _ in range(max_retries):
        try:
            with open(os.path.join(log, f"{version:020d}.json"), "x") as f:
                for a in actions:
                    f.write(json.dumps(a) + "\n")
            return version
        except FileExistsError:
            if not exists:
                # lost the TABLE-CREATION race: the winner's
                # protocol/metaData govern now — validate against them
                # and strip ours, or a second metaData (new table id,
                # unchecked schema) would silently override the
                # winner's in every later replay
                exists = True
                _a, meta = _replay(
                    spark, table_path, max(delta_versions(table_path))
                )
                won_schema = StructType.fromJson(
                    json.loads(meta["schemaString"])
                )
                if [f.name for f in won_schema.fields] != df.columns:
                    raise ValueError(
                        "delta_append: schema mismatch with concurrently "
                        "created table"
                    )
                if list(meta.get("partitionColumns") or []) != part_cols:
                    raise ValueError(
                        "delta_append: partition columns mismatch with "
                        "concurrently created table"
                    )
                actions = adds
            version += 1  # blind appends rebase trivially
    raise RuntimeError(
        f"delta_append: could not claim a commit after {max_retries} retries"
    )


def read_delta_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC-lite: the rows APPENDED between ``from_version``
    (exclusive) and ``to_version`` (inclusive; default latest) — the
    union of every ``dataChange`` add action's file in that commit
    range. This is the incremental-consumption contract append-only
    pipelines need (feed new Delta commits into an incremental dedup
    screen or a matview fold without rescanning the table); commits
    containing REMOVE actions with dataChange=true (updates/deletes)
    raise — their net change is not expressible as a row set without
    a CDF, and silently returning the adds would over-count.

    Scale shape: reads ONLY the files the selected commits added —
    O(new data), never O(table)."""
    versions = delta_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"empty Delta log: {table_path}")
    hi = max(versions) if to_version is None else to_version
    want = [v for v in versions if from_version < v <= hi]
    expect = list(range(from_version + 1, hi + 1))
    if want != expect:
        raise ValueError(
            f"read_delta_changes: missing commits "
            f"{sorted(set(expect) - set(want))} (vacuumed past retention?)"
        )
    # schema/partitioning from the table state at `hi`
    _adds, meta = _replay(spark, table_path, hi)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = list(meta.get("partitionColumns") or [])
    log = _log_path(table_path)
    adds: dict[str, dict] = {}
    for v in want:
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action and action["add"].get("dataChange", True):
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    raise ValueError(
                        f"read_delta_changes: commit {v} removes data "
                        "(update/delete) — the change set is not "
                        "append-only"
                    )
    if not adds:
        return spark.createDataFrame([], schema)
    if not part_cols:
        paths = [os.path.join(table_path, a["path"]) for a in adds.values()]
        return spark.read.schema(schema).parquet(*paths)
    data_schema = StructType(
        [f for f in schema.fields if f.name not in part_cols]
    )
    types = {f.name: f.dataType for f in schema.fields}
    groups: dict[tuple, list[str]] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(os.path.join(table_path, a["path"]))
    frames = []
    for key, paths in sorted(
        groups.items(),
        key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
    ):
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, raw in zip(part_cols, key):
            lit = (
                F.lit(None).cast(types[c])
                if raw is None
                else F.lit(raw).cast(types[c])
            )
            df = df.withColumn(c, lit)
        frames.append(df.select([f.name for f in schema.fields]))
    return reduce(DataFrame.unionByName, frames)
