"""Apache Iceberg table READER — metadata walk over the public spec,
no iceberg-spark runtime jar.

The Iceberg format (iceberg.apache.org/spec) is: a ``metadata/``
directory of ``*.metadata.json`` files (each listing snapshots and the
current snapshot id), each snapshot pointing at a MANIFEST LIST (an
Avro object container; decoded by our pure-stdlib ``sources.avro``),
each manifest list row pointing at a MANIFEST (Avro again) whose
entries carry ``status`` (0 existing / 1 added / 2 deleted) and a
``data_file`` struct with the parquet path. A snapshot's live file set
is every non-deleted entry across its manifests. Unlike Delta/Hive,
Iceberg keeps identity-partition source columns INSIDE the data
files, so no partition-value restoration is needed — live parquet
paths + the table schema are the whole read.

Because Avro containers are self-describing, the reader decodes
whatever manifest schema the files declare and consumes only the
spec-named fields — real tables' extra stats columns ride along
harmlessly.

Honest gates: v2 DELETE manifests (``content=1`` — position/equality
deletes) raise rather than over-returning rows; non-parquet data files
raise; nested Iceberg types beyond primitives/decimals raise at schema
mapping.

Scale shape: like the Delta reader, the metadata walk is the driver's
planning step (Avro manifests are KB-scale); data moves only through
``spark.read.parquet`` over the live files with full pushdown.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from dataset_grouper_spark.sources.avro import read_avro_file

_PRIM = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "string": "string",
    "uuid": "string",
    "binary": "binary",
}


def _spark_type(t) -> str:
    if isinstance(t, str):
        if t in _PRIM:
            return _PRIM[t]
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
        if m:
            return f"decimal({m.group(1)},{m.group(2)})"
        m = re.fullmatch(r"fixed\[\d+\]", t)
        if m:
            return "binary"
        raise ValueError(f"iceberg: unsupported type {t!r}")
    raise ValueError(
        f"iceberg: nested type {t.get('type')!r} not supported by this reader"
    )


def _localize(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://") :]
    return path


def _metadata_files(table_path: str) -> list[str]:
    mdir = os.path.join(table_path, "metadata")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(
            f"not an Iceberg table (no metadata/): {table_path}"
        )
    out = [
        os.path.join(mdir, n)
        for n in os.listdir(mdir)
        if n.endswith(".metadata.json")
    ]
    if not out:
        raise FileNotFoundError(f"no *.metadata.json under {mdir}")
    return sorted(out)


def _load_metadata(table_path: str) -> dict:
    """Latest table metadata: honor ``version-hint.text`` when present
    (the HadoopCatalog convention), else the lexically-last file."""
    mdir = os.path.join(table_path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.isfile(hint):
        v = open(hint).read().strip()
        cand = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.isfile(cand):
            return json.load(open(cand))
    return json.load(open(_metadata_files(table_path)[-1]))


def iceberg_snapshots(table_path: str) -> list[dict]:
    """(snapshot-id, timestamp, manifest-list) of every retained
    snapshot, oldest first."""
    meta = _load_metadata(table_path)
    snaps = meta.get("snapshots") or []
    return sorted(snaps, key=lambda s: s.get("timestamp-ms", 0))


def _partition_match(df: dict, partition_filter: dict) -> bool:
    """Identity-partition file pruning: keep the file unless its
    ``data_file.partition`` struct names a filtered field with a
    DIFFERENT value. Files without partition info (older writers,
    minimal manifests) are conservatively kept — pruning must never
    drop data it cannot prove excluded."""
    part = df.get("partition")
    if not isinstance(part, dict):
        return True
    for k, want in partition_filter.items():
        if k in part and part[k] != want:
            return False
    return True


def _live_files(
    table_path: str, snapshot: dict, partition_filter: dict | None = None
) -> list[str]:
    ml_path = _localize(snapshot["manifest-list"])
    if not os.path.isabs(ml_path):
        ml_path = os.path.join(table_path, ml_path)
    _schema, manifests = read_avro_file(ml_path)
    files: list[str] = []
    for m in manifests:
        if m.get("content", 0) == 1:
            raise NotImplementedError(
                "iceberg: delete manifests (position/equality deletes) "
                "are not supported — rows would be over-returned"
            )
        mp = _localize(m["manifest_path"])
        if not os.path.isabs(mp):
            mp = os.path.join(table_path, mp)
        _s, entries = read_avro_file(mp)
        for e in entries:
            if e.get("status", 0) == 2:  # DELETED
                continue
            df = e["data_file"]
            if partition_filter and not _partition_match(df, partition_filter):
                continue  # manifest-level file pruning: never scanned
            if df.get("content", 0) != 0:
                raise NotImplementedError(
                    "iceberg: non-data content in data_file"
                )
            fmt = (df.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"iceberg: file format {fmt} not supported"
                )
            p = _localize(df["file_path"])
            if not os.path.isabs(p):
                p = os.path.join(table_path, p)
            files.append(p)
    return files


def read_iceberg(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Read an Iceberg table at ``snapshot_id`` (default: current) —
    the pinned file set that snapshot's manifests declare live. Data
    files carry every column (identity partitions included), so the
    result is one parquet scan with the table schema.

    ``partition_filter`` ({column: value}, identity transforms) prunes
    FILES at the manifest level — the planning-step win Iceberg's
    metadata exists for: at 100 TB a partition-scoped read touches
    only matching files' footers, never the rest of the table.
    Pruning is conservative (files without partition metadata are
    kept) and composes with Spark's own row-group pruning; the same
    predicate should normally also be applied as a .filter() for
    exactness when partition metadata is partial."""
    meta = _load_metadata(table_path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots") or []}
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    if snapshot_id is None or snapshot_id not in snaps:
        raise ValueError(
            f"iceberg: snapshot {snapshot_id!r} not in table "
            f"(have {sorted(snaps)})"
        )
    schemas = meta.get("schemas") or (
        [meta["schema"]] if meta.get("schema") else []
    )
    # time travel must read with the SNAPSHOT's schema (schema
    # evolution otherwise silently nulls renamed/added columns in old
    # snapshots); fall back to the table's current schema when the
    # snapshot entry predates schema-id tracking
    want_id = snaps[snapshot_id].get("schema-id")
    if want_id is None:
        want_id = meta.get("current-schema-id")
    schema = next(
        (s for s in schemas if s.get("schema-id") == want_id), schemas[-1]
    )
    ddl = ", ".join(
        f"`{f['name']}` {_spark_type(f['type'])}" for f in schema["fields"]
    )
    files = _live_files(table_path, snaps[snapshot_id], partition_filter)
    if not files:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*files)


_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MLIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _iceberg_type(spark_type: str) -> str:
    m = {
        "bigint": "long", "long": "long", "int": "int", "integer": "int",
        "double": "double", "float": "float", "boolean": "boolean",
        "string": "string", "binary": "binary", "date": "date",
        "timestamp": "timestamp",
    }
    t = m.get(spark_type)
    if t is None:
        raise ValueError(
            f"iceberg_append: cannot map Spark type {spark_type!r}"
        )
    return t


def iceberg_append(spark: SparkSession, df: DataFrame, table_path: str) -> int:
    """APPEND ``df`` to an Iceberg table as one new snapshot; creates
    the table (v1 metadata) when absent. Returns the snapshot id.

    Per the spec's commit model: data files land first, then a NEW
    manifest (Avro) listing them, a NEW manifest list = previous
    snapshot's manifests + the new one, and a new ``v<N>.metadata.json``
    claimed with an exclusive create (put-if-absent on the version
    file — HadoopCatalog-style optimistic concurrency); the
    version-hint is updated last. Unpartitioned, append-only scope
    (schema must match an existing table)."""
    import glob
    import shutil
    import tempfile
    import uuid

    mdir = os.path.join(table_path, "metadata")
    exists = os.path.isdir(mdir) and any(
        n.endswith(".metadata.json") for n in os.listdir(mdir)
    )
    if exists:
        meta = _load_metadata(table_path)
        cur_schema = next(
            (
                s
                for s in meta.get("schemas") or []
                if s.get("schema-id") == meta.get("current-schema-id")
            ),
            None,
        )
        have = [f["name"] for f in (cur_schema or {}).get("fields", [])]
        if have != df.columns:
            raise ValueError(
                f"iceberg_append: schema mismatch — table has {have}, "
                f"frame has {df.columns}"
            )
    else:
        os.makedirs(mdir, exist_ok=True)
        meta = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid4()),
            "location": table_path,
            "current-snapshot-id": None,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": [
                        {
                            "id": i + 1,
                            "name": f.name,
                            "required": False,
                            "type": _iceberg_type(f.dataType.simpleString()),
                        }
                        for i, f in enumerate(df.schema.fields)
                    ],
                }
            ],
            "current-schema-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "snapshots": [],
        }
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    stage = tempfile.mkdtemp(prefix="_ice_stage_")
    df.write.mode("overwrite").parquet(stage)
    snap_id = (
        max((s["snapshot-id"] for s in meta["snapshots"]), default=0) + 1
    )
    entries = []
    for src in sorted(glob.glob(os.path.join(stage, "part-*.parquet"))):
        dst = os.path.join(
            table_path, "data", f"s{snap_id}-{uuid.uuid4().hex}.parquet"
        )
        shutil.move(src, dst)
        entries.append(
            {
                "status": 1,
                "snapshot_id": None,
                "data_file": {
                    "content": 0,
                    "file_path": dst,
                    "file_format": "PARQUET",
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(dst),
                },
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    from dataset_grouper_spark.sources.avro import write_avro_file

    mpath = os.path.join(mdir, f"m-{snap_id}-{uuid.uuid4().hex}.avro")
    write_avro_file(mpath, _MANIFEST_SCHEMA, entries)
    prev_manifests = []
    if meta.get("current-snapshot-id") is not None:
        cur = next(
            s
            for s in meta["snapshots"]
            if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        ml = _localize(cur["manifest-list"])
        if not os.path.isabs(ml):
            ml = os.path.join(table_path, ml)
        _s, prev = read_avro_file(ml)
        prev_manifests = [
            {k: m[k] for k in (f["name"] for f in _MLIST_SCHEMA["fields"])}
            for m in prev
        ]
    mlpath = os.path.join(mdir, f"snap-{snap_id}-{uuid.uuid4().hex}.avro")
    write_avro_file(
        mlpath,
        _MLIST_SCHEMA,
        prev_manifests
        + [
            {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    meta["snapshots"].append(
        {
            "snapshot-id": snap_id,
            "timestamp-ms": snap_id,  # deterministic, monotone
            "schema-id": meta.get("current-schema-id", 0),
            "manifest-list": mlpath,
        }
    )
    meta["current-snapshot-id"] = snap_id
    # claim the next metadata version exclusively (optimistic commit)
    versions = [
        int(n[1:].split(".")[0])
        for n in os.listdir(mdir)
        if n.endswith(".metadata.json")
        and n.startswith("v")
        and n[1:].split(".")[0].isdigit()
    ]
    v = max(versions, default=0) + 1
    while True:
        try:
            with open(
                os.path.join(mdir, f"v{v}.metadata.json"), "x"
            ) as f:
                json.dump(meta, f)
            break
        except FileExistsError:
            raise RuntimeError(
                "iceberg_append: lost the metadata-version race — "
                "re-run the append (snapshot state must be re-derived "
                "from the winner's metadata)"
            )
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write(str(v))
    return snap_id
