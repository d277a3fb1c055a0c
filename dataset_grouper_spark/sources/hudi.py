"""Apache Hudi COPY-ON-WRITE tables — pure timeline walk, no Hudi jar.

Completes the lakehouse trio next to ``sources.delta`` and
``sources.iceberg``: the third major open table format a training-data
pipeline meets in the wild. Everything here derives from the PUBLIC
Hudi storage spec (timeline + file-group layout):

- ``.hoodie/`` holds the TIMELINE: one ``<instantTime>.commit`` JSON
  per completed write (plus ``.requested`` / ``.inflight`` markers for
  the in-progress states, and ``hoodie.properties`` for table config).
  Only COMPLETED instants are readable state.
- Data lives in base parquet files named
  ``<fileId>_<writeToken>_<instantTime>.parquet`` inside (optionally
  hive-style partitioned) directories. A FILE GROUP is all files
  sharing a fileId; each write that touches a group lays a new FILE
  SLICE (a newer base file, same fileId). Snapshot read = for every
  group, the latest completed slice at or before the as-of instant —
  which is exactly how Hudi gets time travel for free.
- Copy-on-write UPSERT rewrites only the file groups containing a
  matched record key (new slice, same fileId); inserts open new file
  groups. Every row carries the five ``_hoodie_*`` meta columns in
  the parquet itself (dropped on read by default).
- ``replacecommit`` instants (clustering / insert_overwrite) list the
  file groups they logically replace in ``partitionToReplaceFileIds``;
  reads at or past that instant exclude them.

Scale: planning is a driver-side timeline walk + file listing bounded
by file count (the same planning-scale budget as the Delta log and
Iceberg manifest walks); data moves only through ``spark.read.parquet``
(full pushdown/pruning). Upsert cost is O(touched file groups), never
O(table) — the CoW economics the Delta merge path already proves.

Honest gates: COPY_ON_WRITE only (MERGE_ON_READ log files are Avro
block streams — use the Delta/Iceberg MoR paths in this repo for
merge-on-read semantics); instant times are a monotonic counter in
the Hudi timestamp shape, not wall clock (deterministic replays).
"""

from __future__ import annotations

import glob
import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.compat import fs as _fs

HOODIE_DIR = ".hoodie"
META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]
_BASE_RE = re.compile(
    r"^(?P<fid>[^_]+)_(?P<token>[^_]+)_(?P<instant>\d+)\.parquet$"
)
_FIRST_INSTANT = 20240101000000000  # yyyyMMddHHmmssSSS shape, counter


def _hoodie_path(table_path: str) -> str:
    return os.path.join(table_path, HOODIE_DIR)


def hudi_timeline(table_path: str) -> list[tuple[str, str, str]]:
    """Every timeline instant as (instantTime, action, state) with
    state in requested/inflight/completed — the DESCRIBE-TIMELINE
    introspection."""
    hp = _hoodie_path(table_path)
    if not _fs.is_dir(hp):
        raise FileNotFoundError(f"not a Hudi table (no .hoodie): {table_path}")
    out = []
    for name in sorted(_fs.listdir(hp)):
        if name == "hoodie.properties" or name.startswith("."):
            continue
        parts = name.split(".")
        if len(parts) == 2:  # <ts>.commit -> completed
            out.append((parts[0], parts[1], "completed"))
        elif len(parts) == 3 and parts[2] in ("requested", "inflight"):
            out.append((parts[0], parts[1], parts[2]))
    return out


def _completed(table_path: str, as_of: str | None = None) -> dict[str, dict]:
    """instantTime -> commit JSON for completed commit/replacecommit
    instants at or before ``as_of``."""
    hp = _hoodie_path(table_path)
    out: dict[str, dict] = {}
    for ts, action, state in hudi_timeline(table_path):
        if state != "completed" or action not in (
            "commit",
            "replacecommit",
        ):
            continue
        if as_of is not None and ts > str(as_of):
            continue
        meta = json.loads(_fs.read_text(os.path.join(hp, f"{ts}.{action}")))
        meta["__action"] = action
        out[ts] = meta
    return out


def _table_props(table_path: str) -> dict[str, str]:
    props = {}
    text = _fs.read_text(
        os.path.join(_hoodie_path(table_path), "hoodie.properties")
    )
    for line in text.splitlines():
        line = line.strip()
        if line and not line.startswith("#") and "=" in line:
            k, _, v = line.partition("=")
            props[k] = v
    return props


def _next_instant(table_path: str) -> str:
    hp = _hoodie_path(table_path)
    best = _FIRST_INSTANT - 1
    if _fs.is_dir(hp):
        for ts, _a, _s in hudi_timeline(table_path):
            best = max(best, int(ts))
    return str(best + 1)


def _base_files(table_path: str) -> list[tuple[str, str, str, str]]:
    """(partition_rel, fileId, instantTime, abs_path) for every base
    parquet under the table (any state — filtered by the caller
    against the completed timeline)."""
    out = []
    for rel in _fs.walk_files(table_path):
        if rel.split("/")[0] == HOODIE_DIR or not rel.endswith(".parquet"):
            continue
        m = _BASE_RE.match(rel.rsplit("/", 1)[-1])
        if not m:
            continue
        part = rel.rsplit("/", 1)[0] if "/" in rel else ""
        out.append(
            (
                part,
                m.group("fid"),
                m.group("instant"),
                os.path.join(table_path, rel),
            )
        )
    return out


def hudi_file_slices(
    table_path: str, as_of: str | None = None
) -> list[tuple[str, str, str, str]]:
    """The LIVE file slice per file group at ``as_of`` (default: the
    latest completed instant): (partition, fileId, instant, path).
    Uncommitted/newer slices are invisible; groups replaced by a
    completed ``replacecommit`` at or before ``as_of`` are excluded."""
    commits = _completed(table_path, as_of)
    if not commits:
        return []
    replaced: set[tuple[str, str]] = set()
    for _ts, meta in commits.items():
        if meta.get("__action") == "replacecommit":
            for part, fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    replaced.add((part, fid))
    best: dict[tuple[str, str], tuple[str, str]] = {}
    for part, fid, instant, path in _base_files(table_path):
        if instant not in commits or (part, fid) in replaced:
            continue
        cur = best.get((part, fid))
        if cur is None or instant > cur[0]:
            best[(part, fid)] = (instant, path)
    return sorted(
        (part, fid, instant, path)
        for (part, fid), (instant, path) in best.items()
    )


def read_hudi(
    spark: SparkSession,
    table_path: str,
    as_of: str | None = None,
    keep_meta: bool = False,
) -> DataFrame:
    """Snapshot read of a Hudi CoW table, optionally TIME-TRAVELED to
    the completed instant ``as_of``. Base files carry every user
    column (partition columns included — Hudi writes full rows), so
    the result is one parquet scan; ``keep_meta`` keeps the five
    ``_hoodie_*`` columns instead of dropping them."""
    props = _table_props(table_path)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"read_hudi: table type {ttype} not supported — MERGE_ON_READ "
            "log compaction is out of scope (use this repo's Delta/Iceberg "
            "merge-on-read paths)"
        )
    slices = hudi_file_slices(table_path, as_of)
    paths = [p for _part, _fid, _i, p in slices]
    if not paths:
        raise ValueError(
            f"read_hudi: no completed file slices at as_of={as_of!r}"
        )
    df = spark.read.parquet(*paths)
    if not keep_meta:
        df = df.drop(*META_COLS)
    return df


def _write_properties(table_path: str, record_key: str, partition_by):
    hp = _hoodie_path(table_path)
    _fs.makedirs(hp)
    dst = os.path.join(hp, "hoodie.properties")
    if _fs.exists(dst):
        return
    lines = [
        "hoodie.table.name=" + os.path.basename(table_path.rstrip("/")),
        "hoodie.table.type=COPY_ON_WRITE",
        "hoodie.table.version=6",
        "hoodie.table.recordkey.fields=" + record_key,
        "hoodie.datasource.write.hive_style_partitioning=true",
    ]
    if partition_by:
        lines.append(
            "hoodie.table.partition.fields=" + ",".join(partition_by)
        )
    _fs.write_text(dst, "\n".join(lines) + "\n")


def _with_meta(
    df: DataFrame, record_key: str, part_cols: list[str], instant: str
) -> DataFrame:
    part_path = (
        F.concat_ws(
            "/",
            *[
                F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
                for c in part_cols
            ],
        )
        if part_cols
        else F.lit("")
    )
    return df.select(
        F.lit(instant).alias("_hoodie_commit_time"),
        F.concat(F.lit(instant), F.lit("_0")).alias("_hoodie_commit_seqno"),
        F.col(record_key).cast("string").alias("_hoodie_record_key"),
        part_path.alias("_hoodie_partition_path"),
        F.lit("").alias("_hoodie_file_name"),  # filled at placement
        *df.columns,
    )


def _stage_and_place(
    df_meta: DataFrame,
    table_path: str,
    part_cols: list[str],
    instant: str,
    fid_for_dir=None,
) -> dict[str, list[dict]]:
    """Stage ``df_meta`` (meta columns attached) through partitionBy
    and move each staged file into the table as a base file. Returns
    partitionToWriteStats. ``fid_for_dir`` maps a partition rel-dir to
    a FIXED fileId (rewrites keep their file group); new groups get
    fresh ids."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    stage = tempfile.mkdtemp(prefix="_hudi_stage_")
    # Hudi data files carry FULL rows (partition columns included) —
    # route the directory layout through helper copies so partitionBy
    # does not strip the real columns from the files
    helpers = {f"__hp_{c}": F.col(c).cast("string") for c in part_cols}
    writer = df_meta.withColumns(helpers).write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*helpers.keys())
    writer.parquet(stage)
    pattern = (
        os.path.join(stage, *["*"] * len(part_cols), "part-*.parquet")
        if part_cols
        else os.path.join(stage, "part-*.parquet")
    )
    stats: dict[str, list[dict]] = {}
    for src in sorted(glob.glob(pattern)):
        rel_dir = os.path.relpath(os.path.dirname(src), stage)
        rel_dir = "" if rel_dir == "." else rel_dir.replace(os.sep, "/")
        rel_dir = rel_dir.replace("__hp_", "")
        fid = None
        if fid_for_dir is not None:
            fid = fid_for_dir(rel_dir)
        if fid is None:
            fid = uuid.uuid4().hex[:20]
        name = f"{fid}_0-0-0_{instant}.parquet"
        dst_dir = os.path.join(table_path, rel_dir) if rel_dir else table_path
        _fs.makedirs(dst_dir)
        # partition metadata marker, Hudi layout fidelity
        pmeta = os.path.join(dst_dir, ".hoodie_partition_metadata")
        if rel_dir and not _fs.exists(pmeta):
            _fs.write_text(
                pmeta,
                f"#partition metadata\ncommitTime={instant}\n"
                f"partitionDepth={len(part_cols)}\n",
            )
        dst = os.path.join(dst_dir, name)
        # stat the LOCAL staged file before the (possibly remote) move
        nrows = pq.ParquetFile(src).metadata.num_rows
        nbytes = os.path.getsize(src)
        _fs.move(src, dst)
        stats.setdefault(rel_dir, []).append(
            {
                "fileId": fid,
                "path": os.path.join(rel_dir, name) if rel_dir else name,
                "numWrites": nrows,
                "fileSizeInBytes": nbytes,
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    return stats


def _commit(
    table_path: str, instant: str, operation: str, stats: dict
) -> str:
    hp = _hoodie_path(table_path)
    # requested -> inflight -> completed, the timeline's three states
    for suffix in ("commit.requested", "commit.inflight"):
        _fs.write_text(os.path.join(hp, f"{instant}.{suffix}"), "{}")
    body = {
        "partitionToWriteStats": stats,
        "operationType": operation,
    }
    # completed marker is the atomic claim: exclusive create. Losing
    # the race means ANOTHER writer completed this instant — our
    # already-placed base files carry the same instant time and would
    # be attributed to the winner's commit on every later read, so
    # delete them before surfacing the conflict (mirrors the
    # hudi_lite streaming writer's abort cleanup).
    try:
        with _fs.open_create(os.path.join(hp, f"{instant}.commit")) as f:
            f.write(json.dumps(body).encode())
    except FileExistsError:
        for wstats in stats.values():
            for w in wstats:
                try:
                    _fs.remove(os.path.join(table_path, w["path"]))
                except FileNotFoundError:
                    pass
        raise RuntimeError(
            f"hudi: lost the commit race at instant {instant} — placed "
            "files were removed; re-run against the new table state"
        )
    return instant


def hudi_insert(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    record_key: str,
    partition_by: list[str] | None = None,
) -> str:
    """INSERT (bulk) into a Hudi CoW table, creating it (timeline +
    hoodie.properties) when absent. New rows open NEW file groups;
    existing groups are untouched — use :func:`hudi_upsert` for
    update semantics. Returns the completed instant time."""
    part_cols = list(partition_by or [])
    if record_key not in df.columns:
        raise ValueError(f"hudi_insert: record key {record_key!r} not in frame")
    if _fs.is_dir(_hoodie_path(table_path)):
        props = _table_props(table_path)
        want = props.get("hoodie.table.recordkey.fields")
        if want and want != record_key:
            raise ValueError(
                f"hudi_insert: record key mismatch — table has {want!r}"
            )
        have_parts = (
            props.get("hoodie.table.partition.fields", "").split(",")
            if props.get("hoodie.table.partition.fields")
            else []
        )
        if have_parts != part_cols:
            raise ValueError(
                f"hudi_insert: partition fields mismatch — table has "
                f"{have_parts}, call passed {part_cols}"
            )
    _fs.makedirs(table_path)
    _write_properties(table_path, record_key, part_cols)
    instant = _next_instant(table_path)
    stats = _stage_and_place(
        _with_meta(df, record_key, part_cols, instant),
        table_path,
        part_cols,
        instant,
    )
    return _commit(table_path, instant, "INSERT", stats)


def _part_path_col(part_cols: list[str]):
    if not part_cols:
        return F.lit("")
    return F.concat_ws(
        "/",
        *[
            F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
            for c in part_cols
        ],
    )


def hudi_upsert(
    spark: SparkSession, df: DataFrame, table_path: str
) -> str:
    """Copy-on-write UPSERT: rows of ``df`` REPLACE current rows
    sharing their (record key, partition) identity — Hudi's default
    NON-GLOBAL index semantics, where the same key in a different
    partition is a different record — and the rest INSERT into new
    file groups. Only file groups containing a matched identity are
    rewritten; each gets ONE new slice under its EXISTING fileId, so
    time travel to any earlier instant still sees the old slices.
    O(touched groups), never O(table). ``df`` must be identity-unique
    (enforced with one cheap count, fails loudly otherwise)."""
    props = _table_props(table_path)
    record_key = props["hoodie.table.recordkey.fields"]
    part_cols = (
        props.get("hoodie.table.partition.fields", "").split(",")
        if props.get("hoodie.table.partition.fields")
        else []
    )
    if record_key not in df.columns:
        raise ValueError(f"hudi_upsert: record key {record_key!r} not in frame")
    user_cols = list(df.columns)
    tagged = df.withColumns(
        {
            "__k": F.col(record_key).cast("string"),
            "__p": _part_path_col(part_cols),
        }
    )
    if (
        tagged.groupBy("__k", "__p")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
        > 0
    ):
        raise ValueError("hudi_upsert: source has duplicate identities")
    slices = hudi_file_slices(table_path)
    by_group: dict[tuple[str, str], list[str]] = {}
    for part, fid, _i, p in slices:
        by_group.setdefault((part, fid), []).append(p)
    instant = _next_instant(table_path)
    stats: dict[str, list[dict]] = {}
    if not by_group:
        # no completed file slices (fresh table, or the first insert
        # lost its commit): nothing can match, the whole batch inserts
        stats = _stage_and_place(
            _with_meta(df, record_key, part_cols, instant),
            table_path,
            part_cols,
            instant,
        )
        return _commit(table_path, instant, "UPSERT", stats)
    # touched groups: one planning-scale pass — which slices hold a
    # matched (key, partition) identity (the same O(touched files)
    # collect budget as delta_merge's probe)
    current = spark.read.parquet(*[p for ps in by_group.values() for p in ps])
    idents = tagged.select("__k", "__p").distinct()
    touched_parts = {
        (r["_hoodie_partition_path"], r["__f"])
        for r in current.withColumn(
            "__f",
            F.element_at(
                F.split(
                    F.regexp_replace(
                        F.col("_metadata.file_path"),
                        r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/+",
                        "/",
                    ),
                    "/",
                ),
                -1,
            ),
        )
        .join(
            idents,
            (F.col("_hoodie_record_key") == idents["__k"])
            & (F.col("_hoodie_partition_path") == idents["__p"]),
            "left_semi",
        )
        .select("_hoodie_partition_path", "__f")
        .distinct()
        .collect()
    }
    touched_groups = {
        (tp, _BASE_RE.match(tf).group("fid")) for tp, tf in touched_parts
    }
    # rewrite each touched group separately so the new slice keeps its
    # fileId (per-group single-partition write; touched-group count is
    # planning-scale)
    for (part, fid), gpaths in sorted(by_group.items()):
        if (part, fid) not in touched_groups:
            continue
        gold = (
            spark.read.parquet(*gpaths)
            .select(
                *user_cols,
                F.col("_hoodie_record_key").alias("__k"),
                F.col("_hoodie_partition_path").alias("__p"),
            )
            .join(idents, ["__k", "__p"], "left_anti")
            .select(*user_cols)
        )
        gkeys = (
            spark.read.parquet(*gpaths)
            .select(
                F.col("_hoodie_record_key").alias("__k"),
                F.col("_hoodie_partition_path").alias("__p"),
            )
            .distinct()
        )
        upd = tagged.join(gkeys, ["__k", "__p"], "left_semi").select(
            *user_cols
        )
        merged = gold.unionByName(upd).coalesce(1)
        gstats = _stage_and_place(
            _with_meta(merged, record_key, part_cols, instant),
            table_path,
            part_cols,
            instant,
            fid_for_dir=lambda _d, fid=fid: fid,
        )
        for k, v in gstats.items():
            stats.setdefault(k, []).extend(v)
    # inserts: identities matching NO current record open new groups
    cur_idents = current.select(
        F.col("_hoodie_record_key").alias("__k"),
        F.col("_hoodie_partition_path").alias("__p"),
    ).distinct()
    inserts = tagged.join(cur_idents, ["__k", "__p"], "left_anti").select(
        *user_cols
    )
    if inserts.limit(1).count() > 0:
        istats = _stage_and_place(
            _with_meta(inserts, record_key, part_cols, instant),
            table_path,
            part_cols,
            instant,
        )
        for k, v in istats.items():
            stats.setdefault(k, []).extend(v)
    return _commit(table_path, instant, "UPSERT", stats)
