"""``hudi_lite`` — a PySpark Python Data Source (SPARK-44076 API)
exposing the jar-free Hudi CoW timeline walk as a REGISTERED Spark
format, batch and STREAMING — completing the trio next to
``delta_lite`` and ``iceberg_lite``:

    spark.dataSource.register(HudiLiteDataSource)
    spark.read.format("hudi_lite").option("path", t).load()
    spark.readStream.format("hudi_lite").option("path", t).load()

The streaming half TAILS the timeline: offsets ARE completed instant
times (Hudi's monotone commit timestamps), each micro-batch reads
exactly the base files the INSERT commits in ``(start, end]`` wrote
(paths straight from the commit's ``partitionToWriteStats``), and
Spark's own offset checkpointing makes recovery exactly-once.

Scale shape: ``latestOffset``/``partitions`` are planning-scale
timeline reads; data moves as one InputPartition per base file,
decoded executor-side by pyarrow into Arrow RecordBatches (zero
row-at-a-time Python). Hudi base files carry full rows (partition
columns AND the ``_hoodie_*`` meta columns — the meta columns are
dropped in the decode), so there is no partition-literal restoration;
columns absent from an old file backfill NULL. The table schema comes
from the newest live slice's parquet footer (Hudi keeps no schema in
the timeline markers this reader relies on).

Honest gates: the STREAM is APPEND-ONLY — an UPSERT commit in range
rewrites file slices (a logical update/delete) and raises;
``replacecommit`` instants (clustering — no logical change) are
skipped. The batch reader serves the same snapshot
``sources.hudi.read_hudi`` does. MERGE_ON_READ tables raise at
schema time.

Writes: ``df.write.format("hudi_lite")`` bulk-inserts (CoW INSERT
commit; ``mode("overwrite")`` commits a ``replacecommit`` replacing
every live file group — the spec's insert_overwrite_table, with full
time travel to pre-overwrite instants); ``writeStream`` commits each
micro-batch as one INSERT whose commit JSON carries
``extraMetadata {app-id, epoch=batchId}`` — a replayed batch sees an
epoch at or below the app's last committed one and no-ops with file
cleanup.
"""

from __future__ import annotations

import json
import os

from dataset_grouper_spark.compat import fs as _fs
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _table_schema(path: str) -> StructType:
    """User schema (meta columns dropped) from the newest live
    slice's parquet footer — no SparkSession needed."""
    from pyspark.sql.pandas.types import from_arrow_type

    import pyarrow.parquet as pq

    from dataset_grouper_spark.sources.hudi import (
        META_COLS,
        _table_props,
        hudi_file_slices,
    )

    ttype = _table_props(path).get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"hudi_lite: table type {ttype} not supported"
        )
    slices = hudi_file_slices(path)
    if not slices:
        raise ValueError(f"hudi_lite: no completed file slices in {path}")
    newest = max(slices, key=lambda s: s[2])[3]
    arrow = pq.read_schema(newest)
    from pyspark.sql.types import StructField

    fields = [
        StructField(n, from_arrow_type(arrow.field(n).type), True)
        for n in arrow.names
        if n not in META_COLS
    ]
    return StructType(fields)


class _FilePartition(InputPartition):
    def __init__(self, path, field_names, types):
        self.path = path
        self.field_names = field_names
        self.types = types  # name -> pyspark DataType (picklable)


def _read_file_as_arrow(part):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_type

    pf = pq.ParquetFile(part.path)
    have = set(pf.schema_arrow.names)
    data_cols = [n for n in part.field_names if n in have]
    for batch in pf.iter_batches(columns=data_cols):
        n_rows = batch.num_rows
        arrays = []
        for name in part.field_names:
            atype = to_arrow_type(part.types[name])
            if name in have:
                arrays.append(batch.column(data_cols.index(name)).cast(atype))
            else:
                arrays.append(pa.nulls(n_rows, type=atype))
        yield pa.RecordBatch.from_arrays(arrays, names=part.field_names)


def _partitions_for(paths, struct):
    field_names = [f.name for f in struct.fields]
    types = {f.name: f.dataType for f in struct.fields}
    return [_FilePartition(p, field_names, types) for p in paths]


class _HudiLiteBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        from dataset_grouper_spark.sources.hudi import hudi_file_slices

        struct = _table_schema(self.path)
        paths = [p for _pt, _f, _i, p in hudi_file_slices(self.path)]
        return _partitions_for(paths, struct) or [None]

    def read(self, partition):
        if partition is None:
            return iter(())
        return _read_file_as_arrow(partition)


class _HudiLiteStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, starting_instant: str | None):
        self.path = path
        self.starting_instant = starting_instant

    def initialOffset(self):
        return {"instant": self.starting_instant or "0"}

    def latestOffset(self):
        from dataset_grouper_spark.sources.hudi import _completed

        try:
            commits = _completed(self.path)
        except FileNotFoundError:
            return {"instant": "0"}
        return {"instant": max(commits) if commits else "0"}

    def partitions(self, start, end):
        from dataset_grouper_spark.sources.hudi import _completed

        lo, hi = str(start["instant"]), str(end["instant"])
        if hi <= lo:
            return [None]
        commits = _completed(self.path, as_of=hi)
        struct = _table_schema(self.path)
        paths = []
        for ts in sorted(commits):
            if ts <= lo:
                continue
            meta = commits[ts]
            if meta.get("__action") == "replacecommit":
                # only pure clustering (file reorganization, no logical
                # change) may be skipped. An INSERT_OVERWRITE replace-
                # commit — the only replacecommit this repo's writers
                # produce (mode('overwrite')) — both drops file groups
                # AND inserts rows; silently skipping it would lose its
                # data from the stream, so it raises like UPSERT does.
                if meta.get("operationType") == "INSERT_OVERWRITE_TABLE" or (
                    meta.get("partitionToWriteStats")
                ):
                    raise ValueError(
                        f"hudi_lite stream: instant {ts} is a "
                        f"{meta.get('operationType') or 'replace'} "
                        "replacecommit — overwrites rewrite history; "
                        "the streaming source is append-only (restart "
                        "the stream from the overwrite instant)"
                    )
                continue  # genuine clustering: no logical change
            if meta.get("operationType") not in (None, "INSERT"):
                raise ValueError(
                    f"hudi_lite stream: instant {ts} is "
                    f"{meta.get('operationType')} — slice rewrites are "
                    "updates/deletes; the streaming source is append-only"
                )
            for part_rel, stats in (
                meta.get("partitionToWriteStats") or {}
            ).items():
                for st in stats:
                    paths.append(os.path.join(self.path, st["path"]))
        return _partitions_for(paths, struct) or [None]

    def read(self, partition):
        if partition is None:
            return iter(())
        return _read_file_as_arrow(partition)

    def commit(self, end):
        pass  # offsets live in Spark's own checkpoint


class _HudiWriteMessage(WriterCommitMessage):
    def __init__(self, files: list[tuple] | None = None):
        # (abs_path, rel_path, partition_rel, nrows, size, token)
        self.files = files or []


def _hudi_stage_write(path, iterator, record_key, part_cols):
    """Executor-side staging: one base file per distinct partition
    tuple per task, meta columns synthesized in-Arrow, placed directly
    in the table. Files are named with an INVISIBLE placeholder
    instant (a 17-digit token starting '0' — lexically below every
    real instant, so never in the completed set): the driver's commit
    claims the real instant and RENAMES the staged files into it,
    which is what keeps a streaming sink correct across micro-batches
    (executor-side writer copies cannot learn a per-batch instant).
    Consequence, stated honestly: the row-level _hoodie_commit_time
    in files written through this path carries the staging token, not
    the final instant — the timeline/file name is authoritative (and
    is what every read path here resolves slices by)."""
    import uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    token = "0" + f"{uuid.uuid4().int % 10**16:016d}"
    instant = token
    files = []
    writers = {}
    for batch in iterator:
        tbl = pa.Table.from_batches([batch])
        # partition-path values via Arrow string cast — pandas would
        # coerce NULL-carrying int columns to float64 and the dir name
        # ('c=2.0') would diverge from the Spark-cast identity
        # hudi_upsert computes ('c=2')
        keys = (
            pa.table(
                [tbl.column(c).cast(pa.string()) for c in part_cols],
                names=list(part_cols),
            ).to_pandas()
            if part_cols
            else None
        )
        groups = (
            keys.groupby(part_cols, dropna=False, sort=False).indices.items()
            if part_cols
            else [((), range(tbl.num_rows))]
        )
        for tup, idx in groups:
            if part_cols and len(part_cols) == 1:
                tup = (tup,)
            part_rel = "/".join(
                f"{c}={v}" for c, v in zip(part_cols, tup)
            )
            if part_rel not in writers:
                fid = uuid.uuid4().hex[:20]
                name = f"{fid}_0-0-0_{instant}.parquet"
                rel = os.path.join(part_rel, name) if part_rel else name
                dst_dir = (
                    os.path.join(path, part_rel) if part_rel else path
                )
                _fs.makedirs(dst_dir)
                if part_rel:
                    pmeta = os.path.join(
                        dst_dir, ".hoodie_partition_metadata"
                    )
                    if not _fs.exists(pmeta):
                        _fs.write_text(
                            pmeta,
                            f"#partition metadata\ncommitTime="
                            f"{instant}\npartitionDepth="
                            f"{len(part_cols)}\n",
                        )
                writers[part_rel] = [None, os.path.join(path, rel), rel, 0, name]
            sliced = tbl.take(list(idx))
            n = sliced.num_rows
            key_arr = pc.cast(sliced.column(record_key), pa.string())
            meta_arrays = [
                pa.array([instant] * n),
                pa.array([f"{instant}_0"] * n),
                key_arr,
                pa.array([part_rel] * n),
                pa.array([writers[part_rel][4]] * n),
            ]
            meta_names = [
                "_hoodie_commit_time",
                "_hoodie_commit_seqno",
                "_hoodie_record_key",
                "_hoodie_partition_path",
                "_hoodie_file_name",
            ]
            full = pa.table(
                meta_arrays + [sliced.column(c) for c in sliced.column_names],
                names=meta_names + list(sliced.column_names),
            )
            if writers[part_rel][0] is None:
                writers[part_rel][0] = pq.ParquetWriter(
                    _fs.open_write(writers[part_rel][1]), full.schema
                )
            writers[part_rel][0].write_table(full)
            writers[part_rel][3] += n
    for part_rel, (w, dst, rel, nrows, _name) in writers.items():
        if w is None:
            continue
        w.close()
        files.append(
            (dst, rel, part_rel, nrows, _fs.file_size(dst), token)
        )
    return _HudiWriteMessage(files)


def _finalize_files(path, messages, instant):
    """Rename every staged file's placeholder token to the claimed
    ``instant`` (driver-local renames, O(files)) and return the
    partitionToWriteStats for the commit body."""
    from dataset_grouper_spark.sources.hudi import _BASE_RE

    stats: dict[str, list[dict]] = {}
    for m in messages:
        if m is None:
            continue
        for dst, rel, part_rel, nrows, size, token in m.files:
            new_rel = rel.replace(token, instant)
            _fs.move(dst, os.path.join(path, new_rel))
            fid = _BASE_RE.match(os.path.basename(new_rel)).group("fid")
            stats.setdefault(part_rel, []).append(
                {
                    "fileId": fid,
                    "path": new_rel,
                    "numWrites": nrows,
                    "fileSizeInBytes": size,
                }
            )
    return stats


class _HudiLiteArrowWriter(DataSourceArrowWriter):
    def __init__(
        self,
        path: str,
        overwrite: bool,
        schema: StructType,
        record_key: str,
        part_cols: list[str],
    ):
        self.path = os.path.abspath(path)
        self.overwrite = overwrite
        self.schema = schema
        self.record_key = record_key
        self.part_cols = list(part_cols)
        if record_key not in schema.names:
            raise ValueError(
                f"hudi_lite write: recordKey {record_key!r} not in frame"
            )
        missing = [c for c in self.part_cols if c not in schema.names]
        if missing:
            raise ValueError(
                f"hudi_lite write: partition columns {missing} not in frame"
            )

    def write(self, iterator):
        return _hudi_stage_write(
            self.path, iterator, self.record_key, self.part_cols
        )

    def _cleanup(self, messages):
        for m in messages:
            if m is None:
                continue
            for dst, _rel, _p, _n, _s, _t in m.files:
                try:
                    _fs.remove(dst)
                except (OSError, FileNotFoundError):
                    pass

    def abort(self, messages):
        self._cleanup(messages)

    def commit(self, messages, extra_meta=None):
        from dataset_grouper_spark.sources.hudi import (
            _commit,
            _hoodie_path,
            _table_props,
            _write_properties,
            hudi_file_slices,
        )

        _fs.makedirs(self.path)
        existed = _fs.exists(
            os.path.join(_hoodie_path(self.path), "hoodie.properties")
        )
        if existed:
            props = _table_props(self.path)
            want = props.get("hoodie.table.recordkey.fields")
            if want and want != self.record_key:
                self._cleanup(messages)
                raise ValueError(
                    f"hudi_lite write: recordKey mismatch — table has "
                    f"{want!r}"
                )
            have_parts = (
                props.get("hoodie.table.partition.fields", "").split(",")
                if props.get("hoodie.table.partition.fields")
                else []
            )
            if have_parts != self.part_cols:
                self._cleanup(messages)
                raise ValueError(
                    f"hudi_lite write: partition fields mismatch — table "
                    f"has {have_parts}, write declared {self.part_cols}"
                )
        _write_properties(self.path, self.record_key, self.part_cols)
        from dataset_grouper_spark.sources.hudi import _next_instant

        instant = _next_instant(self.path)
        stats = _finalize_files(self.path, messages, instant)
        try:
            if self.overwrite and existed:
                # insert_overwrite_table: one replacecommit replacing
                # every live file group, new files in the same instant
                replaced: dict[str, list[str]] = {}
                for part, fid, _i, _p in hudi_file_slices(self.path):
                    replaced.setdefault(part, []).append(fid)
                hp = _hoodie_path(self.path)
                for suffix in (
                    "replacecommit.requested",
                    "replacecommit.inflight",
                ):
                    _fs.write_text(
                        os.path.join(hp, f"{instant}.{suffix}"), "{}"
                    )
                body = {
                    "partitionToWriteStats": stats,
                    "partitionToReplaceFileIds": replaced,
                    "operationType": "INSERT_OVERWRITE_TABLE",
                }
                if extra_meta:
                    body["extraMetadata"] = extra_meta
                with _fs.open_create(
                    os.path.join(hp, f"{instant}.replacecommit")
                ) as f:
                    f.write(json.dumps(body).encode())
            else:
                hp = _hoodie_path(self.path)
                for suffix in ("commit.requested", "commit.inflight"):
                    _fs.write_text(
                        os.path.join(hp, f"{instant}.{suffix}"), "{}"
                    )
                body = {
                    "partitionToWriteStats": stats,
                    "operationType": "INSERT",
                }
                if extra_meta:
                    body["extraMetadata"] = extra_meta
                with _fs.open_create(
                    os.path.join(hp, f"{instant}.commit")
                ) as f:
                    f.write(json.dumps(body).encode())
        except FileExistsError:
            # a racer claimed this instant: our files were already
            # RENAMED into it, and files carrying a completed instant
            # are readable — remove the finalized paths, not the stale
            # staging names
            for flist in stats.values():
                for st in flist:
                    try:
                        _fs.remove(os.path.join(self.path, st["path"]))
                    except (OSError, FileNotFoundError):
                        pass
            raise RuntimeError(
                f"hudi_lite write: lost the commit race at instant "
                f"{instant} — re-run the write"
            )


class _HudiLiteStreamArrowWriter(_HudiLiteArrowWriter, DataSourceStreamArrowWriter):
    """Streaming sink: each micro-batch is one INSERT commit whose
    ``extraMetadata`` carries ``{app-id, epoch=batchId}`` — a replayed
    batch (epoch <= the app's last committed) no-ops with cleanup."""

    def __init__(self, path, schema, record_key, part_cols, app_id):
        super().__init__(path, False, schema, record_key, part_cols)
        self.app_id = app_id

    def _last_epoch(self):
        from dataset_grouper_spark.sources.hudi import _completed

        try:
            commits = _completed(self.path)
        except FileNotFoundError:
            return None
        best = None
        for meta in commits.values():
            em = meta.get("extraMetadata") or {}
            if em.get("app-id") == self.app_id:
                e = int(em.get("epoch", -1))
                best = e if best is None else max(best, e)
        return best

    def commit(self, messages, batchId):
        last = self._last_epoch()
        if last is not None and batchId <= last:
            self._cleanup(messages)  # replayed epoch: no-op
            return
        # the real instant is claimed (and staged files renamed into
        # it) inside the base commit — fresh per micro-batch
        super().commit(
            messages,
            extra_meta={"app-id": self.app_id, "epoch": int(batchId)},
        )

    def abort(self, messages, batchId):
        self._cleanup(messages)


class HudiLiteDataSource(DataSource):
    """``spark.dataSource.register(HudiLiteDataSource)`` then
    ``.format("hudi_lite").option("path", table_path)``. Options:
    ``path`` (required), ``recordKey`` (write; default the table's, or
    the first column on creation), ``partitionBy`` (write, new tables),
    ``startingInstant`` (stream read), ``epochAppId`` (stream write)."""

    @classmethod
    def name(cls):
        return "hudi_lite"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("hudi_lite: option 'path' is required")
        return p

    def schema(self):
        return _table_schema(self._path())

    def reader(self, schema):
        return _HudiLiteBatchReader(self._path())

    def streamReader(self, schema):
        return _HudiLiteStreamReader(
            self._path(), self.options.get("startingInstant")
        )

    def _write_conf(self, schema):
        from dataset_grouper_spark.sources.hudi import _table_props

        opt_key = self.options.get("recordKey")
        opt_parts = self.options.get("partitionBy")
        declared = (
            [c.strip() for c in opt_parts.split(",") if c.strip()]
            if opt_parts
            else []
        )
        try:
            props = _table_props(self._path())
        except (FileNotFoundError, OSError):
            return opt_key or schema.names[0], declared
        table_key = props.get("hoodie.table.recordkey.fields")
        if table_key and opt_key and opt_key != table_key:
            # same contract as the partitionBy check below: a caller
            # who thinks they changed the key must hear otherwise
            raise ValueError(
                f"hudi_lite write: recordKey option {opt_key!r} "
                f"contradicts the table's record key {table_key!r}"
            )
        key = table_key or opt_key
        table_parts = (
            props.get("hoodie.table.partition.fields", "").split(",")
            if props.get("hoodie.table.partition.fields")
            else []
        )
        if declared and declared != table_parts:
            raise ValueError(
                f"hudi_lite write: partitionBy option {declared} "
                f"contradicts the table's partition fields {table_parts}"
            )
        return key, table_parts

    def writer(self, schema, overwrite):
        key, parts = self._write_conf(schema)
        return _HudiLiteArrowWriter(self._path(), overwrite, schema, key, parts)

    def streamWriter(self, schema, overwrite):
        key, parts = self._write_conf(schema)
        app = self.options.get("epochAppId") or "hudi_lite_stream"
        return _HudiLiteStreamArrowWriter(
            self._path(), schema, key, parts, app
        )
