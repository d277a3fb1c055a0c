"""``iceberg_lite`` — a PySpark Python Data Source (SPARK-44076 API)
exposing the jar-free Iceberg metadata walk as a REGISTERED Spark
format, batch and STREAMING — the Iceberg twin of ``delta_lite``:

    spark.dataSource.register(IcebergLiteDataSource)
    spark.read.format("iceberg_lite").option("path", t).load()
    spark.readStream.format("iceberg_lite").option("path", t).load()

The streaming half TAILS the snapshot log: offsets ARE data sequence
numbers (the spec's monotone per-commit counter), each micro-batch
reads exactly the files the snapshots in ``(start, end]`` added, and
Spark's own offset checkpointing makes recovery exactly-once
(replaying a batch re-walks the same immutable snapshots —
deterministic by construction; the contract Iceberg's own incremental
append scan implements on the JVM).

Scale shape: ``latestOffset``/``partitions`` are planning-scale
metadata reads; data moves as one InputPartition per added file,
decoded executor-side by pyarrow into Arrow RecordBatches (zero
row-at-a-time Python). Iceberg data files carry EVERY column
(identity partition values included), so unlike ``delta_lite`` there
is no partition-literal restoration and no physical-name mapping —
columns absent from an old file (schema evolution) backfill NULL.

Honest gates, same as the batch changelog (`read_iceberg_changes`):
the stream is APPEND-ONLY — a snapshot in range that commits DELETE
files (position or equality) raises; REPLACE snapshots (compaction,
``summary.operation = "replace"``) are skipped. The batch reader
refuses tables whose current snapshot carries live delete files —
merge-on-read reconciliation needs the anti-joins only the DataFrame
path (`sources.iceberg.read_iceberg`) provides.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_TYPE_OBJS = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "bigint": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "date": DateType(),
    "timestamp": TimestampType(),
    "string": StringType(),
    "binary": BinaryType(),
}


def _struct_from_iceberg(fields: list[dict]) -> StructType:
    """Current-schema StructType WITHOUT a SparkSession (DataSource
    planning hooks cannot assume one): the flat primitive subset the
    pure reader supports, via the same mapping ``_spark_type`` uses."""
    import re

    from dataset_grouper_spark.sources.iceberg import _spark_type

    out = []
    for f in fields:
        ddl = _spark_type(f["type"])  # raises on nested/unknown
        t = _TYPE_OBJS.get(ddl)
        if t is None:
            m = re.fullmatch(r"decimal\((\d+),(\d+)\)", ddl)
            if m:
                t = DecimalType(int(m.group(1)), int(m.group(2)))
            else:
                raise ValueError(
                    f"iceberg_lite: unsupported column type {ddl!r}"
                )
        out.append(StructField(f["name"], t, True))
    return StructType(out)


class _FilePartition(InputPartition):
    def __init__(self, path, field_names, types):
        self.path = path
        self.field_names = field_names  # schema order
        self.types = types  # name -> pyspark DataType (picklable)


def _read_file_as_arrow(part):
    """Executor-side decode: one parquet file -> Arrow batches in
    schema column order; columns the file predates backfill NULL."""
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


def _table_state(path: str):
    """(meta, current schema dict, StructType) — shared planning read."""
    from dataset_grouper_spark.sources.iceberg import _load_metadata

    meta = _load_metadata(path)
    schemas = meta.get("schemas") or []
    schema = next(
        (
            s
            for s in schemas
            if s.get("schema-id") == meta.get("current-schema-id")
        ),
        schemas[-1] if schemas else None,
    )
    if schema is None:
        raise ValueError(f"iceberg_lite: no schema in {path}")
    return meta, schema, _struct_from_iceberg(schema["fields"])


def _partitions_for(paths, struct):
    field_names = [f.name for f in struct.fields]
    types = {f.name: f.dataType for f in struct.fields}
    return [_FilePartition(p, field_names, types) for p in paths]


class _IcebergLiteBatchReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self):
        from dataset_grouper_spark.sources.iceberg import _live_files

        meta, _schema, struct = _table_state(self.path)
        cur = meta.get("current-snapshot-id")
        if cur is None:
            return [None]
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == cur
        )
        data, delete_files, _rows, eq = _live_files(self.path, snap)
        # RuntimeError, not NotImplementedError: the DSv2 wrapper
        # treats NotImplementedError from partitions() as "no
        # partitioning support" and silently falls back
        if delete_files or eq:
            raise RuntimeError(
                "iceberg_lite batch read: table carries merge-on-read "
                "delete files — use sources.iceberg.read_iceberg (the "
                "DataFrame path applies the delete anti-joins)"
            )
        parts = _partitions_for([p for p, _s in data], struct)
        return parts or [None]

    def read(self, partition):
        if partition is None:
            return iter(())
        return _read_file_as_arrow(partition)


class _IcebergLiteStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, starting_sequence: int | None):
        self.path = path
        self.starting_sequence = starting_sequence

    def initialOffset(self):
        if self.starting_sequence is not None:
            return {"sequence": int(self.starting_sequence) - 1}
        return {"sequence": 0}

    def latestOffset(self):
        from dataset_grouper_spark.sources.iceberg import _load_metadata

        try:
            meta = _load_metadata(self.path)
        except FileNotFoundError:
            return {"sequence": 0}
        return {"sequence": int(meta.get("last-sequence-number") or 0)}

    def partitions(self, start, end):
        from dataset_grouper_spark.sources.iceberg import (
            _added_data_files,
            _load_metadata,
            _snapshots_by_sequence,
        )

        lo, hi = int(start["sequence"]), int(end["sequence"])
        if hi <= lo:
            return [None]
        meta = _load_metadata(self.path)
        snaps = _snapshots_by_sequence(meta)
        want = [
            s
            for s in snaps
            if lo < int(s.get("sequence-number") or 0) <= hi
        ]
        have = [int(s.get("sequence-number") or 0) for s in want]
        if have != list(range(lo + 1, hi + 1)):
            raise ValueError(
                f"iceberg_lite stream: sequence range ({lo}, {hi}] not "
                f"fully retained (have {have}; expired history? restart "
                "from a newer startingSequence)"
            )
        _m, _schema, struct = _table_state(self.path)
        paths = []
        for s in want:
            if (s.get("summary") or {}).get("operation") == "replace":
                continue  # compaction: no logical change
            paths.extend(
                _added_data_files(self.path, s, "iceberg_lite stream")
            )
        return _partitions_for(paths, struct) or [None]

    def read(self, partition):
        if partition is None:
            return iter(())
        return _read_file_as_arrow(partition)

    def commit(self, end):
        pass  # offsets live in Spark's own checkpoint


class IcebergLiteDataSource(DataSource):
    """``spark.dataSource.register(IcebergLiteDataSource)`` then
    ``.format("iceberg_lite").option("path", table_path)``. Options:
    ``path`` (required), ``startingSequence`` (stream only — first
    data sequence number to consume; default 1, i.e. the whole table
    then the tail)."""

    @classmethod
    def name(cls):
        return "iceberg_lite"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("iceberg_lite: option 'path' is required")
        return p

    def schema(self):
        _m, _schema, struct = _table_state(self._path())
        return struct

    def reader(self, schema):
        return _IcebergLiteBatchReader(self._path())

    def streamReader(self, schema):
        sv = self.options.get("startingSequence")
        return _IcebergLiteStreamReader(
            self._path(), int(sv) if sv is not None else None
        )
