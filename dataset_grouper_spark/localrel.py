"""JVM-evaluable local relations from driver-side rows.

``spark.createDataFrame(list, schema)`` builds a PICKLED-ROW RDD that
``sc.parallelize`` splits into defaultParallelism slices; every
materialization of the frame — each broadcast build, each action that
references it — re-pays Python-worker round-trips to unpickle those
slices (measured r14: ~0.3-0.7 s per use at 32 slices, ~4 s when a
coalesce(1) serializes the slices into one task). The planning-scale
metadata frames the lakehouse layer broadcast-joins against scans
(file->bin maps, path maps, shard lists) were paying that cost once or
twice per lifecycle operation.

:func:`local_frame` ships the same rows as ARROW instead (the pandas
``createDataFrame`` path converts driver-side and lands JVM-side — no
Python worker at execution), preserving the declared schema. It falls
back to the classic path for empty input, schemas with nested/complex
fields, or any conversion error, so callers can use it as a drop-in
replacement wherever the schema is flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DataType, StructType

_SIMPLE_ATOMICS = {
    "string",
    "binary",
    "boolean",
    "byte",
    "short",
    "integer",
    "long",
    "float",
    "double",
    "date",
    "timestamp",
    "timestamp_ntz",
}


def _parse(spark: SparkSession, schema) -> StructType | None:
    if isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        try:
            from pyspark.sql.types import _parse_datatype_string

            parsed = _parse_datatype_string(schema)
            return parsed if isinstance(parsed, StructType) else None
        except Exception:
            return None
    return None


def local_frame(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` that evaluates JVM-side.

    ``rows`` is a list of tuples/Rows (positional against ``schema``);
    ``schema`` a DDL string or StructType of ATOMIC fields. Any case
    this fast path cannot prove safe (empty rows, nested fields,
    conversion surprise) falls back to the classic pickled path —
    behavior, not performance, is always identical.
    """
    struct = _parse(spark, schema)
    if rows and struct is not None and all(
        f.dataType.typeName() in _SIMPLE_ATOMICS for f in struct.fields
    ):
        try:
            import pandas as pd

            pdf = pd.DataFrame(
                [tuple(r) for r in rows],
                columns=[f.name for f in struct.fields],
                dtype=object,
            )
            return spark.createDataFrame(pdf, schema=struct)
        except Exception:
            pass  # fall through to the classic path
    return spark.createDataFrame(rows, schema)
