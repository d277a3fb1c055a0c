"""One-call pipeline façades — the reference's public entry points.

The reference exposes exactly two composed pipelines
(``tfds_pipelines.py:25-78`` tfds_to_tfrecords, ``:81-141``
tfds_group_counts): read a dataset, key every example, then either pack
each group into one SequenceExample written to sharded TFRecords, or
write a delimited text file of per-group statistics. These are the
first functions a migrating user looks for, so they exist here with
signature parity; the "dataset_builder + split" source becomes a
DataFrame (Spark's reader already covers every source/split), and the
``GetKeyFn`` becomes a keyer ``Column`` from :mod:`.keys`.

Both compose the existing operators — nothing here adds semantics:
encode (compat.tfexample) -> pack (operators.packing) -> shard write
(compat.tfrecord), and compute_group_counts -> format -> text write.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from dataset_grouper_spark import keys
from dataset_grouper_spark.operators import group_counts as gc
from dataset_grouper_spark.operators import packing


def _auto_shards(packed: DataFrame) -> int:
    """Beam's ``num_shards=0`` auto-sharding analogue: one shard per
    default-parallelism slot, capped by the number of groups (never
    emit a guaranteed-empty shard)."""
    sc = packed.sparkSession.sparkContext
    n_groups = packed.count()
    return max(1, min(n_groups, sc.defaultParallelism))


def serialize_examples(df: DataFrame, check_schema: bool = True) -> DataFrame:
    """Append ``_ex`` = serialized Example bytes for every row (the
    per-example serialize step, serialization.py:23-48) via an
    Arrow-batched pandas UDF. With ``check_schema`` (the reference's
    behavior), an example whose keys diverge from the DataFrame schema
    raises KeyError instead of silently encoding."""
    import pandas as pd

    from dataset_grouper_spark.compat.tfexample import (
        encode_example,
        encode_example_checked,
    )

    cols = list(df.columns)
    schema_keys = frozenset(cols)

    def _py(v):
        if isinstance(v, bytearray):
            return bytes(v)
        if hasattr(v, "item"):  # numpy scalar
            return v.item()
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            return [_py(x) for x in (v.tolist() if hasattr(v, "tolist") else v)]
        return v

    def _enc(pdf):
        out = []
        for row in pdf.to_dict("records"):
            feats = {k: _py(v) for k, v in row.items()}
            if check_schema:
                out.append(encode_example_checked(feats, schema_keys))
            else:
                out.append(encode_example(feats))
        return pd.Series(out, dtype=object)

    enc = pandas_udf(_enc, "binary")
    return df.withColumn("_ex", enc(F.struct(*cols)))


def tfds_to_tfrecords(
    df: DataFrame,
    file_path_prefix: str,
    key: Column,
    order_col: str | Column | None = None,
    file_name_suffix: str = "",
    num_shards: int = 0,
    limit: int = packing.BYTES_LIMIT,
) -> list[str]:
    """Partition a DataFrame into per-group SequenceExamples on sharded
    TFRecords — signature parity with tfds_to_tfrecords
    (tfds_pipelines.py:25-78): ``num_shards=0`` auto-shards, shards are
    named ``prefix-SSSSS-of-NNNNN[suffix]``, each record is one group's
    packed examples.

    Differences forced by the engine swap: the source is a DataFrame
    (not a tfds builder+split), the keyer is a Column (not GetKeyFn),
    and packing order is the deterministic ``order_col`` (default:
    first column) instead of Beam's arrival order — same cap rule,
    reproducible output (SURVEY §7).

    Returns the list of shard paths written.
    """
    from dataset_grouper_spark.compat import tfrecord

    if order_col is None:
        order_col = df.columns[0]
    ser = serialize_examples(df)
    packed = packing.pack_groups(
        ser, key, order_col, limit=limit, payload_col="_ex",
        size_cols=list(df.columns),
    )
    shards = num_shards or _auto_shards(packed)
    return tfrecord.write_grouped_tfrecords(
        packed,
        keys.GROUP_COL,
        "packed",
        file_path_prefix,
        num_shards=shards,
        file_name_suffix=file_name_suffix,
    )


def tfds_group_counts(
    df: DataFrame,
    file_path_prefix: str,
    key: Column,
    file_name_suffix: str = "",
    num_shards: int | None = None,
    delimiter: str = ",",
) -> str:
    """Write per-group ``group_id<d>num_examples<d>num_bytes<d>num_words``
    text lines with a header — signature parity with tfds_group_counts
    (tfds_pipelines.py:81-141, header at :126). ``num_shards=None``
    lets the engine auto-shard (Beam's unset behavior; here AQE
    coalescing decides). Returns the output directory."""
    counts = gc.compute_group_counts(df, key)
    gc.write_group_counts_csv(
        counts, file_path_prefix, delimiter=delimiter, num_shards=num_shards
    )
    return file_path_prefix


__all__ = ["tfds_to_tfrecords", "tfds_group_counts", "serialize_examples"]
