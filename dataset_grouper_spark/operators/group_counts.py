"""Group statistics — the reference's ``compute_group_counts`` pipeline.

Reference shape (beam_transforms.py:112-131): KeyExamples -> per-example
GroupCount(1, num_bytes, num_words) map (count_utils.py:61-65) -> raw
GroupByKey -> per-key elementwise sum DoFn (count_utils.py:29-47) ->
format line. Note the reference shuffles EVERY per-example triple (no
combiner lifting on this path — SURVEY §3.2).

Spark shape: one ``groupBy(group_id).agg(count, sum, sum)`` over
Catalyst byte/word expressions. Catalyst automatically plans
HashAggregate(partial) -> Exchange -> HashAggregate(final), so only
per-group partial sums cross the wire — strictly less shuffle volume
than the reference at any scale, and the whole map side is
whole-stage-codegen'd (no per-example Python/TF as in tf_utils.py:41).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.functions import textstats


def compute_group_counts(
    df: DataFrame,
    key: Column,
    count_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group (num_examples, num_bytes, num_words).

    ``key`` is any keyer Column from :mod:`dataset_grouper_spark.keys`.
    ``count_cols`` restricts which columns contribute bytes/words
    (default: all — matching the reference, which sizes the whole
    example including the key feature; beam_transforms_test.py:211-226).

    An input column already named ``group_id`` is REPLACED by the new
    key (the re-keying semantics `with_group_key` documents) — its
    bytes then count under the NEW key's value; pass ``count_cols``
    explicitly when that distinction matters.
    """
    keyed = keys.with_group_key(df, key)
    base = df  # schema for stats excludes the appended group_id column
    return keyed.groupBy(keys.GROUP_COL).agg(
        F.count(F.lit(1)).alias("num_examples"),
        F.sum(textstats.row_bytes_expr(base, count_cols)).alias("num_bytes"),
        F.sum(textstats.row_words_expr(base, count_cols)).alias("num_words"),
    )


def format_group_counts(counts: DataFrame, delimiter: str = ",") -> DataFrame:
    """Formatted text lines (count_utils.py:50-58), one per group."""
    return counts.select(
        textstats.format_group_count(delimiter).alias("line")
    )


def write_group_counts_csv(
    counts: DataFrame, path: str, delimiter: str = ",", num_shards: int | None = None
) -> None:
    """CSV with header — the WriteToText sink (tfds_pipelines.py:125-139);
    Spark writes the header per part-file exactly like Beam's per-shard
    header. ``num_shards`` -> repartition (``num_shards=0``/None -> let
    AQE decide, matching Beam's auto-sharding).

    Deliberate format difference: a key containing the delimiter/quote/
    newline is RFC-quoted here, where the reference's raw concat line
    is ambiguous to re-parse — use :func:`format_group_counts` (+ a
    text sink) when byte-parity with the reference's unquoted lines is
    required.
    """
    out = counts if not num_shards else counts.repartition(num_shards)
    out.write.mode("overwrite").option("header", True).option(
        "sep", delimiter
    ).csv(path)
