"""Byte-capped group packing — the reference's ``MergeWithLimitFn``.

Reference (beam_transforms.py:31-78): a Beam combiner accumulating per
key a list[bytes] whose total size stays < limit (default 2e9, the
protobuf cap); overflow elements are silently dropped, and WHICH
elements survive is order/partition-dependent — nondeterministic by
design (SURVEY §2.5 A1).

Spark design — deterministic prefix semantics (SURVEY §7 "Hard
parts"): order rows within each group by a stable ``order_col``, keep
the maximal prefix whose inclusive running byte sum stays < limit:

    sum(bytes) OVER (PARTITION BY group_id ORDER BY ord
                     ROWS UNBOUNDED PRECEDING) < limit

Same cap rule as add_input (beam_transforms.py:47-52: an element is
accepted iff accumulated+size < limit) applied in a defined order, so
results are reproducible on any cluster size and oracle-checkable.

Scale notes:
- Rows stay FLAT through the window (no collect_list), so Tungsten can
  spill; a 2 GB group never materializes as one JVM object the way the
  reference's accumulator does in RAM.
- The window shares its hash-partitioning with the downstream
  per-group write — one shuffle total, same as the reference's single
  CombinePerKey shuffle.
- Giant skewed groups: the window itself must sort each group;
  AQE skew handling does not split windows, but rows whose individual
  size meets the limit ARE pre-filtered before the sort (see
  ``cap_prefix``), so one monster row never inflates the window input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataset_grouper_spark import keys
from dataset_grouper_spark.functions import textstats

# beam_transforms.py:26-27 — "general protobuf limit".
BYTES_LIMIT = 2_000_000_000


def cap_prefix(
    df: DataFrame,
    order_col: str | Column,
    size_col: Column,
    limit: int = BYTES_LIMIT,
    group_col: str = keys.GROUP_COL,
    keep_size_col: str | None = None,
) -> DataFrame:
    """Keep, per group, the maximal ordered prefix with running byte sum
    strictly below ``limit``. Adds ``_cum_bytes`` (inclusive) and
    filters; drops helper columns on the way out.

    Rows whose INDIVIDUAL size already meets the limit are excluded
    BEFORE the window (a plain pushed-down filter, upstream of the
    sort-shuffle): such a row can never be admitted — its inclusive
    running sum is >= limit wherever it lands — and pre-filtering keeps
    a single monster row from (a) inflating the per-group window sort
    and (b) vetoing every row ordered after it. The semantics are thus
    "maximal prefix over admissible rows", mirrored verbatim in the
    SQL oracle twin. Use :func:`oversized_rows` for the audit stream
    of what was excluded (count it, alert on it — silently vanishing
    monsters are how quota bugs hide).

    ``keep_size_col`` retains the evaluated per-row size under that
    name so downstream aggregations (pack_groups) don't evaluate the
    size expression a second time. Helper names ``_sz``/``_cum_bytes``
    are reserved — an input column with either name would be silently
    overwritten and dropped.
    """
    clash = {"_sz", "_cum_bytes"} & set(df.columns)
    if clash:
        raise ValueError(
            f"cap_prefix reserves helper columns {sorted(clash)}; rename "
            "the input columns first"
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("_sz", size_col.cast("long"))
        .filter(F.col("_sz") < F.lit(limit))
        .withColumn("_cum_bytes", F.sum("_sz").over(w))
        .filter(F.col("_cum_bytes") < F.lit(limit))
    )
    if keep_size_col is not None:
        out = out.withColumn(keep_size_col, F.col("_sz"))
    return out.drop("_sz", "_cum_bytes")


def oversized_rows(
    df: DataFrame,
    size_col: Column,
    limit: int = BYTES_LIMIT,
    group_col: str = keys.GROUP_COL,
) -> DataFrame:
    """The audit twin of :func:`cap_prefix`'s monster pre-filter:
    (group_id, n_oversized, oversized_bytes) for rows whose individual
    size meets ``limit`` — the rows cap_prefix excludes before its
    window sort. Zero-join, one partial-aggregated pass."""
    return (
        df.withColumn("_sz", size_col.cast("long"))
        .filter(F.col("_sz") >= F.lit(limit))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_oversized"),
            F.sum("_sz").alias("oversized_bytes"),
        )
    )


def pack_groups(
    df: DataFrame,
    key: Column,
    order_col: str | Column,
    limit: int = BYTES_LIMIT,
    size_cols: list[str] | None = None,
    payload_col: str | Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Key + cap + pack: the ``to_keyed_sequence_examples`` composition
    (beam_transforms.py:81-109) with deterministic cap semantics.

    Returns one row per group: (group_id, num_examples, num_bytes,
    packed) where ``packed`` is the ordered array of payloads (the
    relational stand-in for the SequenceExample feature-list,
    serialization.py:51-62). With ``payload_col=None`` the packed list
    is the ordered array of row structs.

    For massive groups prefer :func:`cap_prefix` + a partitioned write
    (sinks/) — packing to an in-row array is for modest group sizes /
    compat export.

    ``num_partitions`` pre-hash-partitions on the group key with an
    explicit width; the cap window, the pack aggregation, and (when it
    equals the shard count) the downstream shard write all reuse that
    one exchange instead of defaulting to ``spark.sql.shuffle
    .partitions`` — set it when the group count is far below the
    session default.
    """
    keyed = keys.with_group_key(df, key)
    if num_partitions is not None:
        keyed = keyed.repartition(num_partitions, F.col(keys.GROUP_COL))
    size_expr = textstats.row_bytes_expr(df, size_cols)
    # keep the evaluated size: rebuilding row_bytes_expr downstream
    # would pay the per-column length sums a second time per row
    capped = cap_prefix(
        keyed, order_col, size_expr, limit, keep_size_col="_kept_sz"
    )
    if payload_col is None:
        payload = F.struct(*[F.col(c) for c in df.columns])
    else:
        payload = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    ordc = F.col(order_col) if isinstance(order_col, str) else order_col
    # sort_array over (ord, payload) structs gives a deterministic
    # packing order without relying on collect_list ordering.
    return (
        capped.select(
            keys.GROUP_COL,
            ordc.alias("_ord"),
            payload.alias("_payload"),
            F.col("_kept_sz").alias("_sz"),
        )
        .groupBy(keys.GROUP_COL)
        .agg(
            F.count(F.lit(1)).alias("num_examples"),
            F.sum("_sz").alias("num_bytes"),
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_ord"), F.col("_payload")))),
                lambda s: s["_payload"],
            ).alias("packed"),
        )
    )
