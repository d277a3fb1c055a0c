"""Distributed prefix sum + token-balanced training shards.

A running total over a global order is the primitive behind
token-budgeted sharding ("cut the corpus into ~100M-token training
files"), resумable byte offsets, and curriculum schedules.  The naive
Spark spelling — ``sum().over(Window.orderBy(...))`` with no partition
key — collapses the whole dataset into ONE task (Spark warns exactly
that), which is a non-starter at 100 TB.

``running_sum`` is the scalable two-pass spelling:

1. range-repartition on the order column (the only global exchange —
   the same one a global sort would pay);
2. per-partition window cumsum (parallel, ordered within partitions);
3. per-partition TOTALS (one tiny agg, <= num_partitions rows) are
   collected, prefix-summed on the driver, and broadcast back as each
   partition's offset.

The result equals the single-partition window exactly (asserted in
tests) at partition-parallel cost.  ``write_token_shards`` applies it
to cut the corpus into shards of ``tokens_per_shard`` consecutive
tokens and writes them as ``shard=N`` partition directories — every
shard holds contiguous-by-order docs and (except the last) at least
the budget's worth of tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.localrel import local_frame

CUM_COL = "_cum"


def running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    num_partitions: int = 64,
    out_col: str = CUM_COL,
) -> DataFrame:
    """Inclusive running sum of ``value_col`` in global ``order_col``
    order, computed partition-parallel (see module docstring).  The
    order column must be totally ordered (unique) for the result to be
    well-defined."""
    from pyspark.sql import Window

    from dataset_grouper_spark.cache import persist_tracked

    # persisted: the totals pass and the window pass must see the SAME
    # range boundaries (repartitionByRange samples boundaries per
    # evaluation — two lineage branches could disagree otherwise)
    r = persist_tracked(
        df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    within = r.withColumn("_within", F.sum(value_col).over(w))
    totals = sorted(
        (row["_pid"], row["_t"])
        for row in r.groupBy("_pid")
        .agg(F.sum(value_col).alias("_t"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid, t in totals:
        offsets[pid] = acc
        acc += t or 0
    spark = df.sparkSession
    off = local_frame(spark, 
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    return (
        within.join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.col("_within") + F.col("_off")).cast("long"))
        .drop("_pid", "_within", "_off")
    )


def with_token_shards(
    df: DataFrame,
    tokens_col,
    order_col: str,
    tokens_per_shard: int,
    num_partitions: int = 64,
) -> DataFrame:
    """Assign each row to a shard of ``tokens_per_shard`` consecutive
    tokens: shard = exclusive-prefix-tokens // budget — rows stay whole
    (a doc never splits), shards are contiguous in ``order_col``, and
    every shard except the last totals within one row's tokens of the
    budget (a whole row straddling a boundary charges its shard, so a
    shard can run up to max-row-tokens over or under).  Deterministic
    closed form, so an SQL window twin can recompute it."""
    reserved = {"shard", "_tok", CUM_COL, "_pid", "_within", "_off"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"with_token_shards reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash)} first (a silent withColumn overwrite "
            "would destroy the user column)"
        )
    sized = df.withColumn("_tok", F.expr(tokens_col) if isinstance(tokens_col, str) else tokens_col)
    cum = running_sum(sized, "_tok", order_col, num_partitions)
    # integer div, not double '/': cumulative token totals above 2^53
    # (real at corpus scale) would round the quotient and put
    # boundary rows in the wrong shard — the SQL twin uses // too
    return cum.withColumn(
        "shard",
        F.expr(f"(({CUM_COL}) - _tok) div {int(tokens_per_shard)}"),
    ).drop("_tok")


def write_token_shards(
    df: DataFrame,
    path: str,
    tokens_col,
    order_col: str,
    tokens_per_shard: int,
    num_partitions: int = 64,
) -> None:
    """Cut the corpus into token-budgeted shards and write them as
    ``shard=N`` partition directories, rows sorted by ``order_col``
    within each shard — the training-file export: a data loader reads
    shard directories sequentially and sees contiguous corpus order."""
    sharded = with_token_shards(
        df, tokens_col, order_col, tokens_per_shard, num_partitions
    )
    (
        sharded.drop(CUM_COL)
        .repartition("shard")
        .sortWithinPartitions("shard", order_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
