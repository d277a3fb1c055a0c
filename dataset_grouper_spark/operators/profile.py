"""Per-group numeric profiling — pipeline-QA statistics.

Data-quality gates on a training pipeline watch per-slice
distributions (did value p95 drift? did a slice go empty?). This is
one exact `groupBy().agg()` pass: count / min / max / mean plus exact
interpolated percentiles (`percentile`, the sort-based exact form —
identical to DuckDB's ``quantile_cont``, unlike ``approx_percentile``
whose sketches are engine-specific and would never hash-match).

Exact percentiles sort each group's values; for pathological groups
(billions of rows in one group) switch to ``approx_percentile`` and
drop the oracle expectation — the API shape is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_numeric_profile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
    round_digits: int = 6,
) -> DataFrame:
    """One row per group: n, min/max/mean of ``value_col``, and the
    requested exact quantiles as ``p<percent>`` columns."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(value_col), round_digits).alias("min_v"),
        F.round(F.max(value_col), round_digits).alias("max_v"),
        F.round(F.avg(value_col), round_digits).alias("mean_v"),
    ]
    for q in quantiles:
        name = f"p{str(q * 100).rstrip('0').rstrip('.').replace('.', '_')}"
        aggs.append(
            F.round(
                F.expr(f"percentile({value_col}, {q!r})"), round_digits
            ).alias(name)
        )
    return df.groupBy(*group_cols).agg(*aggs)


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Shuffle-key skew diagnostic: the ``top_n`` heaviest keys with
    their row share and their multiple of a perfectly uniform key's
    share. This is the measurement you run BEFORE a big join/agg at
    100 TB — a skew_x of 500 on one key says that key's reducer is the
    job's critical path and the join wants salting
    (operators/joins.salted_join) or AQE skew-split.

    Shape: one partial-aggregated count per key, a broadcast of the
    1-row total (crossJoin of a scalar — never a whole-frame window),
    and a distributed TakeOrdered for the top-N — no single-partition
    sort of the key universe. NULL keys count as a key (they hash to
    one reducer too — the classic skew culprit).
    """
    counts = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("(null)")).alias(
            "key"
        )  # sentinel, not NULL: engines disagree on NULL sort order
    ).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count(F.lit(1)).alias("_nkeys"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    return top.crossJoin(F.broadcast(totals)).select(
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("_total"), round_digits).alias("share"),
        F.round(
            F.col("cnt") * F.col("_nkeys") / F.col("_total"), round_digits
        ).alias("skew_x"),
    )


def key_skew_profile_sql(
    table: str, key_col: str, top_n: int = 10, round_digits: int = 6
) -> str:
    """DuckDB twin of :func:`key_skew_profile`."""
    return f"""
        WITH c AS (
          SELECT coalesce(CAST({key_col} AS VARCHAR), '(null)') AS key,
                 count(*) AS cnt
          FROM {table} GROUP BY 1
        ), t AS (
          SELECT CAST(sum(cnt) AS BIGINT) AS _total,
                 count(*) AS _nkeys FROM c
        )
        SELECT key, cnt,
               round(cnt / CAST(_total AS DOUBLE), {round_digits}) AS share,
               round(cnt * _nkeys / CAST(_total AS DOUBLE), {round_digits})
                 AS skew_x
        FROM c, t
        ORDER BY cnt DESC, key
        LIMIT {top_n}
    """


def equidepth_bins(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int,
    num_partitions: int = 64,
) -> DataFrame:
    """Equi-depth (quantile) binning: every bin holds ⌈N/bins⌉ or
    ⌊N/bins⌋ rows — the complement of the equi-width histogram (which
    starves under skew: one hot value can own 99% of an equi-width
    bin). Bin edges double as exact quantile estimates.

    The naive spelling — ``ntile() OVER (ORDER BY value)`` — collapses
    the dataset into ONE task. This uses the distributed prefix sum
    (operators/prefix.py): global rank via range-repartition +
    per-partition window + driver-prefixed offsets, so the only global
    exchange is the range partitioning a total sort would pay anyway.
    Ties order by (value, id) — total, so results are
    engine-reproducible. Bin assignment is pure integer arithmetic
    (``(rank-1)*bins div N`` — no float boundary roulette).

    Returns (bin, n_rows, lo, hi).
    """
    from dataset_grouper_spark.operators import prefix

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    keyed = df.select(
        F.col(value_col).alias("_val"), F.col(id_col).alias("_id")
    ).withColumn("_ok", F.struct(F.col("_val"), F.col("_id"))).withColumn(
        "_one", F.lit(1)
    )
    ranked = prefix.running_sum(
        keyed, "_one", "_ok", num_partitions=num_partitions, out_col="_rk"
    )
    total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            "bin",
            F.expr(f"(( _rk - 1 ) * {int(n_bins)}) div _n").cast("long"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_val").alias("lo"),
            F.max("_val").alias("hi"),
        )
    )


def equidepth_bins_sql(
    table: str, value_col: str, id_col: str, n_bins: int
) -> str:
    """DuckDB twin of :func:`equidepth_bins` (// is integer div)."""
    return f"""
      WITH ranked AS (
        SELECT {value_col} AS v,
               row_number() OVER (ORDER BY {value_col}, {id_col}) AS rk,
               count(*) OVER () AS n
        FROM {table}
      )
      SELECT CAST(((rk - 1) * {int(n_bins)}) // n AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(v) AS lo, max(v) AS hi
      FROM ranked GROUP BY 1
    """
