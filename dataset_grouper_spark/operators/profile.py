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
    NULL keys report under the "(null)" sentinel — a genuine string
    key with that literal value would merge with them (coalesce to a
    collision-free sentinel upstream if that can occur).
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
            # divide first in double: cnt * _nkeys as long*long
            # overflows int64 at 100 TB cardinalities
            F.col("cnt") / F.col("_total") * F.col("_nkeys"), round_digits
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
               round(cnt / CAST(_total AS DOUBLE) * _nkeys, {round_digits})
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
    # NULL values are excluded: a NULL has no quantile position, and
    # the engines disagree on NULL sort order (Spark nulls-first,
    # DuckDB nulls-last) — including them breaks reproducibility
    keyed = df.select(
        F.col(value_col).alias("_val"), F.col(id_col).alias("_id")
    ).filter(F.col("_val").isNotNull()).withColumn(
        "_ok", F.struct(F.col("_val"), F.col("_id"))
    ).withColumn(
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
        FROM {table} WHERE {value_col} IS NOT NULL
      )
      SELECT CAST(((rk - 1) * {int(n_bins)}) // n AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(v) AS lo, max(v) AS hi
      FROM ranked GROUP BY 1
    """


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    k: float = 0.5,
) -> DataFrame:
    """Categorical distribution drift between two frames (corpus
    versions, train vs eval splits, yesterday's crawl vs today's):
    per category the counts, add-k smoothed shares, and the KL(A‖B)
    contribution ``p_a * ln(p_a / p_b)`` — sum the column for the
    divergence, inspect rows for WHICH categories moved. NULL
    categories are excluded on both sides (coalesce first to treat
    NULL as a category).

    Smoothing is over the UNION vocabulary (a category present in only
    one side gets the k-floor on the other), so every contribution is
    finite. Shape: two aggregations + one full-outer join on the
    category (vocabulary-sized frames — negligible next to the scans);
    shares are exact rational arithmetic inside the ln.
    """
    if k <= 0:
        raise ValueError("smoothing k must be positive")
    ca = (
        df_a.select(F.col(col).alias("category"))
        .na.drop()
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    cb = (
        df_b.select(F.col(col).alias("category"))
        .na.drop()
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    from dataset_grouper_spark.cache import persist_tracked

    # persisted: the totals aggregate AND the output branch both read
    # this join — without materialization both re-run the source scans
    joined = persist_tracked(
        ca.join(cb, ["category"], "full_outer").select(
            "category",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = joined.agg(
        F.sum("n_a").alias("_ta"),
        F.sum("n_b").alias("_tb"),
        F.count(F.lit(1)).alias("_v"),
    )
    pa = (F.col("n_a") + F.lit(k)) / (F.col("_ta") + F.lit(k) * F.col("_v"))
    pb = (F.col("n_b") + F.lit(k)) / (F.col("_tb") + F.lit(k) * F.col("_v"))
    return joined.crossJoin(F.broadcast(tot)).select(
        "category",
        "n_a",
        "n_b",
        pa.alias("share_a"),
        pb.alias("share_b"),
        (pa * F.log(pa / pb)).alias("kl_term"),
    )


def distribution_drift_sql(
    table_a_sql: str, table_b_sql: str, col: str, k: float = 0.5
) -> str:
    """DuckDB twin of :func:`distribution_drift`."""
    return f"""
      WITH ca AS (
        SELECT {col} AS category, count(*) AS n_a
        FROM ({table_a_sql}) WHERE {col} IS NOT NULL GROUP BY 1
      ), cb AS (
        SELECT {col} AS category, count(*) AS n_b
        FROM ({table_b_sql}) WHERE {col} IS NOT NULL GROUP BY 1
      ), j AS (
        SELECT coalesce(ca.category, cb.category) AS category,
               coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
        FROM ca FULL OUTER JOIN cb ON ca.category = cb.category
      ), tot AS (
        SELECT sum(n_a) AS ta, sum(n_b) AS tb, count(*) AS v FROM j
      )
      SELECT category,
             CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             (n_a + {k!r}) / (ta + {k!r} * v) AS share_a,
             (n_b + {k!r}) / (tb + {k!r} * v) AS share_b,
             ((n_a + {k!r}) / (ta + {k!r} * v))
               * ln(((n_a + {k!r}) / (ta + {k!r} * v))
                    / ((n_b + {k!r}) / (tb + {k!r} * v))) AS kl_term
      FROM j CROSS JOIN tot
    """
