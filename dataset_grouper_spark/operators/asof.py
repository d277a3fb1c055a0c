"""Backward as-of join — point-in-time feature lookup.

Spark has no ASOF JOIN (DuckDB/Pandas/kdb do); the naive Spark spelling
is an inequality join (``l.t >= r.t``) + per-left-row max — a range
join that explodes to O(|L| x |R|) pairs per key before the filter.
This operator gets the same answer in ONE shuffle with no pair
explosion: union both sides, sort per key by (time, side), and carry
the latest right-side payload forward with ``last(ignorenulls)`` over
a running window — the classic streaming-merge formulation, fully
whole-stage-codegen.

Matched right columns are packed into a single struct before the
window so every output column comes from the SAME matched right row
(per-column ``last`` could mix rows when right columns contain nulls).

Ties: a right row AT the left row's timestamp matches (inclusive,
DuckDB ``ASOF`` parity) — the side flag orders right(0) before left(1)
within a timestamp. Right rows duplicated on (keys, time) are not
disambiguated here; dedupe upstream if the source allows them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    by_cols: list[str],
    value_cols: list[str],
    tolerance: int | float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.time <= left.time`` within the same ``by_cols`` group.

    Output: every left column, plus ``<time_col><suffix>`` (matched
    right timestamp) and ``<c><suffix>`` for each of ``value_cols`` —
    all NULL when no right row precedes the left row (left-outer
    semantics). ``tolerance`` (same units as ``time_col``) nulls out
    matches older than ``left.time - tolerance``.

    Rows with a NULL ``time_col`` are dropped from BOTH sides: a NULL
    time has no position on the as-of axis, and Spark's nulls-first
    window order would otherwise make a NULL-time right row act as a
    -infinity match carried into every left row (a payload with a NULL
    matched timestamp — contradicting the <= contract).
    """
    lcols = left.columns
    reserved = {"_t", "_side", "_rpay", "_m", "_rt"}
    clash = reserved & (set(lcols) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves helper column names {sorted(reserved)}; "
            f"rename input columns {sorted(clash)} before joining"
        )
    left = left.filter(F.col(time_col).isNotNull())
    right = right.filter(F.col(time_col).isNotNull())
    payload = F.struct(
        F.col(time_col).alias("_rt"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    l_side = left.select(
        *by_cols,
        F.col(time_col).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in by_cols],
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType.simpleString()
        ).alias("_rpay"),
    )
    r_side = right.select(
        *by_cols,
        F.col(time_col).alias("_t"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in by_cols
        ],
        payload.alias("_rpay"),
    )
    w = (
        Window.partitionBy(*by_cols)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(
                F.col("_m._rt") >= F.col("_t") - F.lit(tolerance), F.col("_m")
            ),
        )
    return matched.select(
        *lcols,
        F.col("_m._rt").alias(f"{time_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
