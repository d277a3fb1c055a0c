"""Time-series regularization: resample + gap-fill over event streams.

The reference has no time-series surface (its model is group-partitioned
bags, `/root/reference/dataset_grouper/beam_transforms.py:82-95`); this
extends the engine with the standard analytics shape every event
pipeline needs before windowed modeling: bucket an irregular event
stream onto a fixed grid, materialize the EMPTY buckets, and fill them
(zero / forward-fill / linear interpolation).

Scale posture (100 TB): the heavy step is one partial-aggregated
``groupBy(group, bucket)`` — the same shuffle any windowed rollup pays.
The dense axis is generated RELATIONALLY per group (``sequence`` +
``explode`` over each group's own [min, max] span — never a driver-side
loop, never a global collect), so a million groups × a year of hourly
buckets is just an 8760-wide explode per group row, distributed with
the groups.  Fill strategies are pure window projections
(``last(ignorenulls)`` / ``first(ignorenulls)``) partitioned by group —
no self-joins, no UDFs, whole-stage codegen end to end.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_bucket", "resample", "gap_fill", "rolling"]


def rolling(
    df: DataFrame,
    ts_col: str,
    window_seconds: int,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """TIME-RANGE rolling aggregates: one output row per input row,
    each aggregating the trailing window ``[t - window_seconds, t]``
    within its group — the event-time complement of row-count moving
    averages (a burst of events in one minute all fall in each
    other's window regardless of row position).

    ``aggs`` maps output column name -> aggregate Column (e.g.
    ``{"n_1h": F.count(F.lit(1))}``). Pure window projection over one
    sort exchange per group partitioning; rows sharing a timestamp are
    frame-peers (deterministic, order-insensitive within the second).
    ``ts_col`` must be castable to epoch seconds (long)."""
    from pyspark.sql.window import Window

    w = int(window_seconds)
    if w <= 0:
        raise ValueError(f"rolling: window_seconds must be > 0, got {w}")
    clash = sorted(set(aggs) & set(df.columns))
    if clash:
        raise ValueError(
            f"rolling: output names {clash} collide with input columns"
        )
    win = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-w, 0)
    )
    return df.select(
        *df.columns,
        *[expr.over(win).alias(name) for name, expr in aggs.items()],
    )


def time_bucket(ts: Column | str, bucket_seconds: int) -> Column:
    """Epoch-second start of the fixed-width bucket containing ``ts``.

    Returned as BIGINT epoch seconds (not a timestamp) so results are
    timezone-free and bit-stable across engines: Spark's
    ``cast(ts as long)`` and DuckDB's ``floor(epoch(ts))`` agree for
    the positive-epoch range.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    b = int(bucket_seconds)
    if b <= 0:
        raise ValueError(f"time_bucket: bucket_seconds must be > 0, got {b}")
    return (F.floor(c.cast("long") / b) * b).cast("long")


def resample(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Aggregate onto a fixed time grid: one row per (group, bucket)
    that has at least one event.  ``aggs`` are ordinary aggregate
    Columns (each must carry an ``.alias``).  The bucket column is
    named ``bucket_start`` (epoch seconds).  Empty buckets are NOT
    produced — compose with :func:`gap_fill` for a dense axis."""
    return (
        df.withColumn(
            "bucket_start", time_bucket(ts_col, bucket_seconds)
        )
        .groupBy(*group_cols, "bucket_start")
        .agg(*aggs)
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    bucket_seconds: int,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    fill: dict[str, str] | None = None,
) -> DataFrame:
    """Resample onto a DENSE per-group time grid, materializing empty
    buckets between each group's first and last event, then fill them.

    ``fill`` maps aggregated column name -> strategy:

    - ``"zero"``   — missing buckets get 0 (counts/sums);
    - ``"null"``   — left as NULL (the join default);
    - ``"ffill"``  — last seen non-null value carries forward; leading
      buckets before the first observation stay NULL;
    - ``"linear"`` — linear interpolation between the nearest observed
      values on either side; leading/trailing gaps fall back to the
      single available side (ffill/bfill semantics at the edges).

    The observed-bucket aggregate is computed ONCE; the dense axis is
    ``sequence(min_bucket, max_bucket, step)`` exploded per group —
    each group's span lives on that group's row, so the explode
    distributes with the data (no global span, no driver loop).  A
    group with one event yields exactly one bucket.
    """
    fill = dict(fill or {})
    g = list(group_cols)
    if not g:
        raise ValueError("gap_fill: at least one group column required")
    b = int(bucket_seconds)
    from dataset_grouper_spark.cache import persist_tracked

    # the observed aggregate feeds BOTH the span computation and the
    # dense join; persisted, the source is scanned+aggregated ONCE
    # (|groups x observed buckets| rows — far smaller than the source)
    observed = persist_tracked(resample(df, ts_col, b, g, aggs))
    val_cols = [c for c in observed.columns if c not in g + ["bucket_start"]]
    unknown = set(fill) - set(val_cols)
    if unknown:
        raise ValueError(
            f"gap_fill: fill strategies for unknown columns {sorted(unknown)}"
            f" (value columns: {val_cols})"
        )
    axis = (
        observed.groupBy(*g)
        .agg(
            F.min("bucket_start").alias("__mn"),
            F.max("bucket_start").alias("__mx"),
        )
        .select(
            *g,
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"), F.lit(b))
            ).alias("bucket_start"),
        )
    )
    dense = axis.join(observed, g + ["bucket_start"], "left")

    from pyspark.sql.window import Window

    w_back = (
        Window.partitionBy(*g)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*g)
        .orderBy("bucket_start")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    for col, how in fill.items():
        v = F.col(col)
        if how == "null":
            continue
        elif how == "zero":
            dense = dense.withColumn(col, F.coalesce(v, F.lit(0)))
        elif how == "ffill":
            dense = dense.withColumn(
                col, F.last(v, ignorenulls=True).over(w_back)
            )
        elif how == "linear":
            # nearest observed value and its bucket on each side; the
            # bucket marker rides a conditional so both windows stay
            # single-pass projections
            pb = F.last(
                F.when(v.isNotNull(), F.col("bucket_start")),
                ignorenulls=True,
            ).over(w_back)
            pv = F.last(v, ignorenulls=True).over(w_back)
            nb = F.first(
                F.when(v.isNotNull(), F.col("bucket_start")),
                ignorenulls=True,
            ).over(w_fwd)
            nv = F.first(v, ignorenulls=True).over(w_fwd)
            frac = (F.col("bucket_start") - pb).cast("double") / (
                nb - pb
            ).cast("double")
            interp = (
                pv.cast("double")
                + (nv.cast("double") - pv.cast("double")) * frac
            )
            dense = dense.withColumn(
                col,
                F.when(v.isNotNull(), v.cast("double"))
                .when(pv.isNull(), nv.cast("double"))
                .when(nv.isNull(), pv.cast("double"))
                .otherwise(interp),
            )
        else:
            raise ValueError(
                f"gap_fill: unknown fill strategy {how!r} for {col!r}"
            )
    return dense
