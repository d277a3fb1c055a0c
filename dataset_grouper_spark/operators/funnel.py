"""Event funnels — ordered first-completion analysis per entity.

"view -> click -> purchase" style funnels: for each entity, the
timestamp of the FIRST completion of each step, where step k counts
only strictly after the entity's step-(k-1) time. One aggregation per
step joined back on the entity key — k small (funnels are 3-6 steps),
every stage a key-partitioned hash aggregate + equijoin Catalyst can
plan; no per-entity Python, no event-sequence explosion.

The per-step frames shrink monotonically (only entities that completed
the previous step carry forward), so later stages cost less, and AQE
broadcast-joins the survivor frame once it is small enough.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_first_completion(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per entity: (entity, t_0, ..., t_{k-1}) — first time each funnel
    step completed in order; NULL from the first uncompleted step on.
    Every entity with at least step 0 appears."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(entity_col).alias("_e"))
        .agg(F.min(ts_col).alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            df.filter(F.col(type_col) == step)
            .select(F.col(entity_col).alias("_e"), F.col(ts_col).alias("_t"))
            .join(cur.select("_e", F.col(f"t_{i-1}").alias("_prev")), "_e")
            .filter(F.col("_t") > F.col("_prev"))
            .groupBy("_e")
            .agg(F.min("_t").alias(f"t_{i}"))
        )
        cur = cur.join(nxt, "_e", "left")
    return cur.withColumnRenamed("_e", entity_col)


def funnel_counts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Stage reach counts: one row per step with how many entities got
    at least that far (n_0 >= n_1 >= ...)."""
    per = funnel_first_completion(df, entity_col, ts_col, type_col, steps)
    aggs = [
        F.count(F.col(f"t_{i}")).alias(f"n_{i}") for i in range(len(steps))
    ]
    wide = per.agg(*aggs)
    # step names go through lit() columns, never string-interpolated
    # SQL — a step containing a quote would break the stack() parse
    rows = F.array(
        *[
            F.struct(
                F.lit(s).alias("step"),
                F.col(f"n_{i}").cast("long").alias("n_entities"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select(
        "_r.step", "_r.n_entities"
    )


def retention_cohorts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    period: int,
) -> DataFrame:
    """Cohort retention grid: entities bucketed by first-activity
    period (the cohort), counted per later activity period offset.

    Pure integer arithmetic on the raw timestamp (``ts DIV period``) so
    any engine computes identical buckets. Two hash aggregates and one
    equijoin on the entity key: first-activity per entity, distinct
    (entity, period) activity, then (cohort, offset) counts.
    Returns (cohort_period, period_offset, n_active) with offset 0
    being the cohort size row.
    """
    periods = df.select(
        F.col(entity_col).alias("_e"),
        # true integer division — float division + cast could round
        # across a period boundary differently than the SQL twin's //
        F.expr(f"CAST({ts_col} DIV {period} AS BIGINT)").alias("_p"),
    ).distinct()
    first = periods.groupBy("_e").agg(F.min("_p").alias("_cohort"))
    return (
        periods.join(first, "_e")
        .groupBy(
            F.col("_cohort").alias("cohort_period"),
            (F.col("_p") - F.col("_cohort")).alias("period_offset"),
        )
        # periods is already distinct per (entity, period) and cohort/
        # offset are functions of (entity, period) — each entity
        # appears once per group, so a plain count equals the distinct
        # count without the extra dedup pass over the largest frame
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
