"""Stream-stream joins with watermark-bounded state.

The reference is batch-only; Spark's Structured Streaming can join two
unbounded streams as long as (a) both sides carry watermarks and (b)
the join condition bounds event time on one side relative to the other
— together they let the engine discard state for rows that can no
longer match. This module packages the interval-attribution shape
(match right rows to left rows within a time window after them, same
keys) as a first-class streaming operator: the streaming twin of
``operators.joins.interval_join`` / the attribution queries.

100 TB posture: state per side is bounded by (watermark + window) of
recent rows, not the stream history; the join itself is a keyed
symmetric hash join the engine maintains incrementally. Inner joins
emit matches eagerly, so an availableNow drain over a finite source
produces exactly the batch join result (asserted in tests and the
driver oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_attribution(
    anchors: DataFrame,
    events: DataFrame,
    on: list[str],
    anchor_ts: str,
    event_ts: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join ``events`` rows to ``anchors`` rows sharing the ``on``
    keys with ``event_ts`` in ``[anchor_ts, anchor_ts + window]``
    (inclusive — same bounds as the batch ``interval_join``
    attribution).

    Both inputs must be streaming DataFrames whose ``anchor_ts`` /
    ``event_ts`` columns are TimestampType event time; both get
    ``watermark`` applied here. The time-range predicate is what lets
    Spark age out join state: an anchor older than
    (watermark + window) can never match a future event and is
    dropped from the state store.

    ``how='inner'`` emits matches eagerly. ``how='left_outer'`` also
    emits every unmatched anchor with NULL event columns — but only
    once the watermark proves no future event can match it, so outer
    rows for anchors newer than (final watermark - window) are still
    held in state when a finite drain ends: an oracle over a drained
    source must filter its expected unmatched set accordingly.

    Returns all anchor columns + all event columns (names must be
    disjoint apart from ``on``).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(
            "stream_interval_attribution supports how='inner' or "
            "'left_outer'"
        )
    overlap = (set(anchors.columns) & set(events.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"anchor/event column names must be disjoint: {sorted(overlap)}"
        )
    a = anchors.withWatermark(anchor_ts, watermark)
    e = events.withWatermark(event_ts, watermark)
    # rename the event side's key columns BEFORE joining: dropping a
    # same-named column by reference after the join is ambiguous, and
    # keeping the event side's copy would surface as NULL keys on
    # outer rows (invisible on inner joins, where both copies agree)
    for k in on:
        e = e.withColumnRenamed(k, f"_ev_{k}")
    cond = F.lit(True)
    for k in on:
        cond = cond & (a[k] == e[f"_ev_{k}"])
    cond = (
        cond
        & (e[event_ts] >= a[anchor_ts])
        & (e[event_ts] <= a[anchor_ts] + F.expr(f"INTERVAL {window}"))
    )
    joined = a.join(e, cond, how)
    return joined.drop(*[f"_ev_{k}" for k in on])
