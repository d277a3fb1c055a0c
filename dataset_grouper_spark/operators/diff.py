"""Row-level reconciliation between two relations — the audit
primitive behind "what changed between version A and version B?"
(migrations, replication checks, snapshot audits). Generalizes the
snapshot store's version diff to ANY two DataFrames, including two
pinned reads of a Delta/Iceberg table.

Scale shape: keyed mode is ONE full-outer join on the keys (the same
shuffle any reconciliation pays) with change detection as an exact
null-safe column comparison — no hashing, no collisions, no driver
data. Keyless mode is a multiset compare: aggregate each side to
(row, multiplicity) and full-outer join on the whole row — heavier
(the groupBy key is every column) but exact for bag semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["frame_diff"]


def frame_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Classify every row difference from ``left`` (the old state) to
    ``right`` (the new state).

    With ``keys`` (unique per frame — the caller's contract): one row
    per differing key with ``status`` in ``added`` (key only in
    right), ``removed`` (only in left), ``changed`` (present in both,
    any non-key column differs — exact null-safe comparison). Output
    columns: ``*keys, status``.

    Without keys: exact MULTISET diff — one row per distinct row value
    whose multiplicity changed, with ``status`` (``added``/``removed``)
    and ``multiplicity`` (how many copies appeared/disappeared).
    Output columns: ``*columns, status, multiplicity``.
    """
    if left.columns != right.columns:
        raise ValueError(
            f"frame_diff: column mismatch — left {left.columns}, "
            f"right {right.columns}"
        )
    if keys:
        keys = list(keys)
        missing = [k for k in keys if k not in left.columns]
        if missing:
            raise ValueError(f"frame_diff: keys {missing} not in columns")
        vals = [c for c in left.columns if c not in keys]
        l = left.select(
            *keys,
            F.lit(True).alias("__pl"),
            *[F.col(c).alias(f"__l_{c}") for c in vals],
        )
        r = right.select(
            *keys,
            F.lit(True).alias("__pr"),
            *[F.col(c).alias(f"__r_{c}") for c in vals],
        )
        j = l.join(r, keys, "full_outer")
        same = F.lit(True)
        for c in vals:
            same = same & F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}"))
        status = (
            F.when(F.col("__pl").isNull(), F.lit("added"))
            .when(F.col("__pr").isNull(), F.lit("removed"))
            .when(~same, F.lit("changed"))
        )
        return (
            j.select(*keys, status.alias("status"))
            .filter(F.col("status").isNotNull())
        )
    cols = list(left.columns)
    lc = left.groupBy(*cols).agg(F.count(F.lit(1)).alias("__nl"))
    rc = right.groupBy(*cols).agg(F.count(F.lit(1)).alias("__nr"))
    j = lc.join(rc, cols, "full_outer").select(
        *cols,
        (
            F.coalesce(F.col("__nr"), F.lit(0))
            - F.coalesce(F.col("__nl"), F.lit(0))
        ).alias("__delta"),
    )
    return j.filter(F.col("__delta") != 0).select(
        *cols,
        F.when(F.col("__delta") > 0, F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("status"),
        F.abs(F.col("__delta")).alias("multiplicity"),
    )
