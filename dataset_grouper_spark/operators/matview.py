"""Incremental materialized-aggregate maintenance.

The engine's sidecar indexes already do this internally (append merges
the new batch's counts into the old index — PERF.md: "appending an
hour to a year never rescans the year"); this module exposes the same
contract for USER aggregates: keep a corpus-wide rollup (counts, token
totals, per-source bytes …) fresh across appends at O(batch + groups)
cost instead of O(corpus) recomputation.

Works for ADDITIVE aggregates — anything mergeable by summing partial
states: count, sum, and everything derivable from them downstream
(mean = sum/count at read time). Non-additive aggregates (distinct,
percentiles) need sketches or a recompute; that boundary is the whole
theory of incremental view maintenance, stated here honestly instead
of hidden.

Refresh shape: aggregate the BATCH (one partial agg over new data
only), union with the stored table (groups-sized), re-aggregate, write
to a sibling dir and swap — the same write-sibling-then-swap idiom as
the storage lifecycle ops. The swap is two directory renames, so there
is a sub-millisecond window where ``path`` does not exist; a crash
inside it leaves the previous table at ``<path>_old``, and the next
``refresh_materialized_sums`` (or an explicit
``recover_materialized``) restores it before proceeding — no state is
ever lost, but a concurrent READER in that window sees a missing
path and should retry (single-refresher assumption, stated honestly;
the snapshot store is the tool when readers must never observe a
gap).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.compat import fs as _fs

STAGING_SUFFIX = "_refreshing"


def _local_state_path(path: str) -> str:
    """Matview state relies on ATOMIC DIRECTORY RENAME for its
    crash-safe swap — the same primitive Spark requires of streaming
    checkpoint locations. ``file://`` URIs resolve to their local
    path; rename-incapable backends (s3://, gs://) raise instead of
    silently losing the atomicity the docstrings promise. Keep matview
    state on a local/HDFS-style mount and the DATA on the object
    store."""
    if not _fs.is_uri(path):
        return path
    if path.startswith("file://"):
        from urllib.parse import urlparse

        return urlparse(path).path
    raise NotImplementedError(
        f"matview state at {path!r}: backend has no atomic directory "
        "rename (the swap's crash-safety primitive) — use a local or "
        "HDFS-style path, as with Spark streaming checkpoints"
    )


def create_materialized_sums(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, Column],
    path: str,
) -> None:
    """Materialize the initial aggregate: per ``key_cols`` group, the
    SUM of each expression in ``sum_cols`` (name -> column expr over
    the input rows). A plain count is ``F.lit(1)``."""
    path = _local_state_path(path)
    agg = df.groupBy(*key_cols).agg(
        *[F.sum(expr).alias(name) for name, expr in sum_cols.items()]
    )
    agg.write.mode("overwrite").parquet(path)


def recover_materialized(path: str) -> bool:
    """Roll forward after a crash inside the swap window: if ``path``
    is missing but the pre-swap table survives at ``<path>_old``,
    restore it. Returns True when a recovery happened."""
    path = _local_state_path(path)
    final_tmp = path.rstrip("/") + "_old"
    if not os.path.exists(path) and os.path.isdir(final_tmp):
        os.replace(final_tmp, path)
        return True
    return False


TAGS_FILE = "_folded_tags.log"


def folded_tags(path: str) -> set[str]:
    """Tags of every batch already folded into the table at ``path``.
    The tags file lives INSIDE the swapped directory (underscore
    prefix — ignored by Spark's file scan), so tag state and data
    state commit atomically in the same os.replace."""
    path = _local_state_path(path)
    try:
        with open(os.path.join(path, TAGS_FILE)) as f:
            return {ln.strip() for ln in f if ln.strip()}
    except FileNotFoundError:
        return set()


def refresh_materialized_sums(
    spark: SparkSession,
    batch: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, Column],
    path: str,
    tag: str | None = None,
) -> bool:
    """Fold an appended batch into the stored aggregate WITHOUT
    touching the corpus: batch partials ⊎ stored table, summed per
    group. New groups appear, existing groups accumulate. Cost:
    one aggregation over the batch + one over (groups + batch-groups)
    rows. Self-healing: a table stranded mid-swap by a crashed
    refresh is restored before this one proceeds.

    Delivery contract — single refresher. Without ``tag``, the swap is
    crash-safe (the table is always one of the pre- or post-fold
    states) but the fold is NOT idempotent: a crash after the swaps
    but before the caller records success leaves the batch folded in,
    and a blind retry double-counts it. Passing ``tag`` makes the
    refresh REPLAY-IDEMPOTENT: the tag is written into the staged
    directory before the swap, so fold and tag become visible in the
    same atomic os.replace — an already-folded tag returns False
    without touching the table, whichever side of a crash the replay
    lands on (the streaming foreachBatch epoch hook,
    streaming/matview_sink.py). Returns True when the batch was
    folded, False for a tag replay no-op."""
    path = _local_state_path(path)
    recover_materialized(path)
    if tag is not None and tag in folded_tags(path):
        return False
    batch_agg = batch.groupBy(*key_cols).agg(
        *[F.sum(expr).alias(name) for name, expr in sum_cols.items()]
    )
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(batch_agg)
        .groupBy(*key_cols)
        .agg(*[F.sum(name).alias(name) for name in sum_cols])
    )
    staging = path.rstrip("/") + STAGING_SUFFIX
    merged.write.mode("overwrite").parquet(staging)
    if tag is not None:
        tags = folded_tags(path)
        tags.add(tag)
        with open(os.path.join(staging, TAGS_FILE), "w") as f:
            f.write("\n".join(sorted(tags)) + "\n")
    final_tmp = path.rstrip("/") + "_old"
    shutil.rmtree(final_tmp, ignore_errors=True)
    os.replace(path, final_tmp)
    os.replace(staging, path)
    shutil.rmtree(final_tmp, ignore_errors=True)
    return True


# --------------------------------------------------------- join views

def join_delta(
    a_old: DataFrame,
    d_a: DataFrame,
    b_old: DataFrame,
    d_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Rows ADDED to ``A ⋈ B`` when append-only deltas land on both
    sides — the classic incremental-view-maintenance identity:

        (A∪dA) ⋈ (B∪dB) − A⋈B  =  dA⋈B  ∪all  A⋈dB  ∪all  dA⋈dB

    Exact including duplicate multiplicities (the three terms are the
    cross-multiplication's non-old×old quadrants, disjoint by
    construction for append-only bases), so a rollup over the
    maintained view hash-matches one over the full re-join.

    At 100 TB the whole point is that ``A⋈B`` (the huge term) is never
    recomputed: each term joins a DELTA against a base, so cost is
    O(dA⋈B + A⋈dB + dA⋈dB). Catalyst broadcasts the delta side when
    small (AQE decides from runtime sizes); the old×delta terms prune
    further under join-key semi-join pushdown when the base is a
    lakehouse table with key stats.
    """
    cols = None

    def ordered(df: DataFrame) -> DataFrame:
        nonlocal cols
        if cols is None:
            cols = df.columns
        return df.select(*cols)

    out = ordered(d_a.join(b_old, on))
    out = out.unionByName(ordered(a_old.join(d_b, on)))
    return out.unionByName(ordered(d_a.join(d_b, on)))


def create_materialized_join(
    a: DataFrame, b: DataFrame, on: list[str], path: str
) -> None:
    """Materialize ``a ⋈ b`` (inner, on ``on``) at ``path`` — the
    base state :func:`refresh_materialized_join` maintains."""
    path = _local_state_path(path)
    a.join(b, on).write.mode("overwrite").parquet(path)


def refresh_materialized_join(
    spark: SparkSession,
    path: str,
    a_old: DataFrame,
    d_a: DataFrame,
    b_old: DataFrame,
    d_b: DataFrame,
    on: list[str],
    tag: str | None = None,
) -> bool:
    """Fold append-only deltas of BOTH join sides into the stored join
    view without re-joining old×old: the stored rows carry over
    by-reference-shaped union, only :func:`join_delta`'s three
    delta-quadrant joins run. Same swap/crash/tag contract as
    :func:`refresh_materialized_sums` (single refresher; ``tag``
    makes replays no-op for exactly-once foreachBatch folds).

    The law pinned by tests and the oracle::

        refresh(create(A⋈B), dA, dB) == (A∪dA) ⋈ (B∪dB)
    """
    path = _local_state_path(path)
    recover_materialized(path)
    if tag is not None and tag in folded_tags(path):
        return False
    old = spark.read.parquet(path)
    delta = join_delta(a_old, d_a, b_old, d_b, on).select(*old.columns)
    merged = old.unionByName(delta)
    staging = path.rstrip("/") + STAGING_SUFFIX
    merged.write.mode("overwrite").parquet(staging)
    if tag is not None:
        tags = folded_tags(path)
        tags.add(tag)
        with open(os.path.join(staging, TAGS_FILE), "w") as f:
            f.write("\n".join(sorted(tags)) + "\n")
    final_tmp = path.rstrip("/") + "_old"
    shutil.rmtree(final_tmp, ignore_errors=True)
    os.replace(path, final_tmp)
    os.replace(staging, path)
    shutil.rmtree(final_tmp, ignore_errors=True)
    return True
