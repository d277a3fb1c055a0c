"""Scale-pattern joins Spark lacks as first-class operators.

- ``interval_join``: point-in-interval matching. The naive Spark
  spelling (``t BETWEEN start AND end`` as the join condition) plans a
  BroadcastNestedLoopJoin / cartesian product — O(|P| x |I|) compares.
  Binning turns it into an EQUIJOIN on (keys, time bin): each interval
  replicates into the bins it spans, each point hashes to exactly one
  bin, and the residual range filter runs after a hash join. Work is
  O(matches + bin collisions), shuffle is a plain hash partition —
  the standard overlap-join technique (bin width trades replication
  vs candidate density).

- ``salted_join``: equi-join with a skew-buster. One hot key makes one
  reducer the whole job's critical path; AQE's skew split helps sorted
  shuffles but not a degenerate hash bucket. Salting spreads the hot
  key's rows over ``num_salts`` sub-keys and replicates the other side
  ``num_salts``-fold — results identical to the plain join (oracled),
  critical path divided by the salt count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}


def _require_integral(df: DataFrame, col: str, side: str) -> None:
    dtype = dict(df.dtypes).get(col)
    if dtype not in _INTEGRAL_TYPES:
        raise TypeError(
            f"interval_join: {side} column {col!r} has type {dtype!r}; "
            "time columns must be integral (epoch seconds/micros/nanos) — "
            "truncating DIV on floats or decimals would silently mis-bin"
        )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bin_width: int = 3600,
    max_bins_per_interval: int | None = 1_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row with
    ``start <= t <= end`` (inclusive), optionally also matching on
    ``by`` key columns. Time columns are numeric (same unit); pick
    ``bin_width`` near the typical interval length so most intervals
    span 1-2 bins.

    ``how='left'`` additionally keeps every unmatched point with NULL
    interval columns. A plain left join over the binned equijoin would
    be WRONG (a point can share a bin yet fail the residual range
    filter, silently losing its NULL row), so the outer completion is
    an anti-join of the points against the matched set — one extra
    shuffle on the point ids, no re-scan of the intervals.

    Output: all point columns + all interval columns. Column names
    (besides ``by``) must be disjoint across the two inputs. Time
    columns must be integral and non-negative (epoch micro/nanos):
    binning uses integer DIV — double division would corrupt
    epoch-nanos beyond 2^53 and could mis-bin boundary points.
    Integrality is enforced; non-negativity is the caller's contract.

    ``max_bins_per_interval`` is a scale fuse: each interval replicates
    into ``span/bin_width`` rows, so one open-ended sentinel interval
    (``end = Long.MAX``) at nanos resolution would otherwise try to
    materialize ~10^12 replica rows and take down the stage. Any
    interval spanning more bins than the cap fails the job with a
    clear message (raise the cap, pass ``None`` to disable the fuse,
    or pre-clip if the span is intended). The default is high enough
    (10^6 bins — already a pathological replication factor) that only
    sentinel-shaped intervals trip it.
    """
    if how not in ("inner", "left"):
        raise ValueError("interval_join supports how='inner' or 'left'")
    by = by or []
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"point/interval column names must be disjoint: {sorted(overlap)}"
        )
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("interval_join reserves the column name '_bin'")
    _require_integral(points, t_col, "point")
    _require_integral(intervals, start_col, "interval start")
    _require_integral(intervals, end_col, "interval end")
    w = int(bin_width)
    start_bin = F.expr(f"CAST({start_col} DIV {w} AS LONG)")
    end_bin = F.expr(f"CAST({end_col} DIV {w} AS LONG)")
    if max_bins_per_interval is None:
        guarded_end = end_bin
    else:
        max_b = int(max_bins_per_interval)
        # span guard folded into the sequence bound: executor-side,
        # per-row, no extra pass; raise_error's NullType coerces into
        # the LONG branch. Spans of exactly max_b bins pass; the error
        # fires strictly above the cap.
        guarded_end = F.when(
            end_bin - start_bin < F.lit(max_b), end_bin
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"interval_join: interval spans more than {max_b} "
                        f"bins of width {w} ("
                    ),
                    (end_bin - start_bin + F.lit(1)).cast("string"),
                    F.lit(
                        " bins) — raise bin_width/max_bins_per_interval, "
                        "pass max_bins_per_interval=None, or clip "
                        f"open-ended sentinels in '{end_col}'"
                    ),
                )
            ).cast("long")
        )
    iv = intervals.filter(  # malformed intervals match nothing (and a
        F.col(end_col) >= F.col(start_col)  # descending sequence throws)
    ).withColumn("_bin", F.explode(F.sequence(start_bin, guarded_end)))
    pt = points.withColumn("_bin", F.expr(f"CAST({t_col} DIV {w} AS LONG)"))
    inner = (
        pt.join(iv, [*by, "_bin"])
        .filter(
            (F.col(t_col) >= F.col(start_col))
            & (F.col(t_col) <= F.col(end_col))
        )
        .drop("_bin")
    )
    if how == "inner":
        return inner
    # left completion: points absent from the matched set ride along
    # with NULL interval columns. Matching is keyed on the full point
    # row (all point columns), so duplicate point rows each keep their
    # multiplicity in the unmatched branch.
    matched_keys = inner.select(*points.columns).distinct()
    # NULL-SAFE anti-join: a name-list join uses null-unsafe equality,
    # so a matched point with a NULL in any column would fail the
    # match and ALSO ride the unmatched branch — duplicating the row
    mk = matched_keys.select(
        *[F.col(c).alias(f"_mk_{c}") for c in points.columns]
    )
    cond = None
    for c in points.columns:
        e = F.col(c).eqNullSafe(F.col(f"_mk_{c}"))
        cond = e if cond is None else cond & e
    unmatched = points.join(mk, cond, "left_anti")
    for c in intervals.columns:
        if c not in by:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
    return inner.unionByName(unmatched)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's keys salted across ``num_salts``
    sub-partitions and the right side replicated to meet every salt —
    the standard mitigation when a handful of hot keys would pin one
    reducer. Row-identical to ``left.join(right, on, how)``.

    Supports ``inner`` and ``left`` joins (an outer right side would
    multiply unmatched right rows by the salt count).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError("salted_join reserves the column name '_salt'")
    s = int(num_salts)
    # DETERMINISTIC salt (content hash of the whole row): a physical-
    # row counter is a nondeterministic shuffle key — a stage retry
    # re-assigns salts and duplicates/loses rows against reducers that
    # already fetched (the SPARK-23207 class). Identical duplicate
    # rows share a salt, so only duplicate-row skew remains unspread.
    l_salted = left.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(s)
        ).cast("int"),
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(s - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return l_salted.join(r_salted, [*on, "_salt"], how).drop("_salt")
