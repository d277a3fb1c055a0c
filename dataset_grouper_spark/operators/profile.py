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
