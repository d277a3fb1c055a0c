"""Data-quality constraint suites — one aggregation pass, uniform law.

The ingest-gate primitive (the role Deequ/Great Expectations play in
large pipelines): declare constraints over a table, compute every
metric in ONE aggregation job, and get back one row per check with the
measured rate and a pass verdict. At 100 TB this shape matters: a
suite of 30 checks is still a single scan with map-side partial
aggregation — never one job per check, never a driver-side loop.

Every check is normalized to the same law: ``rate >= threshold`` where
rate ∈ [0, 1]:

- ``completeness(col)`` — non-null fraction of all rows
- ``uniqueness(col)`` — distinct / non-null count
- ``in_range(col, lo, hi)`` — fraction of NON-NULL values inside
  [lo, hi] (null-ness is completeness's job, not double-penalized)
- ``matches(col, regex)`` — fraction of non-null values matching
- ``in_set(col, values)`` — fraction of non-null values in the set
- ``satisfies(name, sql_predicate)`` — fraction of ALL rows where an
  arbitrary boolean SQL expression holds

Empty denominators are vacuously perfect (rate = 1.0) — an empty
table violates no constraint; pair with a ``satisfies('non_empty',
...)`` style row-count check when emptiness itself is a failure.

Rates are rounded (banker's, 6 places) BEFORE the threshold compare in
both engines, so a float-summation ulp can never flip ``passed``
differently across engines. ``checks_sql`` emits the DuckDB twin of
the whole suite from the same check objects — one definition, two
engines, hash-comparable output.

Keep regex patterns to the common RE2/Java subset (character classes,
anchors, quantifiers) — the portability contract of every other regex
in this repo.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import round_even


@dataclass(frozen=True)
class Check:
    kind: str
    column: str
    threshold: float
    # numerator / denominator aggregates: the Spark side is LAZY
    # (zero-arg builders) so suites — and oracle_sql() twins generated
    # from them — can be constructed without an active SparkSession
    num_spark: "Callable[[], Column]"
    den_spark: "Callable[[], Column]"
    num_sql: str
    den_sql: str
    # raw constructor parameters, for the row-level predicate form
    params: tuple = ()

    @property
    def name(self) -> str:
        return f"{self.kind}:{self.column}"


def _sql_quote(v) -> str:
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    return repr(v)


def completeness(col: str, threshold: float = 1.0) -> Check:
    return Check(
        "completeness", col, threshold,
        lambda: F.count(F.col(col)).cast("double"),
        lambda: F.count(F.lit(1)).cast("double"),
        f"CAST(count({col}) AS DOUBLE)",
        "CAST(count(*) AS DOUBLE)",
    )


def uniqueness(col: str, threshold: float = 1.0) -> Check:
    return Check(
        "uniqueness", col, threshold,
        lambda: F.count_distinct(F.col(col)).cast("double"),
        lambda: F.count(F.col(col)).cast("double"),
        f"CAST(count(DISTINCT {col}) AS DOUBLE)",
        f"CAST(count({col}) AS DOUBLE)",
    )


def in_range(col: str, lo, hi, threshold: float = 1.0) -> Check:
    return Check(
        "in_range", col, threshold,
        lambda: F.sum(
            F.when(F.col(col).between(F.lit(lo), F.lit(hi)), 1).otherwise(0)
        ).cast("double"),
        lambda: F.count(F.col(col)).cast("double"),
        f"CAST(count(CASE WHEN {col} BETWEEN {_sql_quote(lo)} AND "
        f"{_sql_quote(hi)} THEN 1 END) AS DOUBLE)",
        f"CAST(count({col}) AS DOUBLE)",
        params=(lo, hi),
    )


def matches(col: str, pattern: str, threshold: float = 1.0) -> Check:
    return Check(
        "matches", col, threshold,
        lambda: F.sum(
            F.when(F.col(col).rlike(pattern), 1).otherwise(0)
        ).cast("double"),
        lambda: F.count(F.col(col)).cast("double"),
        f"CAST(count(CASE WHEN regexp_matches({col}, "
        f"{_sql_quote(pattern)}) THEN 1 END) AS DOUBLE)",
        f"CAST(count({col}) AS DOUBLE)",
        params=(pattern,),
    )


def in_set(col: str, values, threshold: float = 1.0) -> Check:
    vals = list(values)
    if not vals:
        raise ValueError("in_set: empty value set")
    return Check(
        "in_set", col, threshold,
        lambda: F.sum(
            F.when(F.col(col).isin(vals), 1).otherwise(0)
        ).cast("double"),
        lambda: F.count(F.col(col)).cast("double"),
        f"CAST(count(CASE WHEN {col} IN "
        f"({', '.join(_sql_quote(v) for v in vals)}) THEN 1 END) "
        "AS DOUBLE)",
        f"CAST(count({col}) AS DOUBLE)",
        params=(vals,),
    )


def satisfies(name: str, predicate_sql: str, threshold: float = 1.0) -> Check:
    """Arbitrary boolean SQL over the row; keep it in the portable
    SQL subset — the SAME text runs in Spark and the twin."""
    return Check(
        "satisfies", name, threshold,
        lambda: F.sum(
            F.when(F.expr(predicate_sql), 1).otherwise(0)
        ).cast("double"),
        lambda: F.count(F.lit(1)).cast("double"),
        f"CAST(count(CASE WHEN {predicate_sql} THEN 1 END) AS DOUBLE)",
        "CAST(count(*) AS DOUBLE)",
        params=(predicate_sql,),
    )


def row_predicate(check: Check) -> Column:
    """The ROW-LEVEL version of a check's law — the predicate a single
    row must satisfy for the dead-letter/quarantine split. NULL values
    PASS the non-null-scoped checks (in_range/matches/in_set count
    non-null rows only — null-ness is completeness's job), matching
    the suite rates exactly. ``uniqueness`` has no row-level form
    (it is a property of the collection) and raises."""
    col, kind = check.column, check.kind
    if kind == "completeness":
        return F.col(col).isNotNull()
    if kind == "in_range":
        lo, hi = check.params
        return F.col(col).isNull() | F.col(col).between(
            F.lit(lo), F.lit(hi)
        )
    if kind == "matches":
        (pattern,) = check.params
        return F.col(col).isNull() | F.col(col).rlike(pattern)
    if kind == "in_set":
        (vals,) = check.params
        return F.col(col).isNull() | F.col(col).isin(list(vals))
    if kind == "satisfies":
        (predicate_sql,) = check.params
        # NULL predicate = row fails (the rate counts only TRUE)
        return F.coalesce(F.expr(predicate_sql), F.lit(False))
    raise ValueError(
        f"row_predicate: check kind {kind!r} has no row-level form"
    )


def quarantine(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: ``(good, bad)`` where ``bad`` carries a
    ``failed_checks`` array naming every violated check in suite
    order. One projection, no extra scan — the streaming ingest-gate
    shape (route ``bad`` to a quarantine sink, let ``good`` flow).
    All checks must have a row-level form (no ``uniqueness``)."""
    preds = [(c.name, row_predicate(c)) for c in checks]
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(p, F.lit(False)), F.lit(name))
                for name, p in preds
            ]
        )
    )
    tagged = df.withColumn("failed_checks", failed)
    good = tagged.filter(F.size("failed_checks") == 0).drop(
        "failed_checks"
    )
    bad = tagged.filter(F.size("failed_checks") > 0)
    return good, bad


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate the suite in ONE aggregation pass. Returns one row per
    check: (check, column, rate, threshold, passed), suite order
    irrelevant (output is a set keyed by check+column)."""
    if not checks:
        raise ValueError("run_checks: empty suite")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"run_checks: duplicate checks in suite: {names}")
    aggs = []
    for i, c in enumerate(checks):
        aggs.append(c.num_spark().alias(f"_n{i}"))
        aggs.append(c.den_spark().alias(f"_d{i}"))
    row = df.agg(*aggs)
    structs = []
    for i, c in enumerate(checks):
        rate = round_even(
            F.coalesce(
                F.col(f"_n{i}")
                / F.nullif(F.col(f"_d{i}"), F.lit(0.0)),
                F.lit(1.0),  # vacuous: no rows to violate
            ),
            6,
        )
        structs.append(
            F.struct(
                F.lit(c.kind).alias("check"),
                F.lit(c.column).alias("column"),
                rate.alias("rate"),
                F.lit(float(c.threshold)).alias("threshold"),
                (rate >= F.lit(float(c.threshold))).alias("passed"),
            )
        )
    return (
        row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
    )


def checks_sql(table: str, checks: list[Check]) -> str:
    """DuckDB twin of ``run_checks`` from the SAME suite objects."""
    agg_items = []
    for i, c in enumerate(checks):
        agg_items.append(f"{c.num_sql} AS _n{i}")
        agg_items.append(f"{c.den_sql} AS _d{i}")
    rows = []
    for i, c in enumerate(checks):
        rate = (
            f"round_even(coalesce(_n{i} / nullif(_d{i}, 0.0), 1.0), 6)"
        )
        rows.append(
            f"SELECT '{c.kind}' AS \"check\", "
            f"{_sql_quote(c.column)} AS \"column\", {rate} AS rate, "
            f"CAST({c.threshold!r} AS DOUBLE) AS threshold, "
            f"{rate} >= CAST({c.threshold!r} AS DOUBLE) AS passed "
            "FROM a"
        )
    return (
        f"WITH a AS (SELECT {', '.join(agg_items)} FROM {table}) "
        + " UNION ALL ".join(rows)
    )
