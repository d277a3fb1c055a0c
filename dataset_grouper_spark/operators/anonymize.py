"""k-anonymity / l-diversity enforcement — privacy-side curation for
training corpora (the release-gate companion to the DP aggregates in
functions/dp.py and the PII redaction pass in functions/quality.py).

A row is k-anonymous w.r.t. a set of QUASI-IDENTIFIER columns when at
least k rows share its exact quasi-identifier tuple (its "equivalence
class"): a joiner holding external attributes can then pin any record
only to a crowd of >= k. Enforcement here is SUPPRESSION with optional
caller-supplied GENERALIZATION: generalize first (coarser buckets make
bigger classes — the caller picks the recoding, e.g. truncate a zip,
bucket a salary), then drop every row whose class is still smaller
than k. That split keeps the operator deterministic and cross-engine
oracle-able: no iterative search heuristics hidden inside (Mondrian /
full-domain ladders are POLICY, built on top of these primitives).

l-diversity is the follow-up check: a k-anonymous class is still
leaky when everyone in it shares the same SENSITIVE value (the
homogeneity attack), so a class also needs >= l distinct sensitive
values before release.

At 100 TB: one shuffle on the quasi-identifier tuple (a groupBy
count), suppression as a broadcast-or-shuffle semi join of rows
against surviving classes — Catalyst/AQE picks; a pathologically hot
class is an AQE skew case, not a correctness one. No windows over the
whole table, no driver data path.

No reference analogue (the reference has no joins — SURVEY §2); this
is the privacy gate a corpus passes before leaving the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _classes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    )


def k_anonymity_stats(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """Audit frame: every equivalence class with its size, smallest
    first — read the head to see what a given k would suppress."""
    return _classes(df, quasi_cols).orderBy(
        F.asc("class_size"), *[F.asc(c) for c in quasi_cols]
    )


def k_anonymize(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    generalize: dict[str, Column] | None = None,
) -> DataFrame:
    """Rows surviving k-anonymity suppression: apply the caller's
    generalization recodings (column -> replacement expression, e.g.
    ``{"zip": F.substring("zip", 1, 3)}``), then keep only rows whose
    generalized quasi-identifier class has >= k members. Returns the
    GENERALIZED rows (releasing the raw values would defeat the
    recoding). NULL quasi values form their own class (NULL is a
    value to a joiner)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    for c in quasi_cols:
        if c not in df.columns:
            raise ValueError(f"k_anonymize: quasi column {c!r} not in frame")
    gen = df.withColumns(dict(generalize or {}))
    # NULL-safe class key: groupBy treats NULLs as one group (wanted),
    # but the semi join below must too — join on <=> via the count
    # frame's columns
    sizes = _classes(gen, quasi_cols).filter(F.col("class_size") >= k)
    cond = None
    for c in quasi_cols:
        e = gen[c].eqNullSafe(sizes[c])
        cond = e if cond is None else cond & e
    return gen.join(sizes, cond, "left_semi")


def l_diversity_check(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Per equivalence class: size, number of DISTINCT sensitive
    values, and whether it meets l-diversity — the homogeneity-attack
    audit run after (or instead of) suppression. One shuffle."""
    if l < 1:
        raise ValueError("l must be >= 1")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        (F.count_distinct(F.col(sensitive_col)) >= l).alias("diverse"),
    )


def k_anonymize_sql(
    table_sql: str,
    quasi_cols: list[str],
    k: int,
    generalize_sql: dict[str, str] | None = None,
) -> str:
    """DuckDB twin of :func:`k_anonymize` — same recodings, same
    NULL-is-a-value class key, same >= k suppression."""
    gen = dict(generalize_sql or {})
    replace = (
        " REPLACE ("
        + ", ".join(f"{e} AS {c}" for c, e in sorted(gen.items()))
        + ")"
        if gen
        else ""
    )
    on = " AND ".join(
        f"g.{c} IS NOT DISTINCT FROM s.{c}" for c in quasi_cols
    )
    qlist = ", ".join(quasi_cols)
    return f"""
    WITH gen AS (
      SELECT *{replace} FROM ({table_sql})
    ),
    sizes AS (
      SELECT {qlist}, count(*) AS class_size
      FROM gen GROUP BY {qlist}
      HAVING count(*) >= {k}
    )
    SELECT g.* FROM gen g
    JOIN sizes s ON {on}
    """
