"""Plan inspection helpers — keeping physical plans honest at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what .explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_no_cartesian(df: DataFrame) -> None:
    """Guard: fail fast if Catalyst planned an unintended cartesian
    product (a 100 TB foot-gun)."""
    txt = plan_text(df, "simple")
    if "CartesianProduct" in txt:
        raise AssertionError(f"plan contains CartesianProduct:\n{txt}")


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — the metric to
    minimize (every one is a full network pass at 100 TB)."""
    return plan_text(df, "simple").count("Exchange")
