"""Closed-form distributed regression — north-star extension.

OLS by normal equations over SUFFICIENT STATISTICS: one aggregation
pass computes the Gram-matrix sums (n, Σx_i, Σx_i·x_j, Σx_i·y, Σy,
Σy²) with map-side partials, then the coefficient solve is a
constant-size expression over that single row. No MLlib, no iteration,
no driver-side data path — the fit of a 100 TB table costs exactly one
scan + one shuffle-to-one-row, which is the minimum any estimator can
pay (the "sufficient statistics" pattern every scalable analytics
engine uses for linear models).

Determinism contract (what makes this oracle-able cross-engine): with
INTEGER features the sums are exact BIGINTs; they convert exactly to
float64 (all < 2^53), and the Cramer solve is then a fixed IEEE-754
expression tree evaluated identically by Spark and DuckDB — same
formula, same floats, banker's-rounded at the end.

For k features beyond the closed-form tiers, fit via the same
sufficient-stats row solved with numpy on the driver (a k×k solve on
ONE row is not a driver data path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import round_even


def gram_sums(
    df: DataFrame, y_col: str, x_cols: list[str]
) -> DataFrame:
    """The one-row sufficient-statistics frame for OLS with intercept:
    n, Σx_i, Σy, Σx_i·x_j (i<=j), Σx_i·y, Σy². Input columns must be
    integral (the determinism contract); products accumulate as
    BIGINT, so each Σ|x_i·x_j| must stay below 2^63 — true for any
    count/length-style feature at any corpus size that fits a long."""
    aggs = [F.count(F.lit(1)).alias("n")]
    cols = [F.col(c).cast("long") for c in x_cols]
    y = F.col(y_col).cast("long")
    for i, ci in enumerate(cols):
        aggs.append(F.sum(ci).alias(f"sx{i}"))
        aggs.append(F.sum(ci * y).alias(f"sx{i}y"))
        for j, cj in enumerate(cols[i:], start=i):
            aggs.append(F.sum(ci * cj).alias(f"sx{i}x{j}"))
    aggs.append(F.sum(y).alias("sy"))
    aggs.append(F.sum(y * y).alias("syy"))
    return df.agg(*aggs)


def _cramer2(sums: DataFrame, digits: int) -> DataFrame:
    """Solve the 3×3 normal system (intercept + 2 features) by Cramer's
    rule as Catalyst double expressions over the sufficient-stats row —
    never collected, never iterated."""
    d = lambda name: F.col(name).cast("double")
    n, s0, s1 = d("n"), d("sx0"), d("sx1")
    s00, s01, s11 = d("sx0x0"), d("sx0x1"), d("sx1x1")
    sy, s0y, s1y, syy = d("sy"), d("sx0y"), d("sx1y"), d("syy")

    def det3(
        a: Column, b: Column, c: Column,
        e: Column, f_: Column, g: Column,
        h: Column, i: Column, j: Column,
    ) -> Column:
        return (
            a * (f_ * j - g * i) - b * (e * j - g * h) + c * (e * i - f_ * h)
        )

    # X^T X = [[n, s0, s1], [s0, s00, s01], [s1, s01, s11]];  X^T y = [sy, s0y, s1y]
    det = det3(n, s0, s1, s0, s00, s01, s1, s01, s11)
    b0 = det3(sy, s0, s1, s0y, s00, s01, s1y, s01, s11) / det
    b1 = det3(n, sy, s1, s0, s0y, s01, s1, s1y, s11) / det
    b2 = det3(n, s0, sy, s0, s00, s0y, s1, s01, s1y) / det
    # R^2 from the same sums: SSE = Σy² - b·(X^T y), SST = Σy² - (Σy)²/n
    sse = syy - (b0 * sy + b1 * s0y + b2 * s1y)
    sst = syy - sy * sy / n
    return sums.select(
        F.col("n"),
        round_even(b0, digits).alias("beta0"),
        round_even(b1, digits).alias("beta1"),
        round_even(b2, digits).alias("beta2"),
        round_even(F.lit(1.0) - sse / sst, digits).alias("r2"),
    )


def ols_fit2(
    df: DataFrame, y_col: str, x_cols: list[str], digits: int = 6
) -> DataFrame:
    """OLS with intercept over two integral features, entirely inside
    the engine: one aggregation (map-side partial) to the Gram row,
    Cramer's rule as column expressions on top. Returns one row:
    (n, beta0, beta1, beta2, r2) — beta0 the intercept."""
    if len(x_cols) != 2:
        raise ValueError("ols_fit2 takes exactly two feature columns")
    return _cramer2(gram_sums(df, y_col, x_cols), digits)


def ols_fit(
    df: DataFrame, y_col: str, x_cols: list[str]
) -> list[float]:
    """General-k OLS: the same single-pass sufficient statistics, then
    a k+1 × k+1 numpy solve on the ONE collected row (constant-size —
    not a driver data path). Returns [beta0 (intercept), beta1, ...]."""
    import numpy as np

    row = gram_sums(df, y_col, x_cols).collect()[0].asDict()
    k = len(x_cols)
    xtx = np.zeros((k + 1, k + 1))
    xty = np.zeros(k + 1)
    xtx[0, 0] = row["n"]
    xty[0] = row["sy"]
    for i in range(k):
        xtx[0, i + 1] = xtx[i + 1, 0] = row[f"sx{i}"]
        xty[i + 1] = row[f"sx{i}y"]
        for j in range(i, k):
            xtx[i + 1, j + 1] = xtx[j + 1, i + 1] = row[f"sx{i}x{j}"]
    return list(np.linalg.solve(xtx, xty))


def ols_fit2_sql(
    table: str, y_col: str, x_cols: list[str], digits: int = 6
) -> str:
    """DuckDB twin of :func:`ols_fit2` — identical sums (BIGINT-exact),
    identical Cramer expression tree in float64, identical rounding."""
    from dataset_grouper_spark.functions.hashing import round_even_sql

    x0, x1, y = x_cols[0], x_cols[1], y_col
    det3 = (
        lambda a, b, c, e, f, g, h, i, j:
        f"({a}*({f}*{j} - {g}*{i}) - {b}*({e}*{j} - {g}*{h})"
        f" + {c}*({e}*{i} - {f}*{h}))"
    )
    names = dict(
        n="CAST(n AS DOUBLE)", s0="CAST(sx0 AS DOUBLE)",
        s1="CAST(sx1 AS DOUBLE)", s00="CAST(sx0x0 AS DOUBLE)",
        s01="CAST(sx0x1 AS DOUBLE)", s11="CAST(sx1x1 AS DOUBLE)",
        sy="CAST(sy AS DOUBLE)", s0y="CAST(sx0y AS DOUBLE)",
        s1y="CAST(sx1y AS DOUBLE)", syy="CAST(syy AS DOUBLE)",
    )
    m = names
    det = det3(m["n"], m["s0"], m["s1"], m["s0"], m["s00"], m["s01"],
               m["s1"], m["s01"], m["s11"])
    b0 = f"({det3(m['sy'], m['s0'], m['s1'], m['s0y'], m['s00'], m['s01'], m['s1y'], m['s01'], m['s11'])} / {det})"
    b1 = f"({det3(m['n'], m['sy'], m['s1'], m['s0'], m['s0y'], m['s01'], m['s1'], m['s1y'], m['s11'])} / {det})"
    b2 = f"({det3(m['n'], m['s0'], m['sy'], m['s0'], m['s00'], m['s0y'], m['s1'], m['s01'], m['s1y'])} / {det})"
    sse = f"({m['syy']} - ({b0}*{m['sy']} + {b1}*{m['s0y']} + {b2}*{m['s1y']}))"
    sst = f"({m['syy']} - {m['sy']}*{m['sy']}/{m['n']})"
    return f"""
        WITH g AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST({x0} AS BIGINT)) AS BIGINT) AS sx0,
                   CAST(sum(CAST({x1} AS BIGINT)) AS BIGINT) AS sx1,
                   CAST(sum(CAST({x0} AS BIGINT) * CAST({x0} AS BIGINT)) AS BIGINT) AS sx0x0,
                   CAST(sum(CAST({x0} AS BIGINT) * CAST({x1} AS BIGINT)) AS BIGINT) AS sx0x1,
                   CAST(sum(CAST({x1} AS BIGINT) * CAST({x1} AS BIGINT)) AS BIGINT) AS sx1x1,
                   CAST(sum(CAST({y} AS BIGINT)) AS BIGINT) AS sy,
                   CAST(sum(CAST({x0} AS BIGINT) * CAST({y} AS BIGINT)) AS BIGINT) AS sx0y,
                   CAST(sum(CAST({x1} AS BIGINT) * CAST({y} AS BIGINT)) AS BIGINT) AS sx1y,
                   CAST(sum(CAST({y} AS BIGINT) * CAST({y} AS BIGINT)) AS BIGINT) AS syy
            FROM {table}
        )
        SELECT n,
               {round_even_sql(b0, digits)} AS beta0,
               {round_even_sql(b1, digits)} AS beta1,
               {round_even_sql(b2, digits)} AS beta2,
               {round_even_sql(f"(1.0 - {sse}/{sst})", digits)} AS r2
        FROM g
    """
