"""Differentially-private group releases — seeded Laplace/geometric
noise as Catalyst expressions.

The reference lives in the private-federated-analytics world
(google-parfait; its group structure exists so per-user data can be
processed under privacy budgets), but the public repo releases RAW
per-group counts (count_utils.py:29-47).  This module adds the release
mechanism those pipelines need: per-group counts/sums with calibrated
Laplace noise, ε-DP under the usual add/remove-one-row adjacency when
``sensitivity`` bounds one row's contribution (1 for counts; for sums,
clamp the value column first — the caller's obligation, stated here
rather than hidden).

Determinism, stated honestly: production DP REQUIRES fresh randomness
per release; a seeded mechanism is only private across the seed's
secrecy and a single release.  The seed exists so results are
reproducible and cross-engine testable (the DuckDB oracle twin
regenerates the identical noise in closed form); pass ``seed=None``
for a fresh random seed at plan time.

Noise path: u = md5(group || seed) mapped to (0,1), then the Laplace
inverse CDF ``x = -b * sign(u-0.5) * ln(1 - 2|u-0.5|)`` — pure
Catalyst (md5/conv/ln), no UDF, identical expression shape on both
engines (1-ulp libm drift absorbed by rounding the release to 6
decimals).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits — exactly representable in a double
_UNIFORM_BITS = 13


def _uniform01(key: Column, seed: int, tag: str = "") -> Column:
    """Deterministic uniform in (0,1): 52 md5 bits / 2^52, nudged off
    exact 0 so ln(1-2|u-.5|) stays finite. ``tag`` domain-separates
    MECHANISMS sharing a seed: without it, a joint count+sum release
    would draw ONE noise dimension for two statistics (the sum noise a
    scalar multiple of the count noise), letting anyone who knows a
    group's true count recover its true sum exactly."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit(f"|dp{tag}{seed}"))), 1, _UNIFORM_BITS
        ),
        16,
        10,
    ).cast("double")
    u = h / F.lit(float(1 << (4 * _UNIFORM_BITS)))
    return F.greatest(F.least(u, F.lit(1.0 - 1e-12)), F.lit(1e-12))


def laplace_noise(
    key: Column, scale: float, seed: int, tag: str = ""
) -> Column:
    """Seeded Laplace(0, scale) noise keyed by ``key`` (inverse-CDF of
    the md5 uniform); ``tag`` separates mechanisms (see _uniform01)."""
    u = _uniform01(key, seed, tag)
    centered = u - F.lit(0.5)
    return (
        -F.lit(scale)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )


def laplace_noise_sql(
    key_sql: str, scale: float, seed: int, tag: str = ""
) -> str:
    """DuckDB twin of :func:`laplace_noise` — identical expression
    shape so the doubles agree to the rounding digit."""
    u = (
        f"greatest(least((('0x' || substr(md5({key_sql} || '|dp{tag}{seed}'),"
        f" 1, {_UNIFORM_BITS}))::BIGINT)"
        f" / CAST({1 << (4 * _UNIFORM_BITS)} AS DOUBLE),"
        f" 1.0 - 1e-12), 1e-12)"
    )
    c = f"({u} - 0.5)"
    return f"(-({scale}) * sign({c}) * ln(1.0 - 2.0 * abs({c})))"


def dp_group_counts(
    df: DataFrame,
    key_col: str,
    epsilon: float,
    seed: int | None = 42,
    sensitivity: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """ε-DP per-group counts: true count + Laplace(sensitivity/ε)
    noise, rounded for release.  One partial-aggregable shuffle; the
    noise is a per-group scalar expression on the aggregated frame
    (O(groups) noise evaluations, not O(rows)).

    Caveat the release story honestly: this protects rows WITHIN
    groups; releasing WHICH groups exist is its own leak — restrict to
    a public group list or add thresholding before publishing."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if seed is None:
        seed = random.SystemRandom().randrange(1 << 62)
    scale = sensitivity / epsilon
    agg = df.groupBy(F.col(key_col).cast("string").alias("group_id")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    return agg.select(
        "group_id",
        F.round(
            F.col("true_count")
            + laplace_noise(F.col("group_id"), scale, seed, tag="c"),
            round_digits,
        ).alias("dp_count"),
    )


def dp_group_sums(
    df: DataFrame,
    key_col: str,
    value_col: str,
    epsilon: float,
    clamp: float,
    seed: int | None = 42,
    round_digits: int = 6,
) -> DataFrame:
    """ε-DP per-group sums with explicit per-row clamping to
    ``[-clamp, clamp]`` (the clamp IS the sensitivity — unclamped sums
    have unbounded sensitivity and no ε guarantee)."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if seed is None:
        seed = random.SystemRandom().randrange(1 << 62)
    scale = clamp / epsilon
    clamped = F.greatest(
        F.least(F.col(value_col).cast("double"), F.lit(float(clamp))),
        F.lit(float(-clamp)),
    )
    agg = df.groupBy(F.col(key_col).cast("string").alias("group_id")).agg(
        F.sum(clamped).alias("true_sum")
    )
    return agg.select(
        "group_id",
        F.round(
            F.col("true_sum")
            + laplace_noise(F.col("group_id"), scale, seed, tag="s"),
            round_digits,
        ).alias("dp_sum"),
    )


def thresholded_group_counts(
    df: DataFrame, key_col: str, min_group_size: int
) -> DataFrame:
    """k-anonymity-style suppression: release only groups with at
    least ``min_group_size`` rows — the companion to the DP caveat
    above (noise protects values; suppression protects the EXISTENCE
    of small groups).  A HAVING filter, so Catalyst runs it after the
    partial-aggregated count."""
    return (
        df.groupBy(F.col(key_col).cast("string").alias("group_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_group_size)
    )


def geometric_noise(key: Column, epsilon: float, seed: int) -> Column:
    """Seeded two-sided geometric noise (the DISCRETE Laplace — Ghosh
    et al. 2009's universally-optimal mechanism for integer counts):
    the difference of two Geometric(1-alpha) draws with
    alpha = exp(-epsilon), each from a seeded md5 uniform via inverse
    CDF (floor(ln u / ln alpha)).  Integer-valued, so the released
    count needs no rounding-parity care at all."""
    if epsilon <= 0:
        # eps=0 would divide by -0.0: floor(+inf) -> Long.MAX nonsense
        # cancelling to ZERO noise — an exact release masquerading as
        # a DP one
        raise ValueError("epsilon must be positive")
    ln_alpha = -float(epsilon)  # ln(alpha) where alpha = exp(-eps)
    u1 = _uniform01(F.concat(key, F.lit("|g1")), seed)
    u2 = _uniform01(F.concat(key, F.lit("|g2")), seed)
    g1 = F.floor(F.log(u1) / F.lit(ln_alpha)).cast("long")
    g2 = F.floor(F.log(u2) / F.lit(ln_alpha)).cast("long")
    return g1 - g2


def geometric_noise_sql(key_sql: str, epsilon: float, seed: int) -> str:
    """DuckDB twin of :func:`geometric_noise` — identical expression
    shape (the floor of a libm quotient; both engines evaluate the
    same double, boundary flips would need an exact-ulp tie)."""

    def u(tag: str) -> str:
        k = f"({key_sql} || '|{tag}')"
        return (
            f"greatest(least((('0x' || substr(md5({k} || '|dp{seed}'),"
            f" 1, {_UNIFORM_BITS}))::BIGINT)"
            f" / CAST({1 << (4 * _UNIFORM_BITS)} AS DOUBLE),"
            f" 1.0 - 1e-12), 1e-12)"
        )

    ln_alpha = -float(epsilon)
    return (
        f"(CAST(floor(ln({u('g1')}) / ({ln_alpha})) AS BIGINT)"
        f" - CAST(floor(ln({u('g2')}) / ({ln_alpha})) AS BIGINT))"
    )


def dp_group_counts_geometric(
    df: DataFrame,
    key_col: str,
    epsilon: float,
    seed: int | None = 42,
) -> DataFrame:
    """ε-DP per-group counts with the geometric mechanism — INTEGER
    releases (no float rounding anywhere), same privacy accounting as
    Laplace for sensitivity-1 counts."""
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    if seed is None:
        seed = random.SystemRandom().randrange(1 << 62)
    agg = df.groupBy(F.col(key_col).cast("string").alias("group_id")).agg(
        F.count(F.lit(1)).alias("true_count")
    )
    return agg.select(
        "group_id",
        (
            F.col("true_count")
            + geometric_noise(F.col("group_id"), epsilon, seed)
        ).alias("dp_count"),
    )
