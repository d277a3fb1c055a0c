"""Group keyers — every example gets a ``group_id`` column.

The reference models keying as ``GetKeyFn = Callable[[Example], bytes]``
(reference ``dataset_grouper/types.py:31``) applied per example via a
Beam Map (``beam_transforms.py:103``). Here a keyer is a Catalyst
``Column`` expression — JVM-side, codegen'd, no Python in the hot path.
``group_id`` is StringType (the reference's raw ``bytes`` keys are all
utf-8 text in practice; see SURVEY §7 "Hard parts").

Keyers mirrored from the reference's example zoo:
- ``by_feature``   <- examples/datasets/group_by_feature.py:75-81
- ``url_domain``   <- examples/datasets/group_c4.py:79-83
- ``random``       <- examples/datasets/group_randomly.py:75-79
- ``dirichlet``    <- examples/datasets/group_by_dirichlet_process.py:130-145
                      (scheme of arXiv:1909.06335)

Determinism: the reference's random/Dirichlet keyers are unseeded and
order-dependent. Ours are pure functions of row content (multiplicative
hashing), so the same row always lands in the same group on any cluster
size — required for the correctness oracle and for reproducible
repartitions at 100 TB.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataset_grouper_spark.localrel import local_frame

GROUP_COL = "group_id"
GROUP_BYTES_COL = "group_key_bytes"

# Knuth's multiplicative constant; x * KNUTH mod 2^32 scrambles an
# integer id into a uniform 32-bit value identically in any SQL engine
# (pure int64 arithmetic — no engine-specific hash function).
_KNUTH = 2654435761
_M32 = 4294967296  # 2^32


def with_group_key(df: DataFrame, key: Column, binary: bool = False) -> DataFrame:
    """Attach the group key (== KeyExamples, beam_transforms.py:103).

    With ``binary=True`` the key expression must be BinaryType and is
    kept byte-exact in ``group_key_bytes`` (the reference's ``GetKeyFn
    -> bytes`` contract, types.py:31 — non-utf8 keys representable),
    while ``group_id`` carries the injective escaped-string twin
    (:func:`escape_bytes_key`) used for layout/partitioning.
    """
    if binary:
        return df.withColumn(GROUP_BYTES_COL, key).withColumn(
            GROUP_COL, escape_bytes_key(F.col(GROUP_BYTES_COL))
        )
    return df.withColumn(GROUP_COL, key.cast("string"))


def escape_bytes_key(b: Column) -> Column:
    """Injective BinaryType -> StringType escaping for layout.

    Valid-utf8 byte keys that are filesystem/CSV-safe (printable, no
    ``/``, separators, or the escape marker) pass through verbatim —
    so text keys keep the exact layout of the string path. Anything
    else (invalid utf-8, control bytes, collision with the marker)
    becomes ``%x:`` + uppercase hex. Pure Catalyst; reversible via
    :func:`unescape_bytes_key`.
    """
    # try_validate_utf8: NULL for invalid byte sequences (ANSI decode()
    # would throw, plain cast would silently substitute U+FFFD)
    s = F.try_validate_utf8(b)
    safe = (
        s.isNotNull()
        & ~s.rlike(r"[\x00-\x1f\x7f/\\,|]")
        & ~s.startswith("%x:")
    )
    return F.when(safe, s).otherwise(F.concat(F.lit("%x:"), F.hex(b)))


def unescape_bytes_key(s: Column) -> Column:
    """StringType -> BinaryType inverse of escape_bytes_key."""
    return F.when(
        s.startswith("%x:"), F.unhex(F.substring(s, 4, 2**30))
    ).otherwise(F.encode(s, "UTF-8"))


def by_feature(col: str | Column) -> Column:
    """Key = a feature's value, stringified.

    Mirrors group_by_feature.py:75-81 (string features used raw, other
    dtypes str()-ed).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def constant(value: str) -> Column:
    """Single-group keyer (the reference's test default key)."""
    return F.lit(value)


def composite(*cols: str | Column, sep: str = "|") -> Column:
    """Multi-feature key: features joined with a separator (the
    reference's GetKeyFn can close over several features; relationally
    this is just concat_ws)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *[c.cast("string") for c in cs])


def scramble(id_col: str | Column) -> Column:
    """Deterministic uniform 32-bit scramble of an integer id column.

    Computes ``(id mod 2^32) * KNUTH mod 2^32`` overflow-safely for any
    int64 id via a 16-bit split multiply — ``a*K mod 2^32 =
    (a0*K + ((a1*K) mod 2^16) * 2^16) mod 2^32`` with ``a = a1*2^16 +
    a0`` — every intermediate stays under 2^48, so no silent wraparound
    (non-ANSI) or overflow error (ANSI / Spark 4 default) at scale, and
    results are identical in any SQL engine (the DuckDB twins compute
    the same value in HUGEINT)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    a = F.pmod(c.cast("long"), F.lit(_M32))
    a0 = a.bitwiseAND(F.lit(0xFFFF))
    a1 = F.shiftright(a, 16)
    low = a0 * F.lit(_KNUTH)
    high = F.pmod(a1 * F.lit(_KNUTH), F.lit(1 << 16)) * F.lit(1 << 16)
    return F.pmod(low + high, F.lit(_M32))


def random(id_col: str | Column, num_groups: int) -> Column:
    """Uniform-random group in [0, num_groups), deterministic per row.

    Mirrors group_randomly.py:75-79 (``random.randint(0, N-1)`` per
    example) but seeded by row identity instead of RNG state, so the
    assignment is reproducible and SQL-expressible.
    """
    return F.pmod(scramble(id_col), F.lit(num_groups)).cast("string")


def url_domain(url_col: str | Column) -> Column:
    """Key = URL host. Mirrors group_c4.py:79-83 (urlparse().netloc).

    ``parse_url`` is a built-in Catalyst expression — no UDF.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.parse_url(c, F.lit("HOST"))


def uniform01(id_col: str | Column) -> Column:
    """Deterministic uniform double in [0,1) from an integer id."""
    return scramble(id_col) / F.lit(float(_M32))


def dirichlet_matrix(
    num_labels: int, num_groups: int, alpha: float, seed: int
) -> np.ndarray:
    """The (num_labels x num_groups) categorical matrix of the
    Dirichlet-process keyer, cumulatively summed per label row.

    Mirrors group_by_dirichlet_process.py:130-137: one Dirichlet(alpha)
    draw per label giving that label's distribution over groups.
    """
    rng = np.random.default_rng(seed)
    probs = rng.dirichlet([alpha] * num_groups, size=num_labels)
    return np.cumsum(probs, axis=1)


def dirichlet(
    spark: SparkSession,
    df: DataFrame,
    label_col: str,
    id_col: str,
    num_labels: int,
    num_groups: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Dirichlet-process keyer: sample each row's group from its label's
    categorical distribution (group_by_dirichlet_process.py:138-145).

    Implementation: broadcast-join the tiny (label, group, cum_lo,
    cum_hi) table and pick the interval containing the row's
    deterministic uniform — an inverse-CDF sample with zero Python in
    the row path. The prob matrix is O(labels*groups) and broadcast;
    the join never shuffles the fact table.

    Contract: ``label_col`` values must be integers in
    ``[0, num_labels)`` — rows outside the range (or NULL) match no
    interval and are DROPPED by the inner join (the off-by-one
    ``num_labels`` mistake silently shrinks the corpus; count the
    output when labels come from unvalidated data).
    """
    cum = dirichlet_matrix(num_labels, num_groups, alpha, seed)
    rows = []
    for lbl in range(num_labels):
        lo = 0.0
        for g in range(num_groups):
            # pin the LAST interval's hi to exactly 1.0: the float
            # cumsum can undershoot by O(groups*eps), and a row whose
            # uniform lands in that gap would silently vanish through
            # the inner join (uniform01's max is 1 - 2.3e-10)
            hi = 1.0 if g == num_groups - 1 else float(cum[lbl, g])
            rows.append((lbl, g, lo, hi))
            lo = hi
    intervals = local_frame(spark, 
        rows, "label_key int, dp_group int, cum_lo double, cum_hi double"
    )
    u = uniform01(id_col)
    joined = df.withColumn("_u", u).join(
        F.broadcast(intervals),
        (F.col(label_col).cast("int") == F.col("label_key"))
        & (F.col("_u") >= F.col("cum_lo"))
        & (F.col("_u") < F.col("cum_hi")),
        "inner",
    )
    return joined.withColumn(GROUP_COL, F.col("dp_group").cast("string")).drop(
        "label_key", "dp_group", "cum_lo", "cum_hi", "_u"
    )


def dirichlet_interval_values_sql(
    num_labels: int, num_groups: int, alpha: float, seed: int
) -> str:
    """The same (label, group, lo, hi) intervals as a SQL VALUES list,
    printed with full double precision — lets an external SQL oracle
    reproduce the keyer bit-for-bit.
    """
    cum = dirichlet_matrix(num_labels, num_groups, alpha, seed)
    parts = []
    for lbl in range(num_labels):
        lo = 0.0
        for g in range(num_groups):
            # same last-interval pin as the Spark side (lock-step)
            hi = 1.0 if g == num_groups - 1 else float(cum[lbl, g])
            parts.append(f"({lbl}, {g}, {lo!r}, {hi!r})")
            lo = hi
    return ", ".join(parts)
