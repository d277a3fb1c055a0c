"""Fixed-memory sketches, relationally: count-min and HyperLogLog.

The count-min sketch (Cormode & Muthukrishnan 2005) answers "how often
does THIS key occur" with ``depth × width`` integer cells regardless of
key cardinality — the heavy-hitter / hot-key primitive when an exact
groupBy's result would itself be too big to hold.

HyperLogLog (Flajolet et al. 2007) answers "how many DISTINCT keys"
with ``m = 2^p`` 6-bit registers. Spark's ``approx_count_distinct`` is
already HLL++ — the point of ``hll_build``/``hll_estimate`` is what the
built-in cannot give you: a MATERIALIZED register table you can store,
ship, and MERGE across days/partitions/engines (max per register —
lossless union, the property that makes distinct-counting work
incrementally at 100 TB), with the engine-portable md5 hash idiom so
the same registers — and therefore bit-identical estimates — come out
of any SQL engine. The estimator is the classic one: harmonic mean of
register ranks with the small-range linear-counting correction.

Representation: a (row, bucket, cnt) DataFrame — depth hash rows, each
key hashed into one bucket per row, counts summed. Everything about it
is relational:

- **build** is ONE aggregation: explode each input row into its depth
  (row, bucket) cells, groupBy-sum (partial aggregation keeps the
  explosion map-side; the shuffle carries at most depth × width rows
  per partition).
- **merge** is union + re-sum — sketches built on different partitions
  of the data (or different days) combine losslessly, the property
  that makes sketches work at 100 TB.
- **estimate** is a join: each probe key's depth cells, min over the
  matched counts (a missing cell is 0 — the key was never seen).

Hashing is the repo's engine-portable md5 idiom (same literal math in
the DuckDB twin), so estimates are bit-identical across engines and the
classic guarantees hold deterministically for a given dataset:
estimate >= true count (always), estimate <= true + ε·N with
probability 1-δ for width = ⌈e/ε⌉, depth = ⌈ln(1/δ)⌉.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
    round_even,
)


def _bucket(key_str, row_idx: int, width: int):
    # the shared engine-portable hash idiom — one definition repo-wide.
    # NULL keys are first-class: concat propagates NULL, so an
    # un-coalesced key would hash to a NULL bucket, its build rows
    # would land in NULL cells and the estimate join would never match
    # (NULL == NULL is false) — a NULL probe would return est=0 even
    # when present, breaking the est >= truth guarantee. The encoding
    # 'k' || key for non-null vs the bare 'n' for NULL is injective
    # (prefixes differ), so no real key can collide with the NULL slot.
    tagged = F.coalesce(F.concat(F.lit("k"), key_str), F.lit("n"))
    return F.pmod(
        md5_long(F.concat(tagged, F.lit(f":{row_idx}"))), F.lit(width)
    )


def cms_build(
    df: DataFrame, key_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """One-pass sketch build: (row, bucket, cnt), at most depth × width
    rows total."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    key_str = F.col(key_col).cast("string")
    cells = df.select(
        F.posexplode(
            F.array(*[_bucket(key_str, i, width) for i in range(depth)])
        ).alias("row", "bucket")
    )
    return (
        cells.groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # parameters ride the sketch so estimate/merge can detect a
        # mismatched width/depth instead of silently underestimating
        .withColumn("_width", F.lit(width))
        .withColumn("_depth", F.lit(depth))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Lossless combine of sketches built with the SAME width/depth
    (validated from the parameter columns each sketch carries)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    merged = out.groupBy("row", "bucket", "_width", "_depth").agg(
        F.sum("cnt").alias("cnt")
    )
    params = merged.select("_width", "_depth").distinct().collect()
    if len(params) > 1:
        raise ValueError(
            f"cannot merge sketches with different parameters: "
            f"{sorted((r['_width'], r['_depth']) for r in params)}"
        )
    return merged.select("row", "bucket", "cnt", "_width", "_depth")


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    width: int,
    depth: int,
) -> DataFrame:
    """Point estimates for every row of ``probes``: min over the key's
    depth cells. Returns (key_col, est). The sketch side is at most
    depth × width rows — always broadcastable; no hint needed, size-
    based planning gets it right. Raises if ``width``/``depth`` do not
    match what the sketch was built with — a silent mismatch would
    return underestimates, violating the est >= truth guarantee."""
    built = sketch.select("_width", "_depth").first()
    if built is not None and (
        built["_width"] != width or built["_depth"] != depth
    ):
        raise ValueError(
            f"sketch was built with width={built['_width']}, "
            f"depth={built['_depth']}; estimate called with "
            f"width={width}, depth={depth}"
        )
    sketch = sketch.select("row", "bucket", "cnt")
    key_str = F.col(key_col).cast("string")
    cells = probes.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[_bucket(key_str, i, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        cells.join(sketch, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
        )
    )


def _hll_alpha(m: int) -> float:
    # bias-correction constants from the HLL paper (Flajolet 2007 §4)
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_check_p(p: int) -> int:
    if not 4 <= p <= 16:
        raise ValueError(f"hll: p must be in [4, 16], got {p}")
    return 1 << p


# md5_long yields 60 uniform bits; p index the register, the rest rank
_HLL_HASH_BITS = 60


def hll_build(
    df: DataFrame, key_col: str, group_cols: tuple[str, ...] = (), p: int = 9
) -> DataFrame:
    """One-pass register build: ``group_cols + (reg, mx)`` — at most
    ``m = 2^p`` rows per group, whatever the key cardinality. The
    shuffle carries only registers (partial max is map-side).

    Hash layout: reg = h mod m (low bits), rank word w = h div m
    (the remaining ``60 - p`` bits); mx = max over keys of the
    1-based position of w's highest set bit counted from the word's
    MSB (w = 0 → width + 1), i.e. the classic rho. Integer-exact in
    any engine: bit position is ``length(bin(w))``, never floating
    log2 (whose floor misrounds at powers of two)."""
    m = _hll_check_p(p)
    width = _HLL_HASH_BITS - p
    key_str = F.col(key_col).cast("string")
    tagged = F.coalesce(F.concat(F.lit("k"), key_str), F.lit("n"))
    h = md5_long(tagged)
    # h >> p, NOT h/m: double division would round h's low bits away
    # (h has 60 bits, doubles carry 53) and diverge from the twin's
    # exact integer arithmetic
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(w)) + 1
    )
    return (
        df.select(
            *group_cols,
            F.pmod(h, F.lit(m)).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mx"))
        .withColumn("_p", F.lit(p))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Lossless union of register tables built with the same ``p``
    (validated from the parameter column): max per register equals the
    sketch of the unioned inputs exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("mx",)]
    merged = out.groupBy(*keys).agg(F.max("mx").alias("mx"))
    params = merged.select("_p").distinct().collect()
    if len(params) > 1:
        raise ValueError(
            f"cannot merge HLL sketches with different p: "
            f"{sorted(r['_p'] for r in params)}"
        )
    return merged.select(*[c for c in out.columns if c != "_p"], "_p")


def hll_estimate(
    sketch: DataFrame, group_cols: tuple[str, ...] = (), p: int = 9
) -> DataFrame:
    """Distinct-count estimate per group from a register table:
    ``group_cols + (zeros, est)``. zeros = registers never hit (m -
    present rows); raw = alpha·m² / (Σ 2^-mx + zeros); linear counting
    ``m·ln(m/zeros)`` replaces raw below 2.5m when zeros remain (the
    paper's small-range correction). All terms of the harmonic sum are
    exact powers of two, so cross-engine agreement is limited only by
    summation order (absorbed by the 4-decimal round both engines
    apply)."""
    m = _hll_check_p(p)
    built = sketch.select("_p").first()
    if built is not None and built["_p"] != p:
        raise ValueError(
            f"sketch was built with p={built['_p']}, estimate called "
            f"with p={p}"
        )
    alpha = _hll_alpha(m)
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("_s"),
        F.count(F.lit(1)).alias("_present"),
    )
    zeros = F.lit(m) - F.col("_present")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        zeros.cast("long").alias("zeros"),
        round_even(est, 4).alias("est"),
    )


def hll_estimate_sql(
    table: str,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = 9,
) -> str:
    """DuckDB twin of hll_build + hll_estimate over ``table``."""
    m = _hll_check_p(p)
    width = _HLL_HASH_BITS - p
    alpha = _hll_alpha(m)
    tagged = f"coalesce('k' || CAST({key_col} AS VARCHAR), 'n')"
    h = md5_long_sql(tagged)
    gsel = "".join(f"{g}, " for g in group_cols)
    gby = f"GROUP BY {', '.join(group_cols)}" if group_cols else ""
    greg = ", ".join(list(group_cols) + ["reg"])
    return f"""
      WITH hashed AS (
        SELECT {gsel}({h}) % {m} AS reg, ({h}) // {m} AS w
        FROM {table}
      ),
      regs AS (
        SELECT {gsel}reg,
               max(CASE WHEN w = 0 THEN {width + 1}
                        ELSE {width} - length(bin(w)) + 1 END) AS mx
        FROM hashed GROUP BY {greg}
      ),
      agg AS (
        SELECT {gsel}sum(pow(2.0, -mx)) AS s,
               {m} - count(*) AS zeros
        FROM regs {gby}
      )
      SELECT {gsel}CAST(zeros AS BIGINT) AS zeros,
             round_even(
               CASE WHEN (CAST({alpha!r} AS DOUBLE) * {m} * {m}
                          / (s + zeros)) <= CAST({2.5 * m} AS DOUBLE)
                         AND zeros > 0
                    THEN CAST({m} AS DOUBLE)
                         * ln(CAST({m} AS DOUBLE) / zeros)
                    ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m}
                         / (s + zeros) END, 4
             ) AS est
      FROM agg
    """


def cms_estimate_sql(
    table: str, key_col: str, width: int, depth: int, probe_sql: str | None = None
) -> str:
    """DuckDB twin: build the sketch over ``table`` and estimate every
    distinct key of ``probe_sql`` (default: the distinct keys of
    ``table`` itself)."""
    probe = probe_sql or f"SELECT DISTINCT {key_col} FROM {table}"

    def bucket(expr: str, i: int) -> str:
        # same injective NULL tagging as _bucket ('||' propagates NULL)
        tagged = f"coalesce('k' || CAST({expr} AS VARCHAR), 'n')"
        h = md5_long_sql(f"{tagged} || ':{i}'")
        return f"({h} % {width})"

    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {bucket(key_col, i)} AS bucket FROM {table}"
        for i in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_col}, {i} AS row, {bucket(key_col, i)} AS bucket "
        f"FROM probes"
        for i in range(depth)
    )
    return f"""
      WITH cells AS ({cell_rows}),
      sketch AS (
        SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2
      ),
      probes AS ({probe}),
      pcells AS ({probe_rows})
      SELECT p.{key_col},
             CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS est
      FROM pcells p
      LEFT JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
      GROUP BY p.{key_col}
    """


# ---------------------------------------------------------------- KMV


# KMV / bottom-k ("theta"-style) distinct sketch (Bar-Yossef et al.
# 2002; the K-Minimum-Values estimator behind the theta-sketch family).
# Where HLL answers "how many distinct" with fixed registers, a KMV
# sketch keeps the k SMALLEST hash values of the distinct keys — and
# because the kept set is actual hash values (not lossy registers), it
# supports SET ALGEBRA: union is bottom-k of the union of two kept
# sets, and an intersection ESTIMATE falls out of the fraction of the
# union sketch's survivors present in both sides (the theta-sketch
# intersection rule). Everything is deterministic given the md5 hash
# idiom, so estimates are bit-identical across engines.
#
# Estimator: with n = |kept| and theta = kth smallest hash mapped to
# (0,1]: est = n exactly when n < k (every distinct hash was kept),
# else (k-1)/theta — the classic unbiased KMV estimate.

_KMV_SPACE = float(1 << 60)  # md5_long yields 60 uniform bits
_KMV_SALT = 32  # stage-1 fan-out of the distributed bottom-k


def _kmv_hash(key_col: str):
    key_str = F.col(key_col).cast("string")
    return md5_long(F.coalesce(F.concat(F.lit("k"), key_str), F.lit("n")))


def _kmv_hash_sql(expr: str) -> str:
    tagged = f"coalesce('k' || CAST({expr} AS VARCHAR), 'n')"
    return md5_long_sql(tagged)


def _bottom_k(
    df: DataFrame, group_cols: tuple[str, ...], k: int, salted: bool = True
) -> DataFrame:
    """Distributed bottom-k of the distinct ``h`` values per group.
    Stage 1 ranks within (group, h % salt) — ``salt`` parallel window
    partitions per group, each keeping at most k rows, so no single
    task ever sorts a group's full distinct-hash set (the global-sketch
    case, group_cols=(), would otherwise be ONE task at 100 TB).
    Stage 2 ranks the surviving ≤ salt·k rows per group."""
    from pyspark.sql import Window

    if salted:
        w1 = Window.partitionBy(
            *group_cols, F.pmod(F.col("h"), F.lit(_KMV_SALT))
        ).orderBy("h")
        df = (
            df.withColumn("_rn", F.row_number().over(w1))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return (
        df.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_build(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> DataFrame:
    """One-pass KMV sketch build: ``group_cols + (h,)`` — at most k
    rows per group. The distinct step is a partial-agged groupBy (the
    map-side combine bounds the shuffle by per-partition distinct
    cardinality); the bottom-k is the salted two-stage rank above."""
    if k < 2:
        raise ValueError("kmv: k must be >= 2")
    distinct = df.select(
        *group_cols, _kmv_hash(key_col).alias("h")
    ).distinct()
    return _bottom_k(distinct, group_cols, k).withColumn("_k", F.lit(k))


def kmv_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Lossless combine: bottom-k of the union of kept hash sets equals
    the sketch of the unioned inputs exactly (the defining KMV merge
    property). ``group_cols`` is the OUTPUT grouping — pass fewer
    columns than the inputs carry (or none) to union ACROSS groups,
    e.g. a per-day sketch rolling up to a global one."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    params = out.select("_k").distinct().collect()
    if len(params) > 1:
        raise ValueError(
            f"cannot merge KMV sketches with different k: "
            f"{sorted(r['_k'] for r in params)}"
        )
    k = params[0]["_k"]
    merged = out.select(*group_cols, "h").distinct()
    return _bottom_k(merged, group_cols, k).withColumn("_k", F.lit(k))


def _kmv_est_expr(n, kth, k: int):
    # the exact branch (n < k) and the (k-1)/theta branch share one
    # expression shape with the SQL twin so the doubles agree bitwise
    theta = kth.cast("double") / F.lit(_KMV_SPACE)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: tuple[str, ...] = (), k: int = 256
) -> DataFrame:
    """Distinct-count estimate per group: ``group_cols + (n_hashes,
    est)``. Exact when the group's distinct cardinality is under k."""
    built = sketch.select("_k").first()
    if built is not None and built["_k"] != k:
        raise ValueError(
            f"sketch was built with k={built['_k']}, estimate called "
            f"with k={k}"
        )
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("_kth")
    )
    return agg.select(
        *group_cols,
        F.col("n_hashes"),
        round_even(
            _kmv_est_expr(F.col("n_hashes"), F.col("_kth"), k), 4
        ).alias("est"),
    )


def kmv_intersect_estimate(
    sa: DataFrame, sb: DataFrame, k: int = 256
) -> DataFrame:
    """Intersection-cardinality estimate of two ungrouped sketches via
    the theta-sketch rule: over the UNION sketch's kept hashes, the
    fraction present in both sides estimates the Jaccard similarity;
    scaled by the union estimate it estimates |A ∩ B|. Returns one row
    (n_union, matched, est_union, est_intersect)."""
    u = kmv_merge(sa, sb, group_cols=())
    both = sa.select("h").intersect(sb.select("h"))
    tagged = u.join(
        both.withColumn("_in_both", F.lit(1)), "h", "left"
    )
    agg = tagged.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum(F.coalesce(F.col("_in_both"), F.lit(0))).alias("matched"),
        F.max("h").alias("_kth"),
    )
    est_u = _kmv_est_expr(F.col("n_union"), F.col("_kth"), k)
    return agg.select(
        F.col("n_union"),
        F.col("matched").cast("long").alias("matched"),
        round_even(est_u, 4).alias("est_union"),
        round_even(
            F.col("matched").cast("double")
            / F.col("n_union").cast("double")
            * est_u,
            4,
        ).alias("est_intersect"),
    )


def kmv_estimate_sql(
    table: str,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
) -> str:
    """DuckDB twin of kmv_build + kmv_estimate over ``table``."""
    groups = ", ".join(group_cols)
    gsel = f"{groups}, " if group_cols else ""
    gby = f"GROUP BY {groups}" if group_cols else ""
    part = f"PARTITION BY {groups} " if group_cols else ""
    return f"""
      WITH hashes AS (
        SELECT DISTINCT {gsel}{_kmv_hash_sql(key_col)} AS h FROM {table}
      ),
      bk AS (
        SELECT * FROM hashes
        QUALIFY row_number() OVER ({part}ORDER BY h) <= {k}
      )
      SELECT {gsel}CAST(count(*) AS BIGINT) AS n_hashes,
             round_even(CASE WHEN count(*) < {k}
               THEN CAST(count(*) AS DOUBLE)
               ELSE {float(k - 1)} /
                    (CAST(max(h) AS DOUBLE) / {_KMV_SPACE})
             END, 4) AS est
      FROM bk {gby}
    """
