"""Count-min sketch — fixed-memory frequency estimation, relationally.

HLL (``approx_count_distinct``) answers "how many distinct"; the
count-min sketch (Cormode & Muthukrishnan 2005) answers "how often does
THIS key occur" with ``depth × width`` integer cells regardless of key
cardinality — the heavy-hitter / hot-key primitive when an exact
groupBy's result would itself be too big to hold.

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

from dataset_grouper_spark.functions.hashing import md5_long, md5_long_sql


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
