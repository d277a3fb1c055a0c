"""Entity resolution (record linkage) — north-star extension.

The classic three-stage ER pipeline, Spark-first:

1. **Block** — cheap deterministic keys (exact attribute combos,
   prefixes, phonetic codes) restrict the candidate space: pairs are
   generated only WITHIN a block, never all-pairs. Multiple blocking
   passes union their candidates (the standard recall hedge — a typo in
   one key's attribute is caught by another pass), deduped on the pair
   id. This is the same shape as the LSH band join in dedup.py: one
   exploded equijoin per pass, output bounded by block sizes, a 100 TB
   corpus never pays O(n²).
2. **Match** — candidate pairs scored with edit distance
   (``levenshtein`` is built into BOTH Spark and DuckDB, so the score
   is engine-portable and the operator oracle-able) and kept under a
   threshold; a normalized similarity rides along.
3. **Cluster** — matched pairs are edges; connected components
   (dedup.py's min-label loop) assigns every record an entity id = the
   min record id of its cluster (the survivor/golden-record rule the
   exact-dedup tier already uses).

At 100 TB: blocks are groupBy keys (one shuffle per pass); a
pathological hot block (every record blocking to one key) is the same
failure mode as a hot LSH bucket — callers cap it with
``max_block_size``, which drops oversized blocks (audit them with the
returned block-size frame, the lsh hot-bucket pattern at
dedup.py:159-302).

No reference analogue (the reference has no joins at all — SURVEY §2);
this is the training-data-pipeline metadata-dedup operator (author /
source / license canonicalization before corpus mixing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.cache import defer_release, persist_tracked
from dataset_grouper_spark.functions.hashing import round_even


def _block_keyed(
    df: DataFrame, keys: list[Column | str], extra: list[Column]
) -> DataFrame:
    """One blocking pass's keyed frame: ``_bk`` = a STRUCT of the key
    expressions (struct equality is per-field equality — injective on
    the key tuple, matching the oracle's per-column equi-join), with
    NULL-keyed rows dropped (a NULL never equi-joins: an absent
    attribute is evidence of nothing — struct equality would otherwise
    treat NULL fields as equal). The SINGLE definition of the keying
    contract, shared by the pair join and the audit frame."""
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return (
        df.select(
            *extra,
            F.struct(
                *[c.alias(f"_k{j}") for j, c in enumerate(cols)]
            ).alias("_bk"),
            F.greatest(
                F.lit(False), *[c.isNull() for c in cols]
            ).alias("_nullkey"),
        )
        .filter(~F.col("_nullkey"))
        .drop("_nullkey")
    )


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    blocking_keys: list[list[Column | str]],
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) from one or more blocking passes.

    Each pass self-joins records that agree on EVERY key expression in
    that pass (NULL keys never block — a NULL never equi-joins, which
    is the correct ER semantics: an absent attribute is evidence of
    nothing). Pair sets from different passes are unioned and deduped.

    ``max_block_size`` drops blocks larger than the cap BEFORE the
    pair join (a block of b records emits b·(b-1)/2 pairs — one
    million-record block is half a trillion pairs). Dropped blocks are
    a recall trade the caller audits, exactly like the LSH hot-bucket
    cap.
    """
    frames = []
    for i, keys in enumerate(blocking_keys):
        keyed = _block_keyed(df, keys, [F.col(id_col).alias("_id")])
        if max_block_size is not None:
            sizes = keyed.groupBy("_bk").agg(
                F.count(F.lit(1)).alias("_bn")
            )
            keyed = keyed.join(
                sizes.filter(F.col("_bn") <= max_block_size), "_bk"
            )
        a = keyed.select(F.col("_bk"), F.col("_id").alias("id_a"))
        b = keyed.select(F.col("_bk"), F.col("_id").alias("id_b"))
        frames.append(
            a.join(b, "_bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def block_sizes(
    df: DataFrame,
    blocking_keys: list[list[Column | str]],
) -> DataFrame:
    """Audit frame for ``max_block_size`` (the drop-and-audit twin of
    ``spandedup.anchor_frequencies``): per blocking pass, every block
    key tuple with its record count, largest first — run it to size
    the cap and to see exactly which blocks a cap drops. Columns:
    ``(pass_idx, block, n_records)`` with ``block`` as the key tuple
    rendered to JSON (a display frame, not a join input)."""
    frames = []
    for i, keys in enumerate(blocking_keys):
        keyed = _block_keyed(df, keys, [])
        frames.append(
            keyed.groupBy("_bk")
            .agg(F.count(F.lit(1)).alias("n_records"))
            .select(
                F.lit(i).alias("pass_idx"),
                F.to_json(F.col("_bk")).alias("block"),
                "n_records",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy(F.desc("n_records"), "pass_idx", "block")


def match_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
) -> DataFrame:
    """Score candidate pairs with Levenshtein edit distance on
    ``text_col`` and keep those within ``max_dist``. Two hash joins to
    attach both sides' strings (each O(pairs)), one JVM-side
    ``levenshtein`` — no Python in the hot path. Returns
    (id_a, id_b, dist, similarity) with similarity = 1 - dist /
    max(len_a, len_b) rounded to 6 (1.0 for two empty strings)."""
    lhs = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta")
    )
    rhs = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb")
    )
    scored = (
        pairs.join(lhs, "id_a")
        .join(rhs, "id_b")
        .withColumn("dist", F.levenshtein("_ta", "_tb"))
        .filter(F.col("dist") <= max_dist)
    )
    denom = F.greatest(F.length("_ta"), F.length("_tb"))
    return scored.select(
        "id_a",
        "id_b",
        "dist",
        F.when(denom == 0, F.lit(1.0))
        .otherwise(
            round_even(
                F.lit(1.0) - F.col("dist").cast("double") / denom, 6
            )
        )
        .alias("similarity"),
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocking_keys: list[list[Column | str]],
    max_dist: int,
    max_block_size: int | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Full ER pipeline: block → match → connected components →
    (record id, entity id) for EVERY input record (unmatched records
    are their own singleton entity). Entity id is the min record id in
    the match-graph component — deterministic on any cluster."""
    from dataset_grouper_spark.operators.dedup import connected_components

    pairs = persist_tracked(
        match_pairs(
            df,
            blocked_pairs(df, id_col, blocking_keys, max_block_size),
            id_col,
            text_col,
            max_dist,
        ).select("id_a", "id_b")
    )
    comp = connected_components(pairs, "id_a", "id_b", max_iter=max_iter)
    out = (
        df.select(F.col(id_col).alias("record_id"))
        .join(
            comp.select(
                F.col("id").alias("record_id"),
                F.col("component").alias("entity_id"),
            ),
            "record_id",
            "left",
        )
        .select(
            "record_id",
            F.coalesce("entity_id", "record_id").alias("entity_id"),
        )
    )
    defer_release(lambda: pairs.unpersist())
    return out


def match_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    block_exprs: list[list[str]],
    max_dist: int,
    max_block_size: int | None = None,
) -> str:
    """DuckDB twin of blocked_pairs ∘ match_pairs: per-pass block
    self-joins unioned + deduped, levenshtein + threshold + normalized
    similarity. ``max_block_size`` mirrors ``blocked_pairs``' cap —
    blocks larger than it are dropped BEFORE the pair join (a window
    count over the pass's key tuple), so capped Spark and DuckDB
    results stay hash-identical. Normalization uses ``length()``
    (CHARACTER count) on both engines. Exactness caveat: DuckDB's
    ``levenshtein`` counts BYTE edits while Spark's counts CHARACTER
    edits, so the twin is exact on ASCII text only (multi-byte
    characters inflate the DuckDB distance); the registered oracle
    queries run on ASCII keys."""
    passes = []
    for keys in block_exprs:
        null_guard = " AND ".join(
            f"({k}) IS NOT NULL" for part in (keys,) for k in part
        )
        on = " AND ".join(f"a.__k{i} = b.__k{i}" for i in range(len(keys)))
        proj = ", ".join(
            f"{k} AS __k{i}" for i, k in enumerate(keys)
        )
        cap_col = ""
        cap_pred = ""
        if max_block_size is not None:
            part_by = ", ".join(f"__k{i}" for i in range(len(keys)))
            cap_col = (
                f", COUNT(*) OVER (PARTITION BY {part_by}) AS __bn"
            )
            # both sides share the block, one side's size check suffices
            cap_pred = f" AND a.__bn <= {int(max_block_size)}"
        passes.append(
            f"""SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
            FROM (SELECT * {cap_col}
                  FROM (SELECT {id_col}, {proj} FROM {table}
                        WHERE {null_guard})) a
            JOIN (SELECT {id_col}, {proj} FROM {table}
                  WHERE {null_guard}) b
              ON {on} AND a.{id_col} < b.{id_col}{cap_pred}"""
        )
    union = " UNION ".join(passes)  # UNION dedups across passes
    return f"""
    WITH cand AS ({union})
    SELECT c.id_a, c.id_b,
           levenshtein(x.{text_col}, y.{text_col}) AS dist,
           CASE WHEN greatest(length(x.{text_col}), length(y.{text_col})) = 0
                THEN 1.0
                ELSE round_even(
                  1.0 - levenshtein(x.{text_col}, y.{text_col})
                  / CAST(greatest(length(x.{text_col}),
                                  length(y.{text_col})) AS DOUBLE), 6)
           END AS similarity
    FROM cand c
    JOIN {table} x ON x.{id_col} = c.id_a
    JOIN {table} y ON y.{id_col} = c.id_b
    WHERE levenshtein(x.{text_col}, y.{text_col}) <= {max_dist}
    """
