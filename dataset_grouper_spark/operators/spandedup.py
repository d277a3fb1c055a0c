"""Exact substring-span deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", the ExactSubstr mode).

The last standard LLM-pipeline dedup mode next to the document-level
families in ``operators/dedup.py``: find token spans of length >= k
that occur MORE THAN ONCE anywhere in the corpus (across documents or
within one) and REMOVE every occurrence except the globally first —
not merely score documents. The reference engine has no dedup at all
(its whole surface is group partitioning, beam_transforms.py:82-131);
this is north-star scope per BASELINE.json.

Spark-first shape (the paper uses a single-node suffix array; that is
not distributable): every duplicated span of length >= k is exactly
the union of duplicated k-token windows, so

1. one pass explodes each document into its k-gram windows
   (``transform(sequence(...))`` + ``posexplode`` — Catalyst, no UDF);
2. one partial-aggregated ``groupBy(gram)`` computes each gram's
   occurrence count and its GLOBAL canonical (minimum ``(doc, pos)``)
   occurrence — an agg, not a window, so a pathological hot gram
   ("the the the ..." boilerplate) never serializes into one task's
   sort;
3. one equijoin on the gram marks non-canonical occurrences of
   repeated grams; their covered token positions union per document
   (gaps-and-islands merge for span reporting);
4. removal rebuilds each text from the uncovered positions.

Total cost: O(corpus tokens * k) shuffle bytes, two shuffles (gram
agg + join) plus the per-document rebuild — no all-pairs anywhere.
``max_anchor_freq`` is the hot-anchor cap, the same drop-and-audit
contract as the LSH hot-bucket and linkage block caps: grams above
the cap are dropped from matching (audit with
:func:`anchor_frequencies`), trading recall on pathological
boilerplate for a bounded join. At 100 TB, swap the gram string for
``xxhash64(gram)`` (``hash_grams=True``) to shrink shuffle width —
string equality is the oracle-exact default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The canonical occurrence of a gram is the MINIMUM (doc, pos) under
# struct (lexicographic) ordering — any orderable id type works, and
# there is no packed-integer key to alias on million-token documents.


def _windows(
    df: DataFrame, id_col: str, text_col: str, k: int, hash_grams: bool
) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_t"),
    )
    wins = (
        toks.filter(F.size("_t") >= k)
        .select(
            "_doc",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(_t) - {k}), "
                    f"i -> array_join(slice(_t, i + 1, {k}), ' '))"
                )
            ).alias("_pos", "_gram"),
        )
    )
    if hash_grams:
        wins = wins.withColumn("_gram", F.xxhash64("_gram"))
    return wins


def _dup_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_anchor_freq: int | None,
    hash_grams: bool,
) -> DataFrame:
    """Non-canonical occurrences of repeated k-grams: (_doc, _pos)."""
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-token span is a stopword)")
    wins = _windows(df, id_col, text_col, k, hash_grams)
    counts = (
        wins.groupBy("_gram")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            # global first occurrence — partial-aggregatable struct min
            F.min(F.struct("_doc", "_pos")).alias("_canon"),
        )
        .filter(F.col("_cnt") >= 2)
    )
    if max_anchor_freq is not None:
        counts = counts.filter(F.col("_cnt") <= max_anchor_freq)
    return (
        wins.join(counts, "_gram")
        .filter(F.struct("_doc", "_pos") != F.col("_canon"))
        .select("_doc", "_pos")
    )


def anchor_frequencies(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Audit frame for ``max_anchor_freq``: k-gram occurrence counts,
    descending — run it to size the cap and see what a cap drops."""
    return (
        _windows(df, id_col, text_col, k, hash_grams=False)
        .groupBy(F.col("_gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("gram"))
    )


def _require_unique_ids(df: DataFrame, id_col: str, where: str) -> None:
    """Fail fast on a non-unique ``id_col``: the span rebuild groups
    exploded tokens by document id, so two documents sharing an id
    would silently interleave their token streams into one corrupted
    ``clean_text`` (equal ``(_doc, _tp)`` keys make the rebuild's
    array_sort order nondeterministic — r9 review). One column-pruned
    aggregate probe, bounded to the first offender."""
    dup = (
        df.groupBy(F.col(id_col))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"{where}: id_col {id_col!r} must uniquely identify each "
            f"document — value {dup[0][0]!r} appears {dup[0][1]} times; "
            "deduplicate ids upstream or key by a unique column "
            "(pass check_unique_ids=False only when uniqueness is "
            "already guaranteed by the caller)"
        )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    max_anchor_freq: int | None = None,
    hash_grams: bool = False,
    check_unique_ids: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans per document:
    ``(id_col, span_start, span_end)`` — inclusive token positions of
    each maximal run covered by non-canonical repeated k-gram windows
    (gaps-and-islands merge over window starts).

    ``id_col`` must be unique per document (span merges group by it);
    verified up front unless ``check_unique_ids=False``."""
    if check_unique_ids:
        _require_unique_ids(df, id_col, "duplicate_spans")
    dup = _dup_windows(df, id_col, text_col, k, max_anchor_freq, hash_grams)
    w = (
        Window.partitionBy("_doc")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        dup.withColumn("_end", F.col("_pos") + (k - 1))
        .withColumn("_prev_end", F.max("_end").over(w))
        .withColumn(
            "_new_span",
            (
                F.col("_pos")
                > F.coalesce(F.col("_prev_end"), F.lit(-1)) + 1
            ).cast("int"),
        )
        .withColumn(
            "_span_id",
            F.sum("_new_span").over(
                Window.partitionBy("_doc")
                .orderBy("_pos")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(F.col("_doc").alias(id_col), "_span_id")
        .agg(
            F.min("_pos").alias("span_start"),
            F.max("_end").alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    max_anchor_freq: int | None = None,
    hash_grams: bool = False,
    check_unique_ids: bool = True,
) -> DataFrame:
    """Lee et al. removal: every occurrence of a duplicated >=k-token
    span is deleted except the corpus-global first. Returns every
    input document as ``(id_col, clean_text, removed_tokens)`` —
    ``clean_text`` is the surviving tokens single-space joined (the
    tokenizer normalizes whitespace), possibly empty.

    ``id_col`` must be unique per document (the rebuild groups tokens
    by it); verified up front unless ``check_unique_ids=False``."""
    if check_unique_ids:
        _require_unique_ids(df, id_col, "remove_duplicate_spans")
    dup = _dup_windows(df, id_col, text_col, k, max_anchor_freq, hash_grams)
    return _rebuild_without(df, dup, id_col, text_col, k)


def remove_duplicate_spans_against(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    max_anchor_freq: int | None = None,
    hash_grams: bool = False,
    check_unique_ids: bool = True,
) -> DataFrame:
    """Incremental ExactSubstr (the ingest shape, twin of
    ``dedup.minhash_dedup_against``): clean a NEW batch against an
    EXISTING corpus. A batch span >= k tokens is removed when its
    k-grams appear anywhere in the corpus (the corpus copy always
    survives — it is already ingested) or when it repeats within the
    batch and is not the batch-first occurrence. The corpus is only
    ever scanned for its gram set — it never self-joins, so ingest
    cost is O(batch grams + corpus scan), never O(corpus^2).
    ``max_anchor_freq`` drops corpus grams above the cap from
    matching (boilerplate guard, drop-and-audit like the batch path).
    Returns the batch as ``(id_col, clean_text, removed_tokens)``.

    Batch ``id_col`` must be unique per document (the rebuild groups
    tokens by it); verified up front unless ``check_unique_ids=False``
    (duplicate CORPUS ids are harmless — the corpus contributes only
    its gram set)."""
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-token span is a stopword)")
    if check_unique_ids:
        _require_unique_ids(
            batch, id_col, "remove_duplicate_spans_against"
        )
    bw = _windows(batch, id_col, text_col, k, hash_grams)
    cg = _windows(corpus, id_col, text_col, k, hash_grams).groupBy(
        "_gram"
    ).agg(F.count(F.lit(1)).alias("_cfreq"))
    if max_anchor_freq is not None:
        cg = cg.filter(F.col("_cfreq") <= max_anchor_freq)
    hit_corpus = bw.join(cg.select("_gram"), "_gram", "left_semi").select(
        "_doc", "_pos"
    )
    counts = (
        bw.groupBy("_gram")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(F.struct("_doc", "_pos")).alias("_canon"),
        )
        .filter(F.col("_cnt") >= 2)
    )
    if max_anchor_freq is not None:
        counts = counts.filter(F.col("_cnt") <= max_anchor_freq)
    hit_batch = (
        bw.join(counts, "_gram")
        .filter(F.struct("_doc", "_pos") != F.col("_canon"))
        .select("_doc", "_pos")
    )
    dup = hit_corpus.unionByName(hit_batch)
    return _rebuild_without(batch, dup, id_col, text_col, k)


def _rebuild_without(
    df: DataFrame, dup: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """Rebuild every document of ``df`` with the token positions
    covered by ``dup``'s (_doc, _pos) k-windows removed."""
    covered = dup.select(
        "_doc",
        F.explode(
            F.sequence(F.col("_pos"), F.col("_pos") + (k - 1))
        ).alias("_tp"),
    ).distinct()
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "_tp", "_tok"
        ),
    )
    kept = (
        toks.join(covered, ["_doc", "_tp"], "left_anti")
        .groupBy("_doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_tp", "_tok"))),
                    lambda x: x["_tok"],
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("_kept"),
        )
    )
    n_tokens = df.select(
        F.col(id_col).alias("_doc"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_n"),
    )
    return (
        n_tokens.join(kept, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            (F.col("_n") - F.coalesce(F.col("_kept"), F.lit(0))).alias(
                "removed_tokens"
            ),
        )
    )


# ------------------------------------------------------------- SQL twins


def _windows_sql(table_sql: str, id_col: str, text_col: str, k: int) -> str:
    """Shared CTE prefix (DuckDB dialect): toks / g2 (k-gram windows)."""
    return f"""
        toks AS (
          SELECT {id_col} AS _doc,
                 string_split_regex(trim({text_col}), '\\s+') AS _t
          FROM {table_sql}
        ),
        g2 AS (
          SELECT _doc,
                 unnest(range(0, greatest(len(_t) - {k} + 1, 0))) AS _pos,
                 _t
          FROM toks
        ),
        grams AS (
          SELECT _doc, _pos,
                 array_to_string(_t[_pos + 1 : _pos + {k}], ' ') AS _gram
          FROM g2
        ),
        cnt AS (
          SELECT _gram, count(*) AS _c,
                 min(struct_pack(d := _doc, p := _pos)) AS _canon
          FROM grams GROUP BY _gram HAVING count(*) >= 2
        ),
        dup AS (
          SELECT g._doc, g._pos
          FROM grams g JOIN cnt USING (_gram)
          WHERE struct_pack(d := g._doc, p := g._pos) <> cnt._canon
        )"""


def duplicate_spans_sql(
    table_sql: str, id_col: str, text_col: str, k: int = 8
) -> str:
    """DuckDB twin of :func:`duplicate_spans` (no anchor cap)."""
    return f"""
        WITH {_windows_sql(table_sql, id_col, text_col, k)},
        m AS (
          SELECT _doc, _pos, _pos + {k - 1} AS _e,
                 max(_pos + {k - 1}) OVER (
                   PARTITION BY _doc ORDER BY _pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS _prev
          FROM dup
        ),
        s AS (
          SELECT _doc, _pos, _e,
                 sum(CASE WHEN _prev IS NULL OR _pos > _prev + 1
                          THEN 1 ELSE 0 END) OVER (
                   PARTITION BY _doc ORDER BY _pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS _sid
          FROM m
        )
        SELECT _doc AS {id_col},
               CAST(min(_pos) AS BIGINT) AS span_start,
               CAST(max(_e) AS BIGINT) AS span_end
        FROM s GROUP BY _doc, _sid
    """


def remove_duplicate_spans_sql(
    table_sql: str, id_col: str, text_col: str, k: int = 8
) -> str:
    """DuckDB twin of :func:`remove_duplicate_spans` (no anchor cap)."""
    return f"""
        WITH {_windows_sql(table_sql, id_col, text_col, k)},
        covered AS (
          SELECT DISTINCT _doc, unnest(range(_pos, _pos + {k})) AS _tp
          FROM dup
        ),
        tokpos AS (
          SELECT _doc, unnest(range(0, len(_t))) AS _tp, _t FROM toks
        ),
        kept AS (
          SELECT t._doc,
                 string_agg(t._t[t._tp + 1], ' ' ORDER BY t._tp)
                   AS clean_text,
                 count(*) AS _kept
          FROM tokpos t LEFT JOIN covered c
            ON t._doc = c._doc AND t._tp = c._tp
          WHERE c._doc IS NULL
          GROUP BY t._doc
        )
        SELECT toks._doc AS {id_col},
               COALESCE(kept.clean_text, '') AS clean_text,
               CAST(len(toks._t) - COALESCE(kept._kept, 0) AS BIGINT)
                 AS removed_tokens
        FROM toks LEFT JOIN kept ON toks._doc = kept._doc
    """


def remove_duplicate_spans_against_sql(
    batch_sql: str,
    corpus_sql: str,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> str:
    """DuckDB twin of :func:`remove_duplicate_spans_against`
    (no anchor cap)."""
    return f"""
        WITH toks AS (
          SELECT {id_col} AS _doc,
                 string_split_regex(trim({text_col}), '\\s+') AS _t
          FROM {batch_sql}
        ),
        g2 AS (
          SELECT _doc,
                 unnest(range(0, greatest(len(_t) - {k} + 1, 0))) AS _pos,
                 _t
          FROM toks
        ),
        grams AS (
          SELECT _doc, _pos,
                 array_to_string(_t[_pos + 1 : _pos + {k}], ' ') AS _gram
          FROM g2
        ),
        ctoks AS (
          SELECT string_split_regex(trim({text_col}), '\\s+') AS _t
          FROM {corpus_sql}
        ),
        cg2 AS (
          SELECT unnest(range(0, greatest(len(_t) - {k} + 1, 0))) AS _pos,
                 _t
          FROM ctoks
        ),
        cgrams AS (
          SELECT DISTINCT array_to_string(_t[_pos + 1 : _pos + {k}], ' ')
                   AS _gram
          FROM cg2
        ),
        cnt AS (
          SELECT _gram, count(*) AS _c,
                 min(struct_pack(d := _doc, p := _pos)) AS _canon
          FROM grams GROUP BY _gram HAVING count(*) >= 2
        ),
        dup AS (
          SELECT g._doc, g._pos
          FROM grams g JOIN cgrams USING (_gram)
          UNION
          SELECT g._doc, g._pos
          FROM grams g JOIN cnt USING (_gram)
          WHERE struct_pack(d := g._doc, p := g._pos) <> cnt._canon
        ),
        covered AS (
          SELECT DISTINCT _doc, unnest(range(_pos, _pos + {k})) AS _tp
          FROM dup
        ),
        tokpos AS (
          SELECT _doc, unnest(range(0, len(_t))) AS _tp, _t FROM toks
        ),
        kept AS (
          SELECT t._doc,
                 string_agg(t._t[t._tp + 1], ' ' ORDER BY t._tp)
                   AS clean_text,
                 count(*) AS _kept
          FROM tokpos t LEFT JOIN covered c
            ON t._doc = c._doc AND t._tp = c._tp
          WHERE c._doc IS NULL
          GROUP BY t._doc
        )
        SELECT toks._doc AS {id_col},
               COALESCE(kept.clean_text, '') AS clean_text,
               CAST(len(toks._t) - COALESCE(kept._kept, 0) AS BIGINT)
                 AS removed_tokens
        FROM toks LEFT JOIN kept ON toks._doc = kept._doc
    """
