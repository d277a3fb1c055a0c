"""Token chunking — the reference's training-side preprocessing.

The reference's training examples tokenize each group's documents,
concatenate the token stream, and reshape it into fixed-length training
chunks (examples/training/dataset_utils.py:85-148: tokenize ->
concat-then-reshape into ``sequence_length`` windows). There it happens
per group inside tf.data after loading; here it is a declarative
DataFrame transform that runs distributed BEFORE the write, so chunking
100 TB is a Spark job, not a training-loop bottleneck.

Shape: per-doc token counts -> window running offset per group (one
shuffle, same group partitioning the write reuses) -> posexplode tokens
-> global index = offset + position -> chunk = idx div chunk_len. All
Catalyst; deterministic given the order column.

Tokenizer note: the whitespace tokenizer maps an empty/NULL doc to ONE
empty token (textstats empty->1 word-count parity, and what every
DuckDB twin's string_split does) — an empty doc therefore occupies one
slot of the token stream and one unit of a packing budget. Filter
empty docs upstream when strict tokenize-concat semantics are needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import tokens, tokens_sql


def chunk_tokens(
    df: DataFrame,
    text_col: str,
    order_col: str,
    chunk_len: int,
    group_col: str = "group_id",
) -> DataFrame:
    """Fixed-length token chunks per group.

    Returns one row per (group, chunk_id) with ``n_tokens`` (== chunk_len
    except the tail chunk) and ``chunk_hash`` (md5 of the
    space-joined tokens in stream order — a compact, order-sensitive
    content witness usable for oracle checks and dedup).
    """
    if chunk_len < 1:
        raise ValueError("chunk_len must be >= 1")
    toks = df.select(
        F.col(group_col),
        F.col(order_col).alias("_ord"),
        tokens(F.col(text_col)).alias("_t"),
    ).withColumn("_nt", F.size("_t"))
    w = (
        Window.partitionBy(group_col)
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_off = toks.withColumn("_off", F.sum("_nt").over(w) - F.col("_nt"))
    exploded = with_off.select(
        F.col(group_col),
        F.col("_off"),
        F.posexplode(F.col("_t")).alias("_i", "_tok"),
    ).select(
        group_col,
        (F.col("_off") + F.col("_i")).alias("_gidx"),
        "_tok",
    )
    chunked = exploded.withColumn(
        "chunk_id", F.floor(F.col("_gidx") / chunk_len).cast("long")
    )
    return (
        chunked.groupBy(group_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("_gidx"), F.col("_tok")))
                        ),
                        lambda s: s["_tok"],
                    ),
                )
            ).alias("chunk_hash"),
        )
    )


def pack_doc_sequences(
    df: DataFrame,
    text_col: str,
    order_col: str,
    budget: int,
    group_col: str = "group_id",
) -> DataFrame:
    """Doc-boundary-preserving sequence packing: assign WHOLE documents
    to fixed token-budget training sequences, in deterministic
    ``order_col`` order within each group. ``seq_id = exclusive token
    cumsum DIV budget`` — a doc straddling a budget boundary belongs to
    the sequence where its span starts, so a sequence can overflow by
    at most its last doc (the standard greedy concat packing for
    pretraining batches; use :func:`chunk_tokens` when splitting docs
    across sequences is acceptable).

    One shuffle (the per-group window); everything else is a
    projection + one aggregation sharing the same hash partitioning.
    Returns one row per (group, seq_id): n_docs, n_tokens, first/last
    order value, and whether the sequence overflowed its budget.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    toks = df.select(
        F.col(group_col),
        F.col(order_col).alias("_ord"),
        F.size(tokens(F.col(text_col))).alias("_nt"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = toks.withColumn(
        "seq_id",
        F.floor((F.sum("_nt").over(w) - F.col("_nt")) / budget).cast("long"),
    )
    return seq.groupBy(group_col, "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.min("_ord").alias("first_ord"),
        F.max("_ord").alias("last_ord"),
        (F.sum("_nt") > F.lit(budget)).alias("overflowed"),
    )


def chunk_sliding(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_len: int,
    stride: int,
) -> DataFrame:
    """Overlapping sliding-window token chunks PER DOCUMENT — the RAG
    indexing shape (each chunk overlaps its neighbor by ``window_len -
    stride`` tokens so no retrieval-relevant span is cut at a
    boundary). Contrast :func:`chunk_tokens`, which cuts the
    concatenated per-group stream at exact boundaries for training.

    Windows start at 0, stride, 2*stride, …; the last window is the
    first one whose end reaches the document's end (it may hold fewer
    than ``window_len`` tokens). An empty/whitespace doc still yields
    one (possibly empty) window, so every document is represented in
    the index.

    Zero shuffles: tokenize -> sequence(starts) -> explode -> slice is
    a pure projection chain; Catalyst keeps it in one codegen stage
    over the scan. Returns (id, win_id, n_tokens, chunk_hash).
    """
    if stride <= 0 or window_len <= 0:
        raise ValueError("window_len and stride must be positive")
    toks = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_t"),
    ).withColumn("_nt", F.size("_t"))
    # last start: smallest multiple of stride with start + window >= n
    last = (
        F.ceil((F.greatest(F.col("_nt") - window_len, F.lit(0))) / stride)
        * stride
    ).cast("int")
    wins = toks.select(
        id_col,
        "_t",
        F.posexplode(F.sequence(F.lit(0), last, F.lit(stride))).alias(
            "win_id", "_start"
        ),
    )
    piece = F.slice(F.col("_t"), F.col("_start") + 1, window_len)
    return wins.select(
        id_col,
        "win_id",
        F.size(piece).alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    )


def chunk_sliding_sql(
    table: str,
    text_col: str,
    id_col: str,
    window_len: int,
    stride: int,
) -> str:
    """DuckDB twin of :func:`chunk_sliding` (list_slice is 1-based
    inclusive; generate_series is inclusive on both ends)."""
    t_sql = tokens_sql(text_col)
    return f"""
      WITH toks AS (
        SELECT {id_col}, {t_sql} AS t, len({t_sql}) AS nt
        FROM {table}
      ), wins AS (
        SELECT {id_col}, t,
               CAST(s AS BIGINT) AS _start,
               CAST(s / {stride} AS INT) AS win_id
        FROM toks,
             unnest(generate_series(0,
               CAST(ceil(greatest(nt - {window_len}, 0) / {stride})
                    AS BIGINT) * {stride},
               {stride})) AS g(s)
      )
      SELECT {id_col}, win_id,
             CAST(len(list_slice(t, _start + 1, _start + {window_len}))
                  AS INT) AS n_tokens,
             md5(array_to_string(
               list_slice(t, _start + 1, _start + {window_len}), ' '))
               AS chunk_hash
      FROM wins
    """


def pack_doc_sequences_sql(
    table: str,
    text_col: str,
    id_col: str,
    group_expr: str,
    budget: int,
) -> str:
    """DuckDB twin of :func:`pack_doc_sequences`."""
    return f"""
      WITH toks AS (
        SELECT {group_expr} AS group_id, {id_col} AS _ord,
               len({tokens_sql(text_col)}) AS nt
        FROM {table}
      ), seq AS (
        SELECT group_id, _ord, nt,
               CAST(floor((sum(nt) OVER (PARTITION BY group_id ORDER BY _ord
                             ROWS UNBOUNDED PRECEDING) - nt) / {budget})
                    AS BIGINT) AS seq_id
        FROM toks
      )
      SELECT group_id, seq_id,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             min(_ord) AS first_ord, max(_ord) AS last_ord,
             sum(nt) > {budget} AS overflowed
      FROM seq GROUP BY group_id, seq_id
    """


def chunk_tokens_sql(
    table: str,
    text_col: str,
    id_col: str,
    group_expr: str,
    chunk_len: int,
) -> str:
    """DuckDB twin of chunk_tokens over ``table`` grouped by
    ``group_expr`` ordered by ``id_col``."""
    t_sql = tokens_sql(text_col)
    return f"""
      WITH toks AS (
        SELECT {group_expr} AS group_id, {id_col} AS _ord,
               {t_sql} AS t, len({t_sql}) AS nt
        FROM {table}
      ), off AS (
        SELECT group_id, _ord, t,
               sum(nt) OVER (PARTITION BY group_id ORDER BY _ord
                             ROWS UNBOUNDED PRECEDING) - nt AS o
        FROM toks
      ), exploded AS (
        SELECT group_id, o + i - 1 AS gidx, t[i] AS tok
        FROM off, unnest(generate_series(1, len(t))) AS g(i)
      ), chunked AS (
        SELECT group_id, CAST(floor(gidx / {chunk_len}) AS BIGINT) AS chunk_id,
               gidx, tok
        FROM exploded
      )
      SELECT group_id, chunk_id, count(*) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY gidx)) AS chunk_hash
      FROM chunked GROUP BY group_id, chunk_id
    """
