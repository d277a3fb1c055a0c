"""Corpus vocabulary statistics — tokenizer-training prep.

Every tokenizer/vocab pipeline starts from corpus-wide token counts:
term frequency (total occurrences) and document frequency (docs
containing the token), pruned by min-count and truncated to a ranked
top-k. One explode + one two-level aggregation — partial aggregation
means map tasks ship per-token partial counts, not token streams, so
the shuffle is bounded by |vocab| per partition, not corpus size.

Tokenization is the shared single-space splitter
(functions/hashing.tokens), keeping vocab rows consistent with
shingles, simhash, and textstats word counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import tokens_sql, tokens


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-token (token, term_freq, doc_freq). Empty-string tokens
    (from empty/NULL text) are excluded."""
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.countDistinct("_id").alias("doc_freq"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Ranked vocabulary: tokens with ``term_freq >= min_count``,
    ranked by (term_freq desc, token asc) — the deterministic
    tie-break makes the cut reproducible on any engine — optionally
    truncated to the top ``top_k``.

    With ``top_k`` set, a distributed ``orderBy().limit(top_k)``
    (TakeOrdered — per-partition truncation, no global sort) runs
    BEFORE the rank window, so the single-partition row_number sees at
    most ``top_k`` rows even when web-scale token garbage pushes the
    distinct-token set into the billions. Without ``top_k`` the global
    row_number sorts one partition, but its input is the aggregated
    vocabulary, not the corpus — the count aggregation above it is
    what scales with the 100 TB input."""
    counts = token_counts(df, text_col, id_col).filter(
        F.col("term_freq") >= min_count
    )
    if top_k is not None:
        counts = counts.orderBy(
            F.col("term_freq").desc(), F.col("token")
        ).limit(top_k)
    w = Window.orderBy(F.col("term_freq").desc(), F.col("token"))
    return counts.withColumn("rank", F.row_number().over(w))


def tf_idf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-(doc, token) TF-IDF: ``tf * ln((N+1)/(df+1))``, rounded for
    cross-engine hashability (ln is libm-double in Spark and DuckDB
    alike). N and the doc-frequency table are aggregates joined back —
    the N scalar rides a broadcast, doc_freq a token-key shuffle."""
    from dataset_grouper_spark.cache import persist_tracked

    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).filter(F.col("token") != "")
    # tf feeds BOTH the score row set and the doc-frequency aggregate;
    # without a persist the whole tokenize+aggregate subtree runs twice
    # (no exchange reuse across the two consumers — plan-audited)
    tf = persist_tracked(
        tok.groupBy("_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = df.select(F.countDistinct(id_col).alias("_n"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("_id").alias(id_col),
            "token",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1) / (F.col("doc_freq") + 1)),
                6,
            ).alias("tfidf"),
        )
    )


def top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per doc by (tfidf desc, token) —
    the deterministic tie-break keeps the cut engine-reproducible."""
    scored = tf_idf(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ngram_counts(
    df: DataFrame,
    text_col: str,
    n: int = 2,
    top_k: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide word n-gram counts — language-model / contamination
    statistics (the count tables behind KenLM-style LMs and n-gram
    overlap checks).

    Tokens come from the shared single-space splitter; n-grams are
    built with the array HOFs in hashing.ngrams_of_tokens (JVM-side,
    short-doc-safe), exploded, and counted with a partial-aggregated
    groupBy — map tasks ship per-gram partial counts, so the shuffle
    is bounded by the distinct-gram set per partition, not corpus
    tokens. With ``top_k``, a distributed ``orderBy().limit()``
    (TakeOrdered) bounds the result before the caller sees it;
    tie-break (count desc, gram asc) is deterministic cross-engine.
    """
    from dataset_grouper_spark.functions.hashing import ngrams_of_tokens, tokens

    grams = (
        df.select(tokens(F.col(text_col)).alias("_toks"))
        .select(F.explode(ngrams_of_tokens(F.col("_toks"), n)).alias("gram"))
        .filter(F.col("gram") != "")
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_occurrences") >= min_count)
    if top_k is not None:
        counts = counts.orderBy(
            F.col("n_occurrences").desc(), F.col("gram")
        ).limit(top_k)
    return counts


def ngram_counts_sql(
    table: str,
    text_col: str,
    n: int = 2,
    top_k: int | None = None,
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`ngram_counts` (same tokenization, same
    deterministic cut)."""
    having = f"HAVING count(*) >= {min_count}" if min_count > 1 else ""
    limit = f"LIMIT {top_k}" if top_k is not None else ""
    return f"""
        WITH toks AS (
          SELECT {tokens_sql(text_col)} AS arr
          FROM {table}
        ), grams AS (
          SELECT unnest(list_transform(
                   range(1, greatest(len(arr) - {n} + 2, 1)),
                   i -> array_to_string(arr[i:i+{n}-1], ' '))) AS gram
          FROM toks
        )
        SELECT gram, count(*) AS n_occurrences
        FROM grams WHERE gram <> ''
        GROUP BY gram {having}
        ORDER BY n_occurrences DESC, gram {limit}
    """


def vocabulary_index(
    df: DataFrame, col: str, num_partitions: int = 64
) -> DataFrame:
    """Categorical string indexer FIT: map each distinct value of
    ``col`` to a dense integer id, ordered by (frequency desc, value
    asc) — id 0 is the most frequent value, exactly the ML-pipeline
    StringIndexer contract, and deterministic under ties.

    The rank is computed with the distributed prefix sum
    (operators/prefix.py) over the aggregated counts, NOT a global
    single-task window — a word-level vocabulary can be 10^7 terms.
    Returns (value, index, n_occurrences).
    """
    from dataset_grouper_spark.operators import prefix

    counts = (
        df.select(F.col(col).alias("value"))
        .na.drop()
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        # struct orders lexicographically: (-n, value) == freq desc,
        # value asc
        .withColumn("_ok", F.struct((-F.col("n_occurrences")).alias("_neg"), F.col("value")))
        .withColumn("_one", F.lit(1))
    )
    ranked = prefix.running_sum(
        counts, "_one", "_ok", num_partitions=num_partitions, out_col="_rk"
    )
    return ranked.select(
        "value",
        (F.col("_rk") - 1).cast("long").alias("index"),
        "n_occurrences",
    )


def encode_indexed(
    df: DataFrame, col: str, index_df: DataFrame, out_col: str | None = None
) -> DataFrame:
    """Categorical string indexer TRANSFORM: broadcast the fitted
    (value, index) table onto ``df``; unseen/NULL values encode as -1
    (the keep-invalid contract — dropping rows silently is the bug).
    The index table is vocabulary-sized; broadcast is the right call
    up to ~10^7 entries, beyond which pass a plain join yourself."""
    out = out_col or f"{col}_idx"
    idx = index_df.select(
        F.col("value").alias("_enc_val"), F.col("index").alias("_enc_idx")
    )
    return (
        df.join(
            F.broadcast(idx), df[col] == F.col("_enc_val"), "left"
        )
        .withColumn(out, F.coalesce(F.col("_enc_idx"), F.lit(-1)).cast("long"))
        .drop("_enc_val", "_enc_idx")
    )


def vocabulary_index_sql(table: str, col: str) -> str:
    """DuckDB twin of :func:`vocabulary_index`."""
    return f"""
      SELECT {col} AS value,
             CAST(row_number() OVER (
               ORDER BY count(*) DESC, {col}) - 1 AS BIGINT) AS index,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM {table} WHERE {col} IS NOT NULL
      GROUP BY {col}
    """
