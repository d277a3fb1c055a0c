"""Bigram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020: score web text under a reference-corpus LM;
low likelihood ≈ boilerplate/gibberish, used to tier CommonCrawl).

KenLM is a C++ dependency; at corpus scale the model FIT is itself a
big-data job, so both halves live here as DataFrame plans:

- **fit**: unigram + bigram counts over the reference corpus — two
  aggregations; bigrams come straight off the token array
  (``posexplode`` over the first n-1 positions + ``element_at`` for the
  successor), no window, no self-join.
- **score**: each document's bigrams left-join the count tables (two
  shuffle joins; the unigram side is vocabulary-sized and typically
  broadcast by size-based planning), then one aggregation for the
  per-doc mean log-probability. Add-k smoothing keeps unseen bigrams
  finite: P(b|a) = (c(ab)+k)/(c(a)+k·V), and a token never seen as a
  predecessor backs off to the uniform 1/V.

Everything is rational arithmetic inside one ``ln`` — the DuckDB twin
reproduces it; the driver's 6-decimal float rounding absorbs libm ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import tokens, tokens_sql


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, a, b) — one row per adjacent token pair, in-doc order
    irrelevant downstream. Docs with fewer than two tokens contribute
    no rows."""
    t = tokens(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("_id"), t.alias("_t"))
        .withColumn("_n", F.size("_t"))
        .select(
            "_id",
            "_t",
            F.posexplode(
                F.slice(F.col("_t"), 1, F.greatest(F.col("_n") - 1, F.lit(0)))
            ).alias("_i", "a"),
        )
        .select(
            "_id", "a", F.element_at(F.col("_t"), F.col("_i") + 2).alias("b")
        )
    )


def fit_bigram_lm(
    ref: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of the reference corpus: (unigrams(a, c_a),
    bigrams(a, b, c_ab), vocab(1-row _v)). Persist the returns if
    scoring several frames against one reference."""
    uni = (
        ref.select(F.explode(tokens(F.col(text_col))).alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    bi = (
        _doc_bigrams(ref, text_col, id_col)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("_v"))
    return uni, bi, vocab


def bigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ref: DataFrame | None = None,
    k: float = 0.5,
) -> DataFrame:
    """Per-document mean log-probability and perplexity under the add-k
    bigram LM fit on ``ref`` (default: ``df`` itself — self-scoring,
    the CCNet setup uses a curated reference instead).

    Returns (id, n_bigrams, avg_logprob, ppl = exp(-avg_logprob)) for
    every document with at least one bigram; sub-2-token docs have no
    defined bigram likelihood and are omitted (filter them with the
    length features first — they fail any length gate anyway).
    """
    if k <= 0:
        raise ValueError("smoothing k must be positive")
    uni, bi, vocab = fit_bigram_lm(
        ref if ref is not None else df, text_col, id_col
    )
    pairs = _doc_bigrams(df, text_col, id_col)
    scored = (
        pairs.join(bi, ["a", "b"], "left")
        .join(uni, ["a"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "_id",
            F.when(
                F.col("c_a").isNull(),
                # predecessor never seen: uniform over the vocab
                -F.log(F.col("_v").cast("double")),
            )
            .otherwise(
                F.log(
                    (F.coalesce(F.col("c_ab"), F.lit(0)) + F.lit(k))
                    / (F.col("c_a") + F.lit(k) * F.col("_v"))
                )
            )
            .alias("_lp"),
        )
    )
    return scored.groupBy(F.col("_id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("_lp").alias("avg_logprob"),
        F.exp(-F.avg("_lp")).alias("ppl"),
    )


def bigram_logprob_sql(
    table: str,
    text_col: str,
    id_col: str,
    ref_filter: str = "TRUE",
    k: float = 0.5,
) -> str:
    """DuckDB twin of :func:`bigram_logprob` with the reference corpus
    ``SELECT * FROM table WHERE ref_filter``."""
    return f"""
      WITH toks AS (
        SELECT {id_col} AS id, {tokens_sql(text_col)} AS t,
               {ref_filter} AS is_ref
        FROM {table}
      ), uni AS (
        SELECT u.a, count(*) AS c_a
        FROM (SELECT unnest(t) AS a FROM toks WHERE is_ref) u
        GROUP BY u.a
      ), vocab AS (SELECT count(*) AS v FROM uni),
      pairs AS (
        -- is_ref rides the pair rows directly: joining back on id
        -- would multiply counts when ids are not unique
        SELECT id, t[i] AS a, t[i + 1] AS b, is_ref
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
      ), bi AS (
        SELECT a, b, count(*) AS c_ab
        FROM pairs WHERE is_ref
        GROUP BY a, b
      ), scored AS (
        SELECT p.id,
               CASE WHEN u.c_a IS NULL
                    THEN -ln((SELECT v FROM vocab)::DOUBLE)
                    ELSE ln((coalesce(b.c_ab, 0) + {k!r})
                            / (u.c_a + {k!r} * (SELECT v FROM vocab)))
               END AS lp
        FROM pairs p
        LEFT JOIN bi b ON b.a = p.a AND b.b = p.b
        LEFT JOIN uni u ON u.a = p.a
      )
      SELECT id AS {id_col},
             CAST(count(*) AS BIGINT) AS n_bigrams,
             avg(lp) AS avg_logprob,
             exp(-avg(lp)) AS ppl
      FROM scored GROUP BY id
    """
