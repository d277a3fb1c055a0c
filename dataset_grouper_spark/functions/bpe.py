"""BPE merge learning — tokenizer TRAINING as a Spark job.

The reference's pipelines feed tokenizer-training corpora but the
training itself (Sennrich et al. 2016 byte-pair encoding) is usually a
single-node tool; at 100 TB even the word-vocabulary extraction is a
cluster job. Classic BPE fit never touches the corpus after that
extraction — it iterates on the WORD VOCABULARY weighted by word
frequency — so the shape here is:

- one corpus pass: whitespace words + counts (the only big-data step);
- per merge: one aggregation over the vocab (adjacent symbol pairs
  weighted by word count, partial-agg friendly), one 1-row argmax
  collect (count desc, pair asc — deterministic ties), and one literal
  ``replace`` on the symbol sequences. The vocab frame is re-persisted
  periodically so the chained replace expressions never re-execute
  from scratch.

Cross-engine exactness: symbol sequences are space-joined; a merge is
``replace(' '||seq||' ', ' l r ', ' lr ')`` — leftmost-non-overlapping
literal replace, identical semantics in Spark and DuckDB — and the
oracle UNROLLS the merge loop into CTE stages whose argmax feeds the
next stage's replace through scalar subqueries. Fit is restricted to
printable-ASCII words: Spark's char split operates on UTF-16 code
units while DuckDB's operates on codepoints, so non-BMP characters
would diverge (stated limitation, not a silent one).

End-of-word marker ``</w>`` is one symbol (contains no space), the
standard trick that keeps merges from crossing word boundaries.

Merge-application semantics, stated precisely: one leftmost-
non-overlapping literal replace per merge per iteration. On a run of
the SAME symbol ("a a a a"), the shared delimiter space is consumed by
the previous match, so alternating occurrences survive the pass —
canonical lookaround-regex BPE would merge them all, but RE2 (DuckDB)
has no lookarounds. The fit self-heals: surviving occurrences still
count toward later iterations' argmax and merge then. Deterministic,
cross-engine exact, and identical to Python ``str.replace`` — the
property the oracle needs; the learned merges differ from canonical
BPE only on same-symbol runs inside words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import tokens, tokens_sql

ASCII_WORD = "^[ -~]+$"
EOW = "</w>"
_PERSIST_EVERY = 4


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(w, wc, seq): distinct printable-ASCII words with counts and the
    initial space-joined character sequence + end-of-word marker."""
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike(ASCII_WORD))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    return words.withColumn(
        "seq",
        F.concat(
            F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(f" {EOW}")
        ),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    syms = vocab.select(
        "wc", F.split(F.col("seq"), " ").alias("_s")
    ).withColumn("_n", F.size("_s"))
    return (
        syms.select(
            "wc",
            "_s",
            F.posexplode(
                F.slice(F.col("_s"), 1, F.greatest(F.col("_n") - 1, F.lit(0)))
            ).alias("_i", "l"),
        )
        .select(
            "wc", "l", F.element_at(F.col("_s"), F.col("_i") + 2).alias("r")
        )
        .groupBy("l", "r")
        .agg(F.sum("wc").alias("cnt"))
    )


def _merge_expr(seq, left: str, right: str):
    padded = F.concat(F.lit(" "), seq, F.lit(" "))
    return F.trim(
        F.replace(
            padded,
            F.lit(f" {left} {right} "),
            F.lit(f" {left}{right} "),
        )
    )


def fit_bpe(
    df: DataFrame, text_col: str, num_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges. Returns the ordered merge list
    ``[(left, right, pair_count), …]`` and the final vocab frame
    (w, wc, seq) whose sequences have all merges applied — join it to
    a word stream to ENCODE (see :func:`bpe_token_counts`). Stops
    early only if no pair occurs at all."""
    from dataset_grouper_spark.cache import persist_tracked

    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = persist_tracked(word_vocab(df, text_col))
    prev = vocab
    merges: list[tuple[str, str, int]] = []
    for i in range(num_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((l, r, cnt))
        vocab = vocab.withColumn("seq", _merge_expr(F.col("seq"), l, r))
        if (i + 1) % _PERSIST_EVERY == 0:
            # re-materialize so later pair counts don't re-run the
            # whole replace chain from the base vocabulary — and drop
            # the PREVIOUS persisted copy, keeping executor storage at
            # one vocab regardless of num_merges (the PageRank loop's
            # _release_truncated discipline). Materialize first: the
            # new frame's lineage runs through the old cache, so
            # unpersisting before the count would recompute from base.
            vocab = persist_tracked(vocab)
            vocab.count()
            prev.unpersist()
            prev = vocab
    return merges, vocab


def bpe_token_counts(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode-side accounting: per document, the BPE token count under
    the fitted vocabulary (one join of the doc word stream against the
    vocab — broadcast by size-based planning at typical vocab sizes).
    Non-ASCII words were excluded from the fit and are excluded here
    too (the documented limitation)."""
    doc_words = (
        df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
        )
        .filter(F.col("w").rlike(ASCII_WORD))
    )
    v = vocab.select("w", F.size(F.split(F.col("seq"), " ")).alias("_ntok"))
    return (
        doc_words.join(v, "w")
        .groupBy(id_col)
        .agg(F.sum("_ntok").alias("n_bpe_tokens"))
    )


def _fit_ctes(table: str, text_col: str, num_merges: int) -> str:
    """The unrolled CTE chain shared by both SQL twins: words -> v0 ->
    (p{i}, m{i}, v{i}) per merge — p{i} counts pairs of v{i-1}, m{i} is
    its argmax, v{i} applies the merge via scalar subqueries into
    replace(). Every stage is MATERIALIZED: each v{t} references m{t}
    four times, and DuckDB's default CTE inlining would re-expand the
    whole chain per reference — exponential plan growth (observed as a
    file-handle explosion at merely 8 merges)."""
    parts = [
        f"""words AS MATERIALIZED (
          SELECT w, count(*) AS wc FROM (
            SELECT unnest({tokens_sql(text_col)}) AS w FROM {table}
          ) WHERE regexp_matches(w, '{ASCII_WORD}')
          GROUP BY w
        )""",
        f"""v0 AS MATERIALIZED (
          SELECT w, wc,
                 array_to_string(regexp_split_to_array(w, ''), ' ')
                   || ' {EOW}' AS seq
          FROM words
        )""",
    ]
    for t in range(1, num_merges + 1):
        p = t - 1
        parts.append(
            f"""p{t} AS MATERIALIZED (
              SELECT s[i] AS l, s[i + 1] AS r, sum(wc) AS cnt
              FROM (SELECT wc, string_split(seq, ' ') AS s FROM v{p}),
                   unnest(generate_series(1, len(s) - 1)) AS g(i)
              GROUP BY 1, 2
            )"""
        )
        parts.append(
            f"""m{t} AS MATERIALIZED (
              SELECT l, r, cnt FROM p{t}
              ORDER BY cnt DESC, l, r LIMIT 1
            )"""
        )
        parts.append(
            f"""v{t} AS MATERIALIZED (
              SELECT w, wc,
                     trim(replace(' ' || seq || ' ',
                       ' ' || (SELECT l FROM m{t}) || ' '
                           || (SELECT r FROM m{t}) || ' ',
                       ' ' || (SELECT l FROM m{t})
                           || (SELECT r FROM m{t}) || ' ')) AS seq
              FROM v{p}
            )"""
        )
    return ",\n".join(parts)


def fit_bpe_sql(table: str, text_col: str, num_merges: int) -> str:
    """DuckDB twin of :func:`fit_bpe`'s merge table."""
    selects = " UNION ALL ".join(
        f"SELECT {t} AS merge_rank, l AS merge_left, r AS merge_right, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM m{t}"
        for t in range(1, num_merges + 1)
    )
    return (
        "WITH " + _fit_ctes(table, text_col, num_merges) + "\n" + selects
    )


def bpe_token_counts_sql(
    table: str, text_col: str, id_col: str, num_merges: int
) -> str:
    """DuckDB twin of :func:`bpe_token_counts` under a fit on the same
    table (reuses the unrolled stages; the final v{N} is the vocab)."""
    return f"""
      WITH {_fit_ctes(table, text_col, num_merges)},
      doc_words AS (
        SELECT * FROM (
          SELECT {id_col}, unnest({tokens_sql(text_col)}) AS w
          FROM {table}
        ) WHERE regexp_matches(w, '{ASCII_WORD}')
      )
      SELECT d.{id_col},
             CAST(sum(len(string_split(v.seq, ' '))) AS BIGINT)
               AS n_bpe_tokens
      FROM doc_words d
      JOIN v{num_merges} v ON v.w = d.w
      GROUP BY d.{id_col}
    """
