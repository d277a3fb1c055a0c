"""Gopher-style document quality filtering (Rae et al. 2021, §A1.1).

Rule-based pre-training quality gates, re-expressed as pure Catalyst
column expressions — no Python in the hot path, so the filter rides
whole-stage codegen and pushes straight onto the parquet scan's
projection. Each signal has a DuckDB SQL twin (same tokenization, same
arithmetic) so the whole feature vector is oracle-checkable.

Signals (thresholds from the public Gopher paper; all configurable):
- word count in [min_words, max_words]
- mean word length in [3, 10]
- symbol-to-word ratio ('#' and '...') below 0.1
- fraction of lines starting with a bullet below 0.9
- fraction of lines ending with an ellipsis below 0.3
- at least 2 distinct common English stopwords present

Scale: one projection over the corpus, zero shuffles until the caller
aggregates. The line-level fractions use array HOFs (filter/size) on a
split — per-row work linear in doc length, no explode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_ratio=0.1,
    max_bullet_frac=0.9,
    max_ellipsis_frac=0.3,
    min_stop_hits=2,
)


def _char_count(c: Column, token: str) -> Column:
    """Occurrences of a literal substring, by length delta (portable
    to any SQL engine, stays in codegen)."""
    return (
        F.length(c) - F.length(F.replace(c, F.lit(token), F.lit("")))
    ) / F.lit(len(token))


def quality_signals(text: Column) -> dict[str, Column]:
    """The raw Gopher signal columns for one text column.

    Word tokenization matches textstats.words_expr: trim, collapse
    runs of whitespace, split on single space; '' counts 0 words.
    """
    raw = F.coalesce(text, F.lit(""))
    # strip ALL outer whitespace: trim() removes only spaces, so a
    # trailing newline would survive the collapse as ' ' and split
    # into a phantom empty token (word_count +1, mean_word_len down —
    # enough to flip docs at the Gopher gates)
    norm = F.regexp_replace(
        F.regexp_replace(raw, r"^\s+|\s+$", ""), r"\s+", " "
    )
    wc = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    # sum(len(word)) == len(norm) - (wc-1) separators; avoids an explode
    mean_wl = F.when(
        wc > 0,
        F.round((F.length(norm) - (wc - 1)) / wc.cast("double"), 4),
    ).otherwise(F.lit(0.0))
    symbols = _char_count(raw, "#") + _char_count(raw, "...")
    symbol_ratio = F.when(
        wc > 0, F.round(symbols / wc.cast("double"), 4)
    ).otherwise(F.lit(0.0))

    lines = F.split(raw, "\n")
    nl = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda x: F.ltrim(x).rlike(r"^[-*•]"))
    )
    ellip = F.size(F.filter(lines, lambda x: F.rtrim(x).endswith("...")))
    bullet_frac = F.when(
        nl > 0, F.round(bullet / nl.cast("double"), 4)
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        nl > 0, F.round(ellip / nl.cast("double"), 4)
    ).otherwise(F.lit(0.0))

    padded = F.concat(F.lit(" "), F.lower(norm), F.lit(" "))
    stop_hits = sum(
        (
            F.contains(padded, F.lit(f" {w} ")).cast("int")
            for w in STOPWORDS
        ),
        F.lit(0),
    ).cast("long")
    return {
        "word_count": wc.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "stop_hits": stop_hits,
    }


def gopher_keep(sig: dict[str, Column], **overrides) -> Column:
    """The conjunction of Gopher rules over :func:`quality_signals`."""
    t = {**DEFAULTS, **overrides}
    return (
        sig["word_count"].between(t["min_words"], t["max_words"])
        & sig["mean_word_len"].between(
            t["min_mean_word_len"], t["max_mean_word_len"]
        )
        & (sig["symbol_ratio"] < t["max_symbol_ratio"])
        & (sig["bullet_frac"] < t["max_bullet_frac"])
        & (sig["ellipsis_frac"] < t["max_ellipsis_frac"])
        & (sig["stop_hits"] >= t["min_stop_hits"])
    )


def gopher_quality(
    df: DataFrame, text_col: str, id_col: str, **overrides
) -> DataFrame:
    """Per-document Gopher signal vector + keep flag (flags every doc
    rather than filtering, so downstream can audit rejection reasons;
    ``df.filter(F.col('keep'))`` is the filtering form)."""
    sig = quality_signals(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[v.alias(k) for k, v in sig.items()],
        gopher_keep(sig, **overrides).alias("keep"),
    )


def gopher_quality_sql(
    table: str, text_col: str, id_col: str, **overrides
) -> str:
    """DuckDB twin of :func:`gopher_quality` (same tokenization and
    arithmetic, engine-portable)."""
    t = {**DEFAULTS, **overrides}
    stops = " + ".join(
        f"CAST(contains(_pad, ' {w} ') AS INT)" for w in STOPWORDS
    )
    return f"""
        WITH base AS (
          SELECT {id_col},
                 coalesce({text_col}, '') AS _raw,
                 regexp_replace(regexp_replace(coalesce({text_col}, ''),
                                '^\\s+|\\s+$', '', 'g'),
                                '\\s+', ' ', 'g') AS _norm
          FROM {table}
        ), feat AS (
          SELECT {id_col}, _raw, _norm,
                 CASE WHEN _norm = '' THEN 0
                      ELSE len(string_split(_norm, ' ')) END AS _wc,
                 string_split(_raw, chr(10)) AS _lines,
                 concat(' ', lower(_norm), ' ') AS _pad
          FROM base
        ), sig AS (
          SELECT {id_col},
            CAST(_wc AS BIGINT) AS word_count,
            CASE WHEN _wc > 0 THEN
              round((length(_norm) - (_wc - 1)) / CAST(_wc AS DOUBLE), 4)
            ELSE 0.0 END AS mean_word_len,
            CASE WHEN _wc > 0 THEN
              round(((strlen(_raw) - strlen(replace(_raw, '#', '')))
                     + (strlen(_raw) - strlen(replace(_raw, '...', ''))) / 3)
                    / CAST(_wc AS DOUBLE), 4)
            ELSE 0.0 END AS symbol_ratio,
            CASE WHEN len(_lines) > 0 THEN
              round(len(list_filter(_lines,
                        x -> regexp_matches(ltrim(x), '^[-*•]')))
                    / CAST(len(_lines) AS DOUBLE), 4)
            ELSE 0.0 END AS bullet_frac,
            CASE WHEN len(_lines) > 0 THEN
              round(len(list_filter(_lines, x -> ends_with(rtrim(x), '...')))
                    / CAST(len(_lines) AS DOUBLE), 4)
            ELSE 0.0 END AS ellipsis_frac,
            CAST({stops} AS BIGINT) AS stop_hits
          FROM feat
        )
        SELECT *,
               (word_count BETWEEN {t["min_words"]} AND {t["max_words"]}
                AND mean_word_len BETWEEN {t["min_mean_word_len"]}
                                      AND {t["max_mean_word_len"]}
                AND symbol_ratio < {t["max_symbol_ratio"]}
                AND bullet_frac < {t["max_bullet_frac"]}
                AND ellipsis_frac < {t["max_ellipsis_frac"]}
                AND stop_hits >= {t["min_stop_hits"]}) AS keep
        FROM sig
    """
