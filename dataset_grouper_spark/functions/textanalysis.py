"""Text-analysis column functions for training-data pipelines.

North-star extensions beyond the reference's surface (SURVEY §2.8):
language-ID (stopword-marker heuristic), quality scoring, token
counting (BPE-ish regex), and document fingerprinting. All pure
Catalyst expressions with DuckDB SQL twins for oracle checking —
no Python in the row path, so they vectorize at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import md5_long, md5_long_sql

# Tiny marker-word lists per language. A real pipeline plugs in a
# proper model (fastText etc.) behind the same column contract; the
# heuristic itself is the classic stopword-profile method.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "las", "es", "una"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _marker_regex(words: list[str]) -> str:
    alts = "|".join(words)
    return rf"\b({alts})\b"


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language marker-hit counts. NULL text coalesces to '' (like
    tokens/quality_features) so every score is 0 and lang_id falls
    through to 'und' instead of NULL-poisoning the argmax."""
    safe = F.coalesce(c, F.lit(""))
    return {
        lang: F.size(F.regexp_extract_all(safe, F.lit(_marker_regex(words)), 0))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(c: Column) -> Column:
    """Predicted language = argmax marker count, ties broken by language
    code order, 'und' when no marker hits at all.

    Implemented as ONE array of (score, lang) structs sorted by a
    comparator — each marker regex is evaluated exactly once per row.
    (A when/otherwise fold would reference each score in two branches
    per level, and Catalyst does not CSE across branches: 2^n regex
    evaluations — measured 3x slower on the corpus.) The 'und' entry
    scores 0.5, so it wins exactly when every real language scores 0.
    """
    scores = lang_scores(c)
    entries = F.array(
        *[
            F.struct(
                scores[lang].cast("double").alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(scores)
        ],
        F.struct(F.lit(0.5).alias("score"), F.lit("und").alias("lang")),
    )
    ranked = F.array_sort(
        entries,
        lambda l, r: F.when(l["score"] > r["score"], F.lit(-1))
        .when(l["score"] < r["score"], F.lit(1))
        .when(l["lang"] < r["lang"], F.lit(-1))
        .when(l["lang"] > r["lang"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return ranked.getItem(0)["lang"]


def lang_id_sql(expr: str) -> str:
    """DuckDB twin of lang_id (same fold, same tie-break)."""
    out_lang = "'und'"
    out_score = "0"
    for lang in sorted(LANG_MARKERS):
        pat = _marker_regex(LANG_MARKERS[lang])
        score = f"len(regexp_extract_all({expr}, '{pat}'))"
        out_lang = f"CASE WHEN {score} > {out_score} THEN '{lang}' ELSE {out_lang} END"
        out_score = f"CASE WHEN {score} > {out_score} THEN {score} ELSE {out_score} END"
    return out_lang


def token_count(c: Column) -> Column:
    """BPE-ish token count: alnum runs + single punctuation marks.
    NULL text counts 0 (the module's NULL-coalescing contract —
    a NULL here would NULL-poison every aggregate over the counts)."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(c, F.lit("")), F.lit(TOKEN_PATTERN), 0
        )
    ).cast("long")


def token_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all(coalesce({expr}, ''),"
        f" '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))"
        " AS BIGINT)"
    )


def quality_features(c: Column) -> dict[str, Column]:
    """Quality-signal columns: char/word counts, mean word length,
    punctuation and stopword ratios (all x1e4-rounded for stable
    cross-engine comparison).
    """
    stripped = F.regexp_replace(F.coalesce(c, F.lit("")), r"^\s+|\s+$", "")
    words = F.split(stripped, " ", -1)
    n_words = F.size(words)
    n_chars = F.octet_length(stripped)
    n_punct = F.size(F.regexp_extract_all(stripped, F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_stop = F.size(
        F.regexp_extract_all(stripped, F.lit(_marker_regex(LANG_MARKERS["en"])), 0)
    )
    avg_wl = F.round(n_chars / F.greatest(n_words, F.lit(1)), 4)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 4)
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "avg_word_len": avg_wl,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
    }


def quality_sql(expr: str) -> dict[str, str]:
    stripped = f"regexp_replace(coalesce({expr}, ''), '^\\s+|\\s+$', '', 'g')"
    n_words = f"len(string_split({stripped}, ' '))"
    n_chars = f"strlen({stripped})"
    n_punct = f"len(regexp_extract_all({stripped}, '[^A-Za-z0-9\\s]'))"
    en_pat = _marker_regex(LANG_MARKERS["en"])
    n_stop = f"len(regexp_extract_all({stripped}, '{en_pat}'))"
    return {
        "n_chars": f"CAST({n_chars} AS BIGINT)",
        "n_words": f"CAST({n_words} AS BIGINT)",
        "avg_word_len": f"round({n_chars} / greatest({n_words}, 1), 4)",
        "punct_ratio": f"round({n_punct} / greatest({n_chars}, 1), 4)",
        "stopword_ratio": f"round({n_stop} / greatest({n_words}, 1), 4)",
    }


def repetition_features(
    df, text_col: str, id_col: str, n: int = 2
):
    """Gopher-style repetition signals per doc (Rae et al. 2021,
    "Scaling Language Models", Table A1): the fraction of all word
    n-grams taken up by the single most frequent n-gram. High values
    flag boilerplate/spam for corpus filtering.

    Returns (id, n_ngrams, top_ngram_count, top_ngram_frac). Docs with
    fewer than n words are absent (no n-grams to judge).
    Shape: explode n-grams -> count per (doc, gram) -> max+sum per doc;
    two partial-aggregated groupBys on the same doc key, one shuffle
    chain, no Python.
    """
    from pyspark.sql import functions as F

    from dataset_grouper_spark.functions.hashing import ngrams_of_tokens, tokens

    grams = (
        df.select(
            F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t")
        )
        .select("_id", F.explode(ngrams_of_tokens(F.col("_t"), n)).alias("_g"))
    )
    per_gram = grams.groupBy("_id", "_g").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_gram.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.sum("_c").alias("n_ngrams"),
            F.max("_c").alias("top_ngram_count"),
        )
        .withColumn(
            "top_ngram_frac",
            F.round(F.col("top_ngram_count") / F.col("n_ngrams"), 6),
        )
    )


def repetition_sql(table: str, text_col: str, id_col: str, n: int = 2) -> str:
    """DuckDB twin of repetition_features."""
    stripped = f"regexp_replace(coalesce({text_col}, ''), '^\\s+|\\s+$', '', 'g')"
    terms = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
      WITH toks AS (
        SELECT {id_col} AS _id, string_split({stripped}, ' ') AS t
        FROM {table}
      ), grams AS (
        SELECT _id, {terms} AS g
        FROM toks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS u(i)
      ), per_gram AS (
        SELECT _id, g, count(*) AS c FROM grams GROUP BY _id, g
      )
      SELECT _id AS {id_col},
             CAST(sum(c) AS BIGINT) AS n_ngrams,
             CAST(max(c) AS BIGINT) AS top_ngram_count,
             round(max(c) * 1.0 / sum(c), 6) AS top_ngram_frac
      FROM per_gram GROUP BY _id
    """


def fingerprint(c: Column) -> Column:
    """Document fingerprint: 60-bit hash of whitespace-normalized,
    lowercased text. Stable under reformatting; cross-engine exact.
    """
    norm = F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " ")
    return md5_long(F.regexp_replace(norm, r"^\s+|\s+$", ""))


def fingerprint_sql(expr: str) -> str:
    norm = f"regexp_replace(lower(coalesce({expr}, '')), '\\s+', ' ', 'g')"
    stripped = f"regexp_replace({norm}, '^\\s+|\\s+$', '', 'g')"
    return md5_long_sql(stripped)


def _norm_text(c: Column) -> Column:
    norm = F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " ")
    return F.regexp_replace(norm, r"^\s+|\s+$", "")


def winnow_fingerprints(
    df, text_col: str, id_col: str, k: int = 8, window: int = 4
):
    """Rolling-hash document fingerprints by winnowing (Schleimer,
    Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — the MOSS algorithm): hash every
    char ``k``-gram of the normalized text, slide a ``window`` over
    consecutive positions, keep each window's MIN hash, output the
    distinct selected hashes per doc.

    Guarantees: any shared substring of length >= k + window - 1
    produces at least one shared fingerprint, so matching docs on
    fingerprints finds partial overlap (quote/boilerplate reuse) that
    whole-doc hashing misses — with a ~2/(window+1) sampling density
    instead of every position.

    Plan shape: ONE narrow projection — the k-gram hashes, the window
    mins, and the distinct-select are all Catalyst higher-order
    functions over per-row arrays (no explode of the char stream, no
    shuffle). Selection is by min VALUE (ties collapse via the distinct
    set), which keeps the output engine-portable.

    Returns (id_col, fingerprint) one row per distinct fingerprint.
    Docs shorter than ``k`` chars produce no rows.

    Catalyst care: the normalized text is projected to a plain column
    BEFORE the k-gram lambda (no CSE inside HOF lambdas — the regex
    chain would re-run per position), and both sequences are
    guaranteed ascending (Spark's sequence(1, 0) counts DOWN).
    """
    base = (
        df.select(F.col(id_col), _norm_text(F.col(text_col)).alias("_t"))
        .withColumn("_np", F.length("_t") - F.lit(k - 1))
        .filter(F.col("_np") > 0)
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.col("_np")),
        lambda i: md5_long(F.col("_t").substr(i, F.lit(k))),
    )
    hs = base.select(
        F.col(id_col),
        hashes.alias("_hs"),
        F.greatest(F.col("_np") - F.lit(window - 1), F.lit(1)).alias("_nw"),
    )
    fps = F.transform(
        F.sequence(F.lit(1), F.col("_nw")),
        lambda j: F.array_min(F.slice(F.col("_hs"), j, window)),
    )
    return hs.select(
        F.col(id_col),
        F.explode(F.array_distinct(fps)).alias("fingerprint"),
    )


def winnow_fingerprints_sql(
    table: str, text_col: str, id_col: str, k: int = 8, window: int = 4
) -> str:
    """DuckDB twin of winnow_fingerprints."""
    norm = f"regexp_replace(lower(coalesce({text_col}, '')), '\\s+', ' ', 'g')"
    stripped = f"regexp_replace({norm}, '^\\s+|\\s+$', '', 'g')"
    h = md5_long_sql(f"substr(t, CAST(i AS INT), {k})")
    return f"""
      WITH nt AS (
        SELECT {id_col} AS _id, {stripped} AS t FROM {table}
      ),
      hs AS (
        SELECT _id,
               list_transform(
                 generate_series(1, greatest(length(t) - {k - 1}, 0)),
                 i -> {h}
               ) AS hl
        FROM nt
      ),
      wm AS (
        SELECT _id,
               list_distinct(list_transform(
                 generate_series(
                   1, greatest(len(hl) - {window - 1}, 1)
                 ),
                 j -> list_min(list_slice(hl, j, j + {window - 1}))
               )) AS fps
        FROM hs WHERE len(hl) > 0
      )
      SELECT _id AS {id_col}, unnest(fps) AS fingerprint FROM wm
    """
