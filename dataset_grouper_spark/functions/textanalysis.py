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


# Karp-Rabin polynomial hash parameters, shared by both engines:
# h(c_1..c_k) = fold((acc, c) -> (acc * B + c) mod P) over codepoints.
# P is the largest prime below 2^55, chosen so the fold needs NO
# 128-bit arithmetic in either engine: acc < P, so
# acc*B + c < (2^55)·131 + 2^21 < 2^63 fits a plain int64 product —
# one multiply, one add, one pmod per character. The 55-bit space
# keeps corpus-scale fingerprint joins out of birthday trouble (a
# 31-bit space would collide constantly at 10^8 docs).
KR_P: int = 36028797018963913  # largest prime < 2^55
KR_B: int = 131


def winnow_fingerprints(
    df,
    text_col: str,
    id_col: str,
    k: int = 8,
    window: int = 4,
    parallelism: int | None = None,
):
    """Rolling-hash document fingerprints by winnowing (Schleimer,
    Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
    Fingerprinting", SIGMOD 2003 — the MOSS algorithm): hash every
    char ``k``-gram of the normalized text with the paper's actual
    hash family — a Karp-Rabin polynomial hash over codepoints, O(k)
    integer multiply-adds per position instead of an md5 invocation
    (the md5 kernel was the repo's slowest bench query; the polynomial
    kernel is pure int64 arithmetic) — slide a ``window`` over
    consecutive positions, keep each window's MIN hash, output the
    distinct selected hashes per doc.

    Guarantees: any shared substring of length >= k + window - 1
    produces at least one shared fingerprint, so matching docs on
    fingerprints finds partial overlap (quote/boilerplate reuse) that
    whole-doc hashing misses — with a ~2/(window+1) sampling density
    instead of every position.

    Plan shape: ONE narrow projection — the codepoint array, the
    k-gram hashes, the window mins, and the distinct-select are all
    Catalyst higher-order functions over per-row arrays (no explode of
    the char stream; by default no shuffle). The rolling fold and the
    window-min are both expressed as ``zip_with`` over SHIFTED SLICES
    of whole per-row arrays — k (resp. window-1) array-sized lambda
    passes per row — rather than a per-position ``aggregate`` over a
    per-position ``slice``: HOF lambdas are interpreted, and the
    whole-array formulation allocates k arrays per ROW instead of one
    slice + fold state per POSITION (measured 1.6x faster at sf0.1,
    identical values). Selection is by min VALUE (ties collapse via
    the distinct set), which keeps the output engine-portable.

    ``parallelism``: the cascade is CPU-bound per row; when the input
    has fewer splits than cores (one small parquet file -> one
    partition), pass the core count to repartition the normalized
    rows first — a shuffle of raw text rows, tiny at small scale. At
    100 TB the input has thousands of splits, so the default (None,
    shuffle-free) is the scale posture.

    Returns (id_col, fingerprint) one row per distinct fingerprint.
    Docs shorter than ``k`` chars produce no rows.

    Catalyst care: the normalized text is split to a codepoint array
    ONCE per row before the slicing lambdas (substr on a UTF-8 string
    is an O(i) byte scan — per-position substr would be quadratic).
    CollapseProject INLINES a single-referenced alias into consuming
    lambdas even when it is expensive — which would re-run the
    split+ascii transform at every position (observed: O(n^2), minutes
    instead of seconds at sf0.1) — so every projection below
    references ``_cs`` (and ``_t``) at least twice, pinning the
    projection boundary (the rule refuses to duplicate non-cheap
    multi-referenced expressions). Codepoints come from
    ascii()/unicode(), which agree across engines for the Basic
    Multilingual Plane (astral chars differ — Spark sees UTF-16
    surrogates — an accepted, documented limitation).
    """
    norm = df.select(
        F.col(id_col), _norm_text(F.col(text_col)).alias("_t")
    ).filter(F.length("_t") >= F.lit(k))  # 2nd _t ref: pins _norm_text
    if parallelism:
        norm = norm.repartition(parallelism)
    codepoints = F.transform(
        F.split(F.col("_t"), ""), lambda ch: F.ascii(ch).cast("long")
    )
    withcs = norm.select(F.col(id_col), codepoints.alias("_cs"))
    np_ = F.size("_cs") - F.lit(k - 1)  # >= 1 after the length filter
    # rolling fold as k whole-array passes: after step j, H[i] is the
    # hash of cs[i..i+j]; after all k steps, H[i] hashes the k-gram at i
    hashes = F.transform(
        F.slice(F.col("_cs"), 1, np_), lambda c: F.lit(0).cast("long")
    )
    for j in range(k):
        hashes = F.zip_with(
            hashes,
            F.slice(F.col("_cs"), 1 + j, np_),
            lambda h, c: F.pmod(h * F.lit(KR_B) + c, F.lit(KR_P)),
        )
    hs = withcs.select(
        F.col(id_col),
        hashes.alias("_hs"),
        F.greatest(np_ - F.lit(window - 1), F.lit(1)).alias("_nw"),
    )
    # window-min as window-1 shifted least() passes. Trailing windows
    # of a doc shorter than `window` positions produce short slices;
    # zip_with pads with NULL and least() skips NULLs, so the min is
    # over the available positions — same truncation as the SQL twin.
    mins = F.slice(F.col("_hs"), 1, F.col("_nw"))
    for j in range(1, window):
        mins = F.zip_with(
            mins,
            F.slice(F.col("_hs"), 1 + j, F.col("_nw")),
            lambda a, b: F.least(a, b),
        )
    return hs.select(
        F.col(id_col),
        F.explode(F.array_distinct(mins)).alias("fingerprint"),
    )


def winnow_fingerprints_sql(
    table: str, text_col: str, id_col: str, k: int = 8, window: int = 4
) -> str:
    """DuckDB twin of winnow_fingerprints: the same Karp-Rabin fold
    ``(acc * B + c) mod P`` unrolled k times in plain BIGINT (P < 2^55
    keeps every product inside int64 — identical arithmetic to the
    Spark fold). The textual unroll references the previous step once,
    so the generated expression grows linearly in k."""
    norm = f"regexp_replace(lower(coalesce({text_col}, '')), '\\s+', ' ', 'g')"
    stripped = f"regexp_replace({norm}, '^\\s+|\\s+$', '', 'g')"
    h = "CAST(0 AS BIGINT)"
    for j in range(k):
        h = f"(({h}) * {KR_B} + cs[i + {j}]) % {KR_P}"
    return f"""
      WITH nt AS (
        SELECT {id_col} AS _id,
               list_transform(string_split({stripped}, ''),
                              ch -> unicode(ch)) AS cs
        FROM {table}
      ),
      hs AS (
        SELECT _id,
               list_transform(
                 generate_series(1, greatest(len(cs) - {k - 1}, 0)),
                 i -> CAST({h} AS BIGINT)
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
