"""Deterministic, engine-portable hashing primitives.

All dedup/similarity operators hash strings through md5 and take the
first 15 hex digits as a 60-bit non-negative bigint. md5 is available
and bit-identical in every engine (Spark, DuckDB, Trino, ...), unlike
engine-native hash functions (xxhash64 seeds and variants differ), so
every derived signature — minhash, simhash, LSH band keys, fingerprints
— is reproducible cross-engine and can be oracle-checked in SQL.

Universal-hash family for minhash: h_i(x) = (a_i * x + b_i) mod p with
p = 2^31 - 1 (Mersenne prime) — the standard construction (Broder
1997, "On the resemblance and containment of documents"). p is kept at
31 bits so a_i * x stays within int64 in any SQL engine; a 31-bit
minhash space is ample for signature comparison (collision probability
~n/2^31 per permutation).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1


def md5_long(c: Column) -> Column:
    """60-bit bigint from md5 — deterministic cross-engine string hash."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB twin of md5_long."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def round_even(c: Column, digits: int) -> Column:
    """Banker's rounding on the BINARY double — rint(x*10^d)/10^d.
    This is bit-identical to numpy's np.round and DuckDB's round_even
    (both are literally this formulation), unlike F.round/round()
    which operate HALF_UP on the DECIMAL shortest-repr and diverge
    from numpy on decimal midpoints (2.675 -> 2.68 vs 2.67). Used by
    every cosine path so the Catalyst, numpy, and DuckDB spellings of
    one score are the same float."""
    p = F.lit(float(10**digits))
    return F.call_function("rint", c * p) / p


def round_even_sql(expr: str, digits: int) -> str:
    """DuckDB twin of :func:`round_even` (round_even(v, s) is
    nearbyint(v * 10^s) / 10^s on DOUBLE — the same ops)."""
    return f"round_even({expr}, {digits})"


def tokens_sql(text_col: str) -> str:
    """DuckDB twin of :func:`tokens` — strip outer whitespace, split on
    single spaces (empty text -> one empty token, matching textstats
    word semantics). One definition repo-wide: any tokenizer change
    must hit Spark and SQL together or cross-engine oracles break."""
    return (
        f"string_split(regexp_replace(coalesce({text_col}, ''), "
        "'^\\s+|\\s+$', '', 'g'), ' ')"
    )


def tokens(c: Column) -> Column:
    """Single-space word tokens (textstats word semantics)."""
    return F.split(
        F.regexp_replace(F.coalesce(c, F.lit("")), r"^\s+|\s+$", ""), " ", -1
    )


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array
    column. Performance note: pass a plain column reference, not the
    tokenization expression itself — Catalyst does not CSE
    subexpressions inside higher-order-function lambdas, so embedding
    the split() here re-evaluates it per shingle (measured 10x slower).
    element_at is used instead of slice for the same reason.

    Docs with fewer than ``n`` tokens yield an EMPTY array — guarded
    explicitly because Spark's ``sequence(1, 0)`` counts DOWN (unlike
    DuckDB's empty ``generate_series``), which would feed ANSI-strict
    ``element_at`` out-of-bounds indices and throw.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(c: Column, n: int) -> Column:
    """Word-level n-gram shingles of a text column as array<string>.

    Convenience expression form; for hot paths prefer projecting
    ``tokens()`` into a column first and calling ``ngrams_of_tokens``
    (see that function's performance note).
    """
    return ngrams_of_tokens(tokens(c), n)


def minhash_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """(a_i, b_i) pairs for the universal-hash family, seeded."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, MERSENNE31, size=num_perm, dtype=np.int64)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def perm_hash(h: Column, a: int, b: int) -> Column:
    """(a * (h mod p) + b) mod p, p = 2^31-1. a,b < p and h mod p < p,
    so the product stays < 2^62 — safe int64 arithmetic everywhere.
    """
    p = MERSENNE31
    return F.pmod(F.lit(a) * F.pmod(h, F.lit(p)) + F.lit(b), F.lit(p))


def perm_hash_sql(h_expr: str, a: int, b: int) -> str:
    """DuckDB twin of perm_hash (h_expr must be non-negative)."""
    p = MERSENNE31
    return f"(({a} * (({h_expr}) % {p}) + {b}) % {p})"
