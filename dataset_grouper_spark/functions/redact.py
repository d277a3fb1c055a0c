"""PII redaction — regex scrub of emails / IPv4s / phone-like runs.

A standard pre-training hygiene pass (C4 and friends strip or mask
contact strings before anything else sees the text). Pure Catalyst
``regexp_replace`` / ``regexp_count`` — no UDF, whole-stage codegen —
and every pattern is written in the common subset of Java regex
(Spark) and RE2 (DuckDB) so the oracle twin matches byte-for-byte:
character classes, bounded quantifiers, and ``\\b`` only; no
lookaround, no backrefs.

Order matters and is part of the contract: emails first (their local
part can contain digits a later pass would chew on), then IPv4, then
phone-like digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"

EMAIL_TOKEN, IPV4_TOKEN, PHONE_TOKEN = "<EMAIL>", "<IP>", "<PHONE>"


def redact_pii(c: Column | str) -> Column:
    """Text with emails, IPv4 addresses, and phone-like digit runs
    replaced by typed tokens. NULL-safe (NULL -> '')."""
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(
        F.coalesce(col, F.lit("")), EMAIL_RE, EMAIL_TOKEN
    )
    out = F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_counts(c: Column | str) -> list[Column]:
    """Per-type match counts over the ORIGINAL text (aliased
    n_emails / n_ips / n_phones) — the audit twin of redact_pii."""
    col = F.col(c) if isinstance(c, str) else c
    safe = F.coalesce(col, F.lit(""))
    return [
        F.regexp_count(safe, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(safe, EMAIL_RE, EMAIL_TOKEN), F.lit(IPV4_RE)
        ).alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(safe, EMAIL_RE, EMAIL_TOKEN),
                IPV4_RE,
                IPV4_TOKEN,
            ),
            F.lit(PHONE_RE),
        ).alias("n_phones"),
    ]


def redact_table(
    df: DataFrame, text_col: str, out_col: str | None = None
) -> DataFrame:
    """``df`` with ``text_col`` redacted (in place, or into
    ``out_col``) plus the three audit count columns."""
    target = out_col or text_col
    return df.select("*", *pii_counts(text_col)).withColumn(
        target, redact_pii(text_col)
    )
