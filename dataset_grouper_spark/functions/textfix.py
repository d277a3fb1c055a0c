"""Web-text normalization — the cleaning pass BEFORE quality/dedup.

Raw crawl text arrives with markup, HTML entities, CP1252→UTF-8
double-encoding mojibake ("Ã©" where "é" was meant), control
characters, and ragged whitespace. Every downstream signal (shingles,
quality ratios, LM scores) is distorted until these are fixed, so this
runs first — as pure Catalyst expression cascades (regexp/replace
chains, JVM-side, zero Python), with DuckDB twins built from the same
tables so the transform is cross-engine exact.

Scope, stated honestly: `strip_html` removes tags/comments and decodes
the COMMON named entities (the closed table below) plus numeric
references is out of scope (needs a codepoint decoder — chr() on a
captured group isn't expressible in either engine's regexp_replace);
`fix_mojibake` repairs the most frequent double-encodings via a closed
replacement table (the full ftfy algorithm is iterative heuristics).
Both tables are module constants — extending them extends both engines
at once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# common named entities (closed table, both engines). ``&amp;`` is
# LAST so nested/double-encoded entities decode one level only:
# '&amp;lt;' must become the literal text '&lt;', not '<' — standard
# entity decoding always processes the ampersand escape last.
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# CP1252/Latin-1-as-UTF8 double-encoding repairs, DERIVED rather than
# spelled: for each target char, encode to UTF-8 and misdecode the
# bytes the two common wrong ways — correct by construction (literal
# mojibake strings in source are themselves mangle-prone, proven here
# twice), and the SQL twin iterates the same table.
def _mojibake_pairs() -> list[tuple[str, str]]:
    targets = "\u00e9\u00e8\u00e0\u00fc\u00f6\u00e4\u00f1\u2019\u201c\u201d\u2013\u2014"
    out: list[tuple[str, str]] = []
    for ch in targets:
        raw = ch.encode("utf-8")
        for codec in ("cp1252", "latin-1"):
            try:
                bad = raw.decode(codec)
            except UnicodeDecodeError:
                continue
            if bad != ch and (bad, ch) not in out:
                out.append((bad, ch))
    return out


MOJIBAKE: list[tuple[str, str]] = _mojibake_pairs()

_TAG_RE = "<[^>]*>"
_COMMENT_RE = "(?s)<!--.*?-->"
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_WS_RE = "[ \\t\\r\\n]+"


def strip_html(c: Column | str) -> Column:
    """Remove comments then tags (comments first — they may contain
    ``>``), decode the common entities, leaving plain text."""
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(col, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def fix_mojibake(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    for bad, good in MOJIBAKE:
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def normalize_whitespace(c: Column | str) -> Column:
    """Strip control chars, collapse runs of blanks/newlines to one
    space, trim."""
    col = F.col(c) if isinstance(c, str) else c
    out = F.regexp_replace(col, _CTRL_RE, " ")
    out = F.regexp_replace(out, _WS_RE, " ")
    return F.trim(out)


def clean_text(c: Column | str) -> Column:
    """The full cascade: html -> mojibake -> whitespace."""
    return normalize_whitespace(fix_mojibake(strip_html(c)))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_text` (same tables, same order)."""
    out = f"regexp_replace({expr}, '{_COMMENT_RE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_TAG_RE}', ' ', 'g')"
    for ent, ch in ENTITIES:
        out = f"replace({out}, {_sql_quote(ent)}, {_sql_quote(ch)})"
    for bad, good in MOJIBAKE:
        out = f"replace({out}, {_sql_quote(bad)}, {_sql_quote(good)})"
    out = f"regexp_replace({out}, '{_CTRL_RE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_WS_RE}', ' ', 'g')"
    return f"trim({out})"
