"""URL canonicalization — the dedup-key normalizer for web corpora.

Web-scale pipelines (C4, RefinedWeb) dedup documents by URL before any
content pass; raw URLs are noisy (tracking params, fragments, case,
``www.``), so the key must be canonical first. Pure Catalyst regex —
every pattern sits in the Java-regex/RE2 common subset so the DuckDB
oracle twin transforms byte-identically (the only engine difference is
replacement backref syntax: ``$1`` here, ``\\1`` in the SQL twin).

Canonical form, applied in this order (order is part of the contract):
1. drop the ``#fragment``
2. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``)
3. collapse separator debris (``?&`` -> ``?``, ``&&`` runs -> ``&``,
   trailing ``?``/``&`` dropped)
4. lowercase the scheme+host (path/query case is significant)
5. strip a ``www.`` host prefix
6. strip one trailing ``/``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FRAGMENT_RE = r"#.*$"
TRACKING_RE = r"([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)=[^&#]*"
_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$"


def canonicalize_url(c: Column | str) -> Column:
    u = F.col(c) if isinstance(c, str) else c
    u = F.regexp_replace(F.coalesce(u, F.lit("")), FRAGMENT_RE, "")
    u = F.regexp_replace(u, TRACKING_RE, "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&{2,}", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # lowercase the scheme+host ONLY when the string actually starts
    # with scheme:// — gating on a bare '://' substring would send
    # strings like 'see http://a.com' through the anchored extract,
    # which matches nothing and collapsed them all to '' (one shared
    # dedup key for every malformed-prefix URL)
    u = F.when(
        u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"),
        F.concat(
            F.lower(F.regexp_extract(u, _SCHEME_HOST_RE, 1)),
            F.regexp_extract(u, _SCHEME_HOST_RE, 2),
        ),
    ).otherwise(u)
    # anchored: strip the HOST's www. prefix only, never an embedded
    # '://www.' inside a query-string redirect target
    u = F.regexp_replace(
        u, r"^([A-Za-z][A-Za-z0-9+.-]*://)www\.", "$1"
    )
    return F.regexp_replace(u, r"/$", "")


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` (same passes, same
    order; RE2 replacement backrefs are ``\\1``). NULL-safe like the
    Spark side (coalesce first — the chain would otherwise propagate
    NULL where Spark yields '')."""
    u = f"regexp_replace(coalesce({url_expr}, ''), '{FRAGMENT_RE}', '', 'g')"
    u = f"regexp_replace({u}, '{TRACKING_RE}', '\\1', 'g')"
    u = f"regexp_replace({u}, '\\?&+', '?', 'g')"
    u = f"regexp_replace({u}, '&{{2,}}', '&', 'g')"
    u = f"regexp_replace({u}, '[?&]+$', '', 'g')"
    u = (
        f"(CASE WHEN regexp_matches({u}, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN "
        f"lower(regexp_extract({u}, '{_SCHEME_HOST_RE}', 1)) || "
        f"regexp_extract({u}, '{_SCHEME_HOST_RE}', 2) ELSE {u} END)"
    )
    u = f"regexp_replace({u}, '^([A-Za-z][A-Za-z0-9+.-]*://)www\\.', '\\1', 'g')"
    return f"regexp_replace({u}, '/$', '', 'g')"
