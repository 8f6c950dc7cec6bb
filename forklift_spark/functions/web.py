"""Web-corpus column helpers: URL parsing/canonicalization, registered
domains, HTML stripping.

No reference counterpart (taskrabbit/forklift syncs relational rows);
these are the web-curation passes a crawl-derived training corpus needs
before any dedup/quality stage, and they are deliberately all JVM-side
built-ins (parse_url / regexp / string functions) — URL and HTML
hygiene runs at scan speed over 100 TB, no Python in the path.

Engine-exactness: every helper is mirrored by a DuckDB-SQL rendering in
queries/web.py oracles; regex patterns are restricted to the syntax
subset Java regex and RE2 share (no lookaround, no backrefs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_part(url: Column | str, part: str) -> Column:
    """One URL component via Spark's parse_url: PROTOCOL | HOST | PATH |
    QUERY (HOST excludes the port)."""
    return F.parse_url(_col(url), F.lit(part))


# Tracking parameters stripped by canonicalization: the utm_* family plus
# common session/click ids. The name is anchored to a parameter BOUNDARY
# (string start or '&') — an unanchored alternation would also strip the
# tail of innocent parameters like `psid=9` or `classid=7`, fabricating
# parameters that never existed. Alternation kept RE2-compatible.
_TRACKING_PARAM_RE = r"(^|&)(utm_[a-z]+|sid|fbclid|gclid)=[^&]*"


def clean_query(query: Column | str) -> Column:
    """Drop tracking parameters from a raw query string (no leading '?'):
    remove each boundary-anchored `param=value`, then any leading
    separator the removal exposed."""
    q = F.regexp_replace(_col(query), _TRACKING_PARAM_RE, "")
    return F.regexp_replace(q, r"^&", "")


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form for URL-level dedup: scheme and authority
    lowercased with only the scheme's DEFAULT port removed (RFC 3986
    §6.2.3 — dropping every explicit port would conflate distinct
    resources like host:8080 with host), path kept verbatim, tracking
    params stripped from the query, empty query dropped."""
    u = _col(url)
    scheme = F.lower(url_part(u, "PROTOCOL"))
    auth = F.lower(F.coalesce(url_part(u, "AUTHORITY"), F.lit("")))
    host = (
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .otherwise(auth)
    )
    path = F.coalesce(url_part(u, "PATH"), F.lit(""))
    q = clean_query(F.coalesce(url_part(u, "QUERY"), F.lit("")))
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


# Two-level public suffixes handled by the demo extractor; a production
# deployment swaps in the full public-suffix list (same expression shape,
# longer alternation or a broadcast-joined suffix table).
_REGISTERED_DOMAIN_RE = r"([^.]+\.(?:co\.uk|com|org|io|net))$"


def registered_domain(host: Column | str) -> Column:
    """Registrable domain of a (possibly mixed-case) host: the last
    label plus its public suffix, understanding two-level suffixes like
    co.uk — `www.example.co.uk` -> `example.co.uk`."""
    return F.regexp_extract(F.lower(_col(host)), _REGISTERED_DOMAIN_RE, 1)


def strip_html(html: Column | str) -> Column:
    """Visible text of an HTML string: tags become single spaces, runs
    of spaces collapse, ends trimmed. Tag regex `<[^>]*>` is the
    engine-portable subset (identical in Java regex and RE2)."""
    no_tags = F.regexp_replace(_col(html), r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r" +", " "))


def markup_chars(html: Column | str) -> Column:
    """How many characters of the payload are markup (tag text)."""
    h = _col(html)
    return F.length(h) - F.length(F.regexp_replace(h, r"<[^>]*>", ""))
