"""String normalization and label assembly (SURVEY F1-F5, F11, F18-F22).

Mirrors the reference's road-name cleanup passes
(/root/reference/etl-notes.md:77-148) and the composite display-label
f-string (/root/reference/etl_lalf_address.py:676-686) as pure Column
expressions, so the whole enrichment is one select instead of staged SQL
UPDATEs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def collapse_ws(col: Column) -> Column:
    """Whitespace collapse (/root/reference/etl-notes.md:107-110)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def nullif_empty(col: Column) -> Column:
    """Empty-string → NULL normalization: the reference's stringly-typed
    tables treat '' and NULL as the same absent value
    (/root/reference/etl-notes.md:880, SURVEY P6/§7.3)."""
    return F.when(F.trim(col) == "", F.lit(None)).otherwise(col)


def slugify(col: Column) -> Column:
    """lower + space→dash (/root/reference/etl_qrt.py:36-45)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", "-")


def clean_display_name(col: Column) -> Column:
    """The reference's road-name cleanup sequence
    (/root/reference/etl-notes.md:100-144): drop the 'XXX' suppressed type,
    normalize ' - ' compounds, strip apostrophes, collapse whitespace."""
    c = F.regexp_replace(col, r"\bXXX\b", "")
    c = F.replace(c, F.lit(" - "), F.lit(" "))
    c = F.replace(c, F.lit("'"), F.lit(""))
    return collapse_ws(c)


def canonicalize_url(url: Column) -> Column:
    """Web-corpus URL canonicalization — the dedup key for crawled pages
    (mirror URLs differ only in scheme/host case, default ports, ``www.``,
    tracking parameters, fragments, trailing slashes). Pure column
    algebra, scan-shaped, SQL-replayable. Rules, in order:

    1. scheme and host lowercased (path/query case preserved)
    2. leading ``www.`` stripped from the host
    3. default ports stripped only when they match the scheme
       (``:80`` for http, ``:443`` for https)
    4. ``utm_``-prefixed query parameters dropped (others keep order)
    5. fragment dropped
    6. trailing slash stripped from a non-root path
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"(.)/$", "$1")
    # Anchor to the pre-fragment prefix: a '?' first appearing inside the
    # fragment (http://h.com/p#a?b=1) is NOT a query string (rule 5).
    q = F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"), lambda p: (p != "") & ~p.rlike("^utm_")
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
