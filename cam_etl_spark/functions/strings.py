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
