"""Temporal parsing (SURVEY F7-F8).

The reference stores create dates as packed numeric strings and parses them
in-query: ``to_timestamp(cast(cast(ah.addr_create_date as numeric) as
text), 'YYYYMMDDHH24MISS')``
(/root/reference/cam/tables/lf_address_history.py:38-39).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_packed_ts(col: Column) -> Column:
    """Parse 'yyyyMMddHHmmss' packed numeric strings to timestamp; tolerant
    of a trailing fractional part like the reference's double-cast."""
    digits = F.substring(F.regexp_replace(col, r"\D", ""), 1, 14)
    return F.to_timestamp(digits, "yyyyMMddHHmmss")
