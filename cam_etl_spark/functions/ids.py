"""Deterministic identity minting (SURVEY F9-F12).

The reference mints subject IRIs from natural keys via string templates
(/root/reference/cam/etl/qrt.py:4-9) or UUIDv5 namespaced hashing
(/root/reference/cam/etl/lalf_address.py:6-27), and blank-node ids from
Python ``hash()`` (/root/reference/cam/etl/__init__.py:85-87) — which is
process-randomized; SURVEY §7.3 mandates a stable hash instead.

All helpers here are native Column expressions (JVM-side, codegen'd) except
``uuid5_py`` which exists only to verify bit-exactness against the stdlib.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F


def iri_template(template: str, *cols: Column) -> Column:
    """IRI minting by template interpolation, e.g.
    ``iri_template("https://example.com/road/%s", col)`` — the Spark form of
    the reference's f-string templates (/root/reference/cam/etl/qrt.py:4-9).
    """
    return F.format_string(template, *cols)


def portable_hash60(col: Column) -> Column:
    """Stable 60-bit hash usable identically in Spark and ANSI-ish SQL:
    first 15 hex chars of md5, read base-16. Deterministic across executors
    (unlike Python hash(), SURVEY F12) and reproducible by the DuckDB oracle
    via ``('0x' || substr(md5(x),1,15))::bigint``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def stable_bnode_id(*cols: Column) -> Column:
    """Deterministic blank-node label from the focus-node key parts —
    replaces ``f"_bnode{hash(str(focus)+key)}"``
    (/root/reference/cam/etl/__init__.py:85-87)."""
    return F.concat(F.lit("b"), F.md5(F.concat_ws("\x1f", *cols)))


def uuid5_py(namespace: uuid.UUID, name: str) -> str:
    """Reference semantics: uuid.uuid5 (RFC 4122 §4.3, SHA-1 based)."""
    return str(uuid.uuid5(namespace, name))


def uuid5_expr(namespace: uuid.UUID, name_col: Column) -> Column:
    """UUIDv5 as a native expression — bit-exact with ``uuid.uuid5``
    (verified in tests against /root/reference/cam/etl/lalf_address.py:21-27
    semantics) but entirely JVM-side: sha1(namespace_bytes || name_utf8),
    take 16 bytes, force version nibble to 5 and the RFC 4122 variant bits.

    Doing this with string surgery on the hex digest keeps the hot path out
    of Python: at 100 TB the id mint runs once per source row.
    """
    ns_hex = namespace.bytes.hex()
    digest = F.sha1(F.concat(F.to_binary(F.lit(ns_hex), F.lit("hex")), F.encode(name_col, "UTF-8")))
    # hex positions (1-based): 1-8, 9-12, 13-16 (version nibble at 13),
    # 17-20 (variant nibble at 17), 21-32.
    variant_src = F.conv(F.substring(digest, 17, 1), 16, 10).cast("int")
    variant_nibble = F.lower(F.hex((variant_src.bitwiseAND(F.lit(3))).bitwiseOR(F.lit(8))))
    return F.concat_ws(
        "-",
        F.substring(digest, 1, 8),
        F.substring(digest, 9, 4),
        F.concat(F.lit("5"), F.substring(digest, 14, 3)),
        F.concat(variant_nibble, F.substring(digest, 18, 3)),
        F.substring(digest, 21, 12),
    )
