"""Parquet WRITER from spec — the inverse of parquet_meta/parquet_pages:
a thrift compact-protocol encoder and a minimal standards-compliant
file writer (PLAIN pages, flat REQUIRED or OPTIONAL columns — nulls
carried as v1 RLE definition levels — UNCOMPRESSED or all-literal
Snappy). Verification inverts the reader's: files written here are
read back by DuckDB AND pyarrow — two independent reference
implementations — and by the engine's own from-spec reader,
including the null positions.

Scope: the lake-interchange shape a pipeline needs to EMIT — flat
INT64 / DOUBLE / BYTE_ARRAY columns (nullable or required), one row
group, one data page per column. Nesting and real compression ratios
are out of scope (the writer exists to prove the format layer
end-to-end, not to replace Spark's parquet sink); unsupported types
raise NotImplementedError.
"""

from __future__ import annotations

import struct

from cam_etl_spark.sources.parquet_meta import (
    _T_BINARY,
    _T_DOUBLE,
    _T_I32,
    _T_I64,
    _T_LIST,
    _T_STRUCT,
)

_PHYS = {"INT64": 2, "DOUBLE": 5, "BYTE_ARRAY": 6}


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()

    def byte(self, b: int) -> None:
        self.out.append(b & 0xFF)

    def varint(self, v: int) -> None:
        if v < 0:
            raise ValueError("thrift: varint must be unsigned")
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def zigzag(self, v: int) -> None:
        self.varint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)


def _zz(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _write_value(w: _Writer, ttype: int, val) -> None:
    if ttype in (_T_I32, _T_I64):
        w.varint(_zz(val))
    elif ttype == _T_BINARY:
        data = val.encode("utf-8") if isinstance(val, str) else val
        w.varint(len(data))
        w.out += data
    elif ttype == _T_DOUBLE:
        w.out += struct.pack("<d", val)
    elif ttype == _T_STRUCT:
        _write_struct(w, val)
    elif ttype == _T_LIST:
        etype, items = val
        n = len(items)
        if n < 15:
            w.byte(n << 4 | etype)
        else:
            w.byte(0xF0 | etype)
            w.varint(n)
        for it in items:
            _write_value(w, etype, it)
    else:
        raise NotImplementedError(f"thrift write type {ttype}")


def _write_struct(w: _Writer, fields: dict) -> None:
    """fields: {field_id: (ttype, value)} — emitted in id order with
    compact delta headers."""
    last = 0
    for fid in sorted(fields):
        ttype, val = fields[fid]
        delta = fid - last
        if 0 < delta <= 15:
            w.byte(delta << 4 | ttype)
        else:
            w.byte(ttype)
            w.zigzag(fid)
        _write_value(w, ttype, val)
        last = fid
    w.byte(0)


def snappy_compress_literal(raw: bytes) -> bytes:
    """Valid Snappy stream using literal tags only (a compliant,
    compression-free encoding — decoders must accept it)."""
    w = _Writer()
    w.varint(len(raw))
    pos = 0
    while pos < len(raw) or (pos == 0 and not raw):
        chunk = raw[pos : pos + 65536]
        n = len(chunk)
        if n == 0:
            break
        if n <= 60:
            w.byte((n - 1) << 2)
        else:
            w.byte(61 << 2)  # 2-byte length literal
            w.byte((n - 1) & 0xFF)
            w.byte(((n - 1) >> 8) & 0xFF)
        w.out += chunk
        pos += n
    return bytes(w.out)


def _rle_def_levels(levels: list[int]) -> bytes:
    """Definition levels for a flat OPTIONAL column (max_def=1):
    4-byte length prefix + RLE runs (varint(count<<1) + 1-byte value,
    bit width 1) — the v1 data-page level encoding."""
    out = bytearray()
    i = 0
    while i < len(levels):
        j = i
        while j < len(levels) and levels[j] == levels[i]:
            j += 1
        v = (j - i) << 1  # RLE-run header
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
        out.append(levels[i])
        i = j
    return len(out).to_bytes(4, "little") + bytes(out)


def _plain_encode(ptype: str, values: list) -> bytes:
    if ptype == "INT64":
        return struct.pack(f"<{len(values)}q", *values)
    if ptype == "DOUBLE":
        return struct.pack(f"<{len(values)}d", *values)
    if ptype == "BYTE_ARRAY":
        out = bytearray()
        for v in values:
            b = v.encode("utf-8") if isinstance(v, str) else v
            out += len(b).to_bytes(4, "little") + b
        return bytes(out)
    raise NotImplementedError(f"parquet write: type {ptype}")


def write_parquet(
    columns: list[tuple[str, str, list]], codec: str = "SNAPPY"
) -> bytes:
    """Build a complete parquet file: columns is a list of
    (name, physical_type in INT64/DOUBLE/BYTE_ARRAY, values — Nones
    allowed, the column becomes OPTIONAL with RLE definition levels).
    Returns the file bytes."""
    if codec not in ("SNAPPY", "UNCOMPRESSED"):
        raise NotImplementedError(f"parquet write: codec {codec}")
    n_rows = len(columns[0][2]) if columns else 0
    out = bytearray(b"PAR1")
    chunks = []
    nullable = {}
    for name, ptype, values in columns:
        if len(values) != n_rows:
            raise ValueError("parquet write: ragged columns")
        has_null = any(v is None for v in values)
        nullable[name] = has_null
        present = [v for v in values if v is not None]
        raw = _plain_encode(ptype, present)
        if has_null:
            raw = _rle_def_levels(
                [0 if v is None else 1 for v in values]
            ) + raw
        body = (
            snappy_compress_literal(raw) if codec == "SNAPPY" else raw
        )
        hdr = _Writer()
        _write_struct(
            hdr,
            {
                1: (_T_I32, 0),  # DATA_PAGE
                2: (_T_I32, len(raw)),
                3: (_T_I32, len(body)),
                5: (
                    _T_STRUCT,
                    {
                        1: (_T_I32, n_rows),
                        2: (_T_I32, 0),  # PLAIN
                        3: (_T_I32, 3),  # RLE (def levels, absent)
                        4: (_T_I32, 3),  # RLE (rep levels, absent)
                    },
                ),
            },
        )
        offset = len(out)
        out += hdr.out + body
        chunks.append(
            (name, ptype, offset, len(hdr.out) + len(body),
             len(hdr.out) + len(raw))
        )
    schema = [
        (
            _T_STRUCT,
            {4: (_T_BINARY, "schema"), 5: (_T_I32, len(columns))},
        )
    ] + [
        (
            _T_STRUCT,
            {
                1: (_T_I32, _PHYS[ptype]),
                # OPTIONAL when the column carries nulls, else REQUIRED
                3: (_T_I32, 1 if nullable[name] else 0),
                4: (_T_BINARY, name),
                # UTF8 converted type so readers surface strings
                **({6: (_T_I32, 0)} if ptype == "BYTE_ARRAY" else {}),
            },
        )
        for name, ptype, _ in columns
    ]
    codec_id = 1 if codec == "SNAPPY" else 0
    rg_cols = [
        (
            _T_STRUCT,
            {
                2: (_T_I64, off),
                3: (
                    _T_STRUCT,
                    {
                        1: (_T_I32, _PHYS[ptype]),
                        2: (_T_LIST, (_T_I32, [0])),  # PLAIN
                        3: (_T_LIST, (_T_BINARY, [name])),
                        4: (_T_I32, codec_id),
                        5: (_T_I64, n_rows),
                        6: (_T_I64, raw_len),
                        7: (_T_I64, total),
                        9: (_T_I64, off),
                    },
                ),
            },
        )
        for name, ptype, off, total, raw_len in chunks
    ]
    meta = _Writer()
    _write_struct(
        meta,
        {
            1: (_T_I32, 1),  # version
            2: (_T_LIST, (_T_STRUCT, [s[1] for s in schema])),
            3: (_T_I64, n_rows),
            4: (
                _T_LIST,
                (
                    _T_STRUCT,
                    [
                        {
                            1: (_T_LIST, (_T_STRUCT, [c[1] for c in rg_cols])),
                            2: (_T_I64, sum(c[3] for c in chunks)),
                            3: (_T_I64, n_rows),
                        }
                    ],
                ),
            ),
            6: (_T_BINARY, "cam_etl_spark parquet_write"),
        },
    )
    out += meta.out
    out += len(meta.out).to_bytes(4, "little")
    out += b"PAR1"
    return bytes(out)
