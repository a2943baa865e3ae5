"""Parquet DATA PAGE decode from spec — the companion to
parquet_meta.py's footer reader: page headers (thrift compact),
Snappy decompression (from-spec: the format is varint + 4 tag kinds,
no tables), GZIP page decompression through the engine's own RFC-1952
inflater, RLE/bit-packed hybrid definition levels, and PLAIN /
PLAIN_DICTIONARY / RLE_DICTIONARY value decoding for flat columns
(INT32/INT64/DOUBLE/FLOAT/BYTE_ARRAY/BOOLEAN).

Scope is deliberately the FLAT-COLUMN lake shape (max definition
level <= 1, no repetition levels): that covers every column of the
engine's bronze tables except nested list leaves. Boundaries are
loud: repeated columns, data page v2, unsupported codecs
(LZ4/ZSTD/BROTLI) and encodings (DELTA_*) raise
NotImplementedError; every integrity violation (snappy overrun,
page-size mismatch, level overrun) raises ValueError.

Verification (tests + catalog entry `s18_parquet_page_decode`): every
value decoded here is compared against DuckDB reading the same file —
an independent reference parquet implementation — and the catalog
oracle replays typed checksums from the table views.
"""

from __future__ import annotations

from cam_etl_spark.multimodal.inflate import gzip_decompress
from cam_etl_spark.sources.parquet_meta import _Reader, _read_struct

# ---------------------------------------------------------------------------
# Snappy (format description in google/snappy format_description.txt —
# varint length + literal/copy tags; no tables, fully derivable)
# ---------------------------------------------------------------------------


def snappy_decompress(buf: bytes) -> bytes:
    r = _Reader(buf)
    total = r.varint()
    out = bytearray()
    while r.pos < len(buf):
        tag = r.byte()
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                ln = int.from_bytes(r.take(nbytes), "little")
            out += r.take(ln + 1)
            continue
        if kind == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | r.byte()
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(r.take(2), "little")
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(r.take(4), "little")
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        for _ in range(length):
            out.append(out[-offset])
    if len(out) != total:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, header says {total}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# RLE / bit-packed hybrid (parquet-format Encodings.md)
# ---------------------------------------------------------------------------


def rle_bitpacked_hybrid(r: _Reader, bit_width: int, count: int) -> list[int]:
    """Decode `count` values from an RLE/bit-packed hybrid run stream."""
    out: list[int] = []
    byte_width = (bit_width + 7) // 8
    while len(out) < count:
        header = r.varint()
        if header & 1:  # bit-packed: (header>>1) groups of 8 values
            n = (header >> 1) * 8
            raw = r.take((n * bit_width + 7) // 8)
            acc = int.from_bytes(raw, "little")
            mask = (1 << bit_width) - 1
            for i in range(n):
                out.append((acc >> (i * bit_width)) & mask)
        else:  # RLE run
            n = header >> 1
            v = int.from_bytes(r.take(byte_width), "little") if byte_width else 0
            out += [v] * n
    if len(out) < count:
        raise ValueError("rle: level stream exhausted early")
    return out[:count]


# ---------------------------------------------------------------------------
# PLAIN decode per physical type
# ---------------------------------------------------------------------------


def plain_values(data: bytes, ptype: str, n: int) -> list:
    import struct as _s

    if ptype == "INT32":
        return list(_s.unpack(f"<{n}i", data[: 4 * n]))
    if ptype == "INT64":
        return list(_s.unpack(f"<{n}q", data[: 8 * n]))
    if ptype == "FLOAT":
        return list(_s.unpack(f"<{n}f", data[: 4 * n]))
    if ptype == "DOUBLE":
        return list(_s.unpack(f"<{n}d", data[: 8 * n]))
    if ptype == "BOOLEAN":
        return [(data[i // 8] >> (i % 8)) & 1 == 1 for i in range(n)]
    if ptype == "BYTE_ARRAY":
        out = []
        pos = 0
        for _ in range(n):
            ln = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            if pos + ln > len(data):
                raise ValueError("plain: byte_array overruns page")
            out.append(data[pos : pos + ln])
            pos += ln
        return out
    raise NotImplementedError(f"parquet: PLAIN decode of {ptype}")


# ---------------------------------------------------------------------------
# Column chunk walk
# ---------------------------------------------------------------------------

_PAGE_DATA = 0
_PAGE_DICT = 2
_PAGE_DATA_V2 = 3


def decode_column_chunk(
    file_bytes: bytes, chunk: dict, num_rows: int, optional: bool = True
) -> list:
    """Decode every value of one flat column chunk (footer dict from
    parquet_meta.parse_footer row_groups[i]['columns'][j]). Returns a
    list of length num_rows with None for nulls. ``optional`` is the
    schema repetition (max definition level 1 vs 0 — a required
    column's pages carry no definition levels)."""
    codec = chunk["codec"]
    ptype = chunk["type"]
    start = chunk["dictionary_page_offset"]
    if start is None:
        start = chunk["data_page_offset"]
    pos = start
    dictionary: list | None = None
    values: list = []
    remaining = chunk["num_values"]
    while remaining > 0:
        r = _Reader(file_bytes)
        r.pos = pos
        hdr = _read_struct(r)
        ptype_id = hdr[1]
        if ptype_id == _PAGE_DATA_V2:
            # v2 compresses only the values section (levels plain), so
            # the type check must precede any whole-body decompression
            raise NotImplementedError("parquet: data page v2")
        uncomp_size, comp_size = hdr[2], hdr[3]
        body = file_bytes[r.pos : r.pos + comp_size]
        pos = r.pos + comp_size
        if codec == "UNCOMPRESSED":
            raw = body
        elif codec == "SNAPPY":
            raw = snappy_decompress(body)
        elif codec == "GZIP":
            raw, _ = gzip_decompress(body)
        else:
            raise NotImplementedError(f"parquet: codec {codec}")
        if len(raw) != uncomp_size:
            raise ValueError(
                f"parquet: page inflated to {len(raw)}, header says "
                f"{uncomp_size}"
            )
        if ptype_id == _PAGE_DICT:
            dhdr = hdr[7]
            dictionary = plain_values(raw, ptype, dhdr[1])
            continue
        if ptype_id != _PAGE_DATA:
            raise ValueError(f"parquet: unexpected page type {ptype_id}")
        dph = hdr[5]
        n_vals, enc = dph[1], dph[2]
        pr = _Reader(raw)
        # flat optional column: def levels (bit width 1) with a 4-byte
        # length prefix; required columns (no def levels) are detected
        # by the writer omitting them only when max_def=0 — pyarrow
        # writes flat columns optional, so levels are present. A
        # repeated column would need rep levels first: reject loudly.
        def read_defs():
            if not optional:
                return [1] * n_vals
            lvl_len = int.from_bytes(pr.take(4), "little")
            lvl_reader = _Reader(pr.take(lvl_len))
            return rle_bitpacked_hybrid(lvl_reader, 1, n_vals)

        if enc == 0:  # PLAIN data page
            defs = read_defs()
            n_present = sum(defs)
            vals = plain_values(
                raw[pr.pos :], ptype, n_present
            )
            it = iter(vals)
            values += [next(it) if d else None for d in defs]
        elif enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY data
            defs = read_defs()
            n_present = sum(defs)
            if dictionary is None:
                raise ValueError("parquet: dict-encoded page, no dict")
            bw = pr.byte()
            idx = rle_bitpacked_hybrid(pr, bw, n_present)
            it = iter(idx)
            values += [
                dictionary[next(it)] if d else None for d in defs
            ]
        else:
            raise NotImplementedError(f"parquet: encoding id {enc}")
        remaining -= n_vals
    if remaining != 0 or len(values) != chunk["num_values"]:
        raise ValueError("parquet: page walk value-count mismatch")
    return values
