"""Variant binary encoding from spec (parquet-format
VariantEncoding.md, the format Spark's VariantType stores) — a pure
encoder/decoder for the (metadata, value) binary pair.

Why it's in the engine: Spark 4.1 owns variant end-to-end and even
SHREDS variant columns in its parquet writer by default, but two jobs
still need the binary format itself: (1) authoring
partially-shredded fixtures from a NON-Spark writer (pyarrow cannot
produce variant binaries), so the Delta variantShredding read path
(sources/delta_log.py) is verified against files Spark did not write;
(2) decoding the ``value`` remainder binaries of shredded columns
outside a Spark session — the from-spec parquet page reader
(sources/parquet_pages.py) extracts them as plain BYTE_ARRAYs (the
VARIANT logical-type annotation Spark writes is so new that even
pyarrow 16 refuses the footer), and this module turns them back into
Python values. tests/test_variant_binary.py cross-checks BOTH
directions against Spark: our encodings read through a real parquet
variant column must to_json to the expected JSON, and Spark-written
variant binaries extracted by the engine's own page reader must
decode to the original values.

Encoding summary (spec section "Value encoding"):
  metadata = header byte (version=1 | sorted<<4 | (offset_size-1)<<6),
  dict_size, dict_size+1 offsets (offset_size bytes LE each), key
  bytes. value = header byte (basic_type in low 2 bits): 0 primitive
  (6-bit type id), 1 short string (6-bit length), 2 object
  (offset/id sizes, sorted-by-key field ids), 3 array.

Boundaries (loud): primitive ids this decoder does not cover
(interval, uuid, nanos timestamps) raise NotImplementedError; every
structural violation (offsets out of range, field ids beyond the
dictionary, truncated payloads) raises ValueError. The encoder emits
null/bool/int8-64/double/string/binary/object/array — the types the
shredding fixtures and remainder objects need.
"""

from __future__ import annotations

import struct


def _pack_uint(v: int, size: int) -> bytes:
    return v.to_bytes(size, "little")


def _uint_size(v: int) -> int:
    return max(1, (v.bit_length() + 7) // 8)


def encode_metadata(keys: list[str]) -> bytes:
    """Metadata with the dictionary ``keys`` in the given order (ids
    are positions). sorted_strings is set only when the keys are
    already lexicographically sorted and unique."""
    raw = [k.encode("utf-8") for k in keys]
    total = sum(len(b) for b in raw)
    osz = _uint_size(max(total, len(raw)))
    is_sorted = int(raw == sorted(raw) and len(set(raw)) == len(raw))
    out = bytearray([0x01 | (is_sorted << 4) | ((osz - 1) << 6)])
    out += _pack_uint(len(raw), osz)
    off = 0
    for b in raw:
        out += _pack_uint(off, osz)
        off += len(b)
    out += _pack_uint(off, osz)
    for b in raw:
        out += b
    return bytes(out)


def decode_metadata(meta: bytes) -> list[str]:
    if not meta:
        raise ValueError("variant: empty metadata")
    h = meta[0]
    if h & 0x0F != 1:
        raise ValueError(f"variant: metadata version {h & 0x0F} != 1")
    osz = ((h >> 6) & 0x3) + 1
    n = int.from_bytes(meta[1: 1 + osz], "little")
    offs = [
        int.from_bytes(meta[1 + osz * (i + 1): 1 + osz * (i + 2)],
                       "little")
        for i in range(n + 1)
    ]
    base = 1 + osz * (n + 2)
    if base + offs[-1] > len(meta):
        raise ValueError("variant: metadata key bytes truncated")
    return [meta[base + offs[i]: base + offs[i + 1]].decode("utf-8")
            for i in range(n)]


def encode_value(obj, key_ids: dict[str, int]) -> bytes:
    """Encode a Python value; dict keys resolve through ``key_ids``
    (ids into the metadata dictionary from encode_metadata's key
    order)."""
    if obj is None:
        return bytes([0x00])  # primitive null (id 0)
    if obj is True:
        return bytes([0x01 << 2])  # id 1
    if obj is False:
        return bytes([0x02 << 2])  # id 2
    if isinstance(obj, int):
        for pid, size, lo, hi in ((3, 1, -(1 << 7), 1 << 7),
                                  (4, 2, -(1 << 15), 1 << 15),
                                  (5, 4, -(1 << 31), 1 << 31),
                                  (6, 8, -(1 << 63), 1 << 63)):
            if lo <= obj < hi:
                return bytes([pid << 2]) + obj.to_bytes(
                    size, "little", signed=True)
        raise ValueError(f"variant: int {obj} exceeds int64")
    if isinstance(obj, float):
        return bytes([7 << 2]) + struct.pack("<d", obj)
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) < 64:
            return bytes([(len(b) << 2) | 1]) + b  # short string
        return bytes([16 << 2]) + _pack_uint(len(b), 4) + b
    if isinstance(obj, (bytes, bytearray)):
        return bytes([15 << 2]) + _pack_uint(len(obj), 4) + bytes(obj)
    if isinstance(obj, dict):
        # spec: field ids/offsets are listed in LEXICOGRAPHIC order
        # of the field NAMES (readers binary-search by name), which
        # is not id order when the dictionary is unsorted
        items = [
            (key_ids[k], encode_value(obj[k], key_ids))
            for k in sorted(obj)
        ]
        vals = b"".join(v for _, v in items)
        n = len(items)
        idsz = _uint_size(max((i for i, _ in items), default=0))
        offsz = _uint_size(len(vals))
        large = int(n > 255)
        head = (2 | ((offsz - 1) << 2) | ((idsz - 1) << 4)
                | (large << 6))
        out = bytearray([head])
        out += _pack_uint(n, 4 if large else 1)
        for i, _ in items:
            out += _pack_uint(i, idsz)
        off = 0
        for _, v in items:
            out += _pack_uint(off, offsz)
            off += len(v)
        out += _pack_uint(off, offsz)
        return bytes(out) + vals
    if isinstance(obj, (list, tuple)):
        vals_list = [encode_value(v, key_ids) for v in obj]
        vals = b"".join(vals_list)
        n = len(vals_list)
        offsz = _uint_size(len(vals))
        large = int(n > 255)
        head = 3 | ((offsz - 1) << 2) | (large << 4)
        out = bytearray([head])
        out += _pack_uint(n, 4 if large else 1)
        off = 0
        for v in vals_list:
            out += _pack_uint(off, offsz)
            off += len(v)
        out += _pack_uint(off, offsz)
        return bytes(out) + vals
    raise NotImplementedError(
        f"variant: cannot encode {type(obj).__name__}"
    )


def encode_variant(obj) -> tuple[bytes, bytes]:
    """(metadata, value) for a Python value; the dictionary holds the
    distinct object keys in first-seen order."""
    keys: list[str] = []

    def collect(o):
        if isinstance(o, dict):
            for k, v in o.items():
                if k not in keys:
                    keys.append(k)
                collect(v)
        elif isinstance(o, (list, tuple)):
            for v in o:
                collect(v)

    collect(obj)
    meta = encode_metadata(keys)
    return meta, encode_value(obj, {k: i for i, k in enumerate(keys)})


def decode_value(meta: bytes, value: bytes):
    """Decode one value binary against its metadata dictionary back
    to a Python value."""
    keys = decode_metadata(meta)
    out, used = _decode_at(keys, value, 0)
    if used != len(value):
        raise ValueError(
            f"variant: {len(value) - used} trailing bytes after value"
        )
    return out


def _decode_at(keys: list[str], buf: bytes, pos: int):
    if pos >= len(buf):
        raise ValueError("variant: truncated value")
    h = buf[pos]
    basic = h & 0x3
    head = h >> 2
    if basic == 0:  # primitive
        if head == 0:
            return None, pos + 1 - pos
        if head == 1:
            return True, 1
        if head == 2:
            return False, 1
        if head in (3, 4, 5, 6):
            size = 1 << (head - 3)
            raw = buf[pos + 1: pos + 1 + size]
            if len(raw) != size:
                raise ValueError("variant: truncated int payload")
            return int.from_bytes(raw, "little", signed=True), 1 + size
        if head == 7:
            if pos + 9 > len(buf):
                raise ValueError("variant: truncated double payload")
            return struct.unpack_from("<d", buf, pos + 1)[0], 9
        if head in (8, 9):  # decimal4 / decimal8
            import decimal

            size = 4 if head == 8 else 8
            if pos + 2 + size > len(buf):
                raise ValueError("variant: truncated decimal payload")
            scale = buf[pos + 1]
            unscaled = int.from_bytes(
                buf[pos + 2: pos + 2 + size], "little", signed=True)
            return (decimal.Decimal(unscaled).scaleb(-scale),
                    2 + size)
        if head == 11:  # date (days)
            import datetime

            if pos + 5 > len(buf):
                raise ValueError("variant: truncated date payload")
            days = int.from_bytes(buf[pos + 1: pos + 5], "little",
                                  signed=True)
            return (datetime.date(1970, 1, 1)
                    + datetime.timedelta(days=days), 5)
        if head == 14:
            if pos + 5 > len(buf):
                raise ValueError("variant: truncated float payload")
            return struct.unpack_from("<f", buf, pos + 1)[0], 5
        if head in (15, 16):  # binary / long string
            n = int.from_bytes(buf[pos + 1: pos + 5], "little")
            raw = buf[pos + 5: pos + 5 + n]
            if len(raw) != n:
                raise ValueError("variant: truncated bytes payload")
            return (bytes(raw) if head == 15
                    else raw.decode("utf-8")), 5 + n
        raise NotImplementedError(
            f"variant: primitive type id {head} unsupported"
        )
    if basic == 1:  # short string
        raw = buf[pos + 1: pos + 1 + head]
        if len(raw) != head:
            raise ValueError("variant: truncated short string")
        return raw.decode("utf-8"), 1 + head
    if basic == 2:  # object
        offsz = (head & 0x3) + 1
        idsz = ((head >> 2) & 0x3) + 1
        large = (head >> 4) & 1
        p = pos + 1
        n = int.from_bytes(buf[p: p + (4 if large else 1)], "little")
        p += 4 if large else 1
        ids = [int.from_bytes(buf[p + i * idsz: p + (i + 1) * idsz],
                              "little") for i in range(n)]
        p += n * idsz
        offs = [int.from_bytes(buf[p + i * offsz: p + (i + 1) * offsz],
                               "little") for i in range(n + 1)]
        p += (n + 1) * offsz
        obj = {}
        for i in range(n):
            if ids[i] >= len(keys):
                raise ValueError(
                    f"variant: field id {ids[i]} beyond dictionary "
                    f"({len(keys)} keys)"
                )
            v, used = _decode_at(keys, buf, p + offs[i])
            if used != offs[i + 1] - offs[i]:
                raise ValueError("variant: object field size mismatch")
            obj[keys[ids[i]]] = v
        return obj, (p + offs[n]) - pos
    # basic == 3: array
    offsz = (head & 0x3) + 1
    large = (head >> 2) & 1
    p = pos + 1
    n = int.from_bytes(buf[p: p + (4 if large else 1)], "little")
    p += 4 if large else 1
    offs = [int.from_bytes(buf[p + i * offsz: p + (i + 1) * offsz],
                           "little") for i in range(n + 1)]
    p += (n + 1) * offsz
    arr = []
    for i in range(n):
        v, used = _decode_at(keys, buf, p + offs[i])
        if used != offs[i + 1] - offs[i]:
            raise ValueError("variant: array element size mismatch")
        arr.append(v)
    return arr, (p + offs[n]) - pos
