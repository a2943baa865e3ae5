"""ORC file reader FROM SPEC (the Apache ORC v1 specification:
https://orc.apache.org/specification/ORCv1/) — a pure-python decoder
for the complete read path of flat columnar data:

* the protobuf-encoded tail (PostScript -> Footer -> StripeFooter)
  parsed by a from-first-principles protobuf WIRE parser (varint /
  64-bit / length-delimited / 32-bit — the wire format is four rules,
  no generated code, no protobuf dependency);
* the compressed-stream framing (3-byte little-endian chunk headers,
  isOriginal bit) over the COMPLETE codec matrix — NONE / ZLIB (raw
  DEFLATE via the engine's own from-spec inflater) / SNAPPY / LZ4
  raw-block / LZO1X (all the engine's own from-spec decoders, shared
  with the parquet page reader) / ZSTD (the engine's own RFC-8878
  decoder, multimodal/zstd.py — Spark 4's DEFAULT ORC compression,
  so default Spark-written files now decode);
* Byte-RLE and bit-packed boolean RLE (PRESENT bitmaps, boolean
  columns);
* integer RLE v2 — ALL FOUR sub-encodings (SHORT_REPEAT, DIRECT,
  PATCHED_BASE, DELTA), the 5-bit closed-form width table, zigzag
  for signed streams — AND integer RLE v1 (equal-delta runs +
  literal varints; the 0.11 file format pre-hive-0.12 writers emit,
  cross-checked against Spark's Java writer in orc.write.format=0.11
  mode and the spec's printed example vectors);
* column assembly for boolean, smallint/int/bigint, float, double,
  string / varchar / char / binary in ALL FOUR encodings
  (DIRECT / DICTIONARY / DIRECT_V2 / DICTIONARY_V2),
  date, timestamp (DATA rel-2015 seconds +
  SECONDARY scaled nanos — handling BOTH reference writers' hostile
  pre-1970 forms: the C++ library's signed nanos and the Java
  library's truncated-seconds/positive-nanos with the
  millisecond-granularity correction; NON-UTC writer timezones are
  resolved via zoneinfo and rendered as the writer-zone wall clock,
  pinned value-exact against pyarrow over a 4-zone x 12-instant
  grid of real Java-writer files), and the root struct — with
  PRESENT streams materializing nulls.

NOTHING here is a vendored table: every constant above is printed in
closed form by the specification. Verification uses two REAL
independent references available in this environment: files written
by pyarrow's ORC writer (the Apache ORC C++ library) and by Spark's
native ORC data source (the Apache ORC Java library) are decoded by
this module and asserted value-exact against pyarrow's own read-back
(tests/test_orc_read.py) — the same discipline the round-8 parquet
page decoder used with DuckDB.

Loud boundaries (never mis-decoded): writer timezones zoneinfo
cannot resolve, and encrypted files raise NotImplementedError naming
the feature. (Decimal, list, map, struct AND union columns are
decoded — union landed later in round 11, Byte-RLE tag stream +
per-child value streams, cross-checked against real pyarrow-written
union files; see the branches of _decode_column; RLE v1 landed
in round 10; LZ4, LZO, ZSTD and non-UTC writer timezones in round
11 — every ORC compression codec now decodes.)

Why it's in the engine: ORC is the other half of the columnar lake
(Hive/Trino deployments); a 100 TB integrity audit decodes and
checksums every stripe of a million files one task each — exactly
the s18 parquet shape — and a custom DataSource needs this kernel to
serve stripes selectively (stripe pruning via footer statistics is
the ORC analogue of parquet row-group pruning).

Reference parity: the reference repo (cam-etl) has no lake-format
layer; SURVEY.md §2.1 source surface extension.
"""

from __future__ import annotations

import struct

from cam_etl_spark.multimodal.inflate import inflate
from cam_etl_spark.multimodal.zstd import zstd_decompress
from cam_etl_spark.sources.parquet_pages import (
    lz4_block_decompress,
    lzo1x_decompress,
    snappy_decompress,
)

MAGIC = b"ORC"

# Footer Type.kind enum (spec "Types")
KIND = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long",
    5: "float", 6: "double", 7: "string", 8: "binary", 9: "timestamp",
    10: "list", 11: "map", 12: "struct", 13: "union", 14: "decimal",
    15: "date", 16: "varchar", 17: "char",
    18: "timestamp_instant",
}

COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD"}

STREAM_KIND = {
    0: "PRESENT", 1: "DATA", 2: "LENGTH", 3: "DICTIONARY_DATA",
    4: "DICTIONARY_COUNT", 5: "SECONDARY", 6: "ROW_INDEX",
    7: "BLOOM_FILTER", 8: "BLOOM_FILTER_UTF8",
}

ENCODING = {0: "DIRECT", 1: "DICTIONARY", 2: "DIRECT_V2", 3: "DICTIONARY_V2"}


# ---------------------------------------------------------------------------
# Minimal protobuf wire parser (proto wire format: 4 rules)
# ---------------------------------------------------------------------------


def _pb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("orc: truncated protobuf varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 70:
            raise ValueError("orc: protobuf varint too long")


def pb_parse(buf: bytes) -> dict[int, list]:
    """Parse one protobuf message into {field_number: [raw values]}.
    Varints stay ints; length-delimited fields stay bytes (the caller
    re-parses nested messages / decodes strings); fixed32/64 stay raw
    4/8-byte values (ints)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _pb_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _pb_varint(buf, pos)
        elif wire == 1:
            if pos + 8 > len(buf):
                raise ValueError("orc: truncated fixed64")
            v = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wire == 2:
            n, pos = _pb_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("orc: truncated length-delimited field")
            v = buf[pos : pos + n]
            pos += n
        elif wire == 5:
            if pos + 4 > len(buf):
                raise ValueError("orc: truncated fixed32")
            v = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"orc: unsupported protobuf wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _one(msg: dict, field: int, default=None):
    v = msg.get(field)
    return v[0] if v else default


def _packed_varints(raw_values: list) -> list[int]:
    """A repeated scalar field arrives either as individual varints
    or PACKED (one length-delimited blob of varints) — accept both."""
    out: list[int] = []
    for v in raw_values:
        if isinstance(v, int):
            out.append(v)
        else:
            pos = 0
            while pos < len(v):
                u, pos = _pb_varint(v, pos)
                out.append(u)
    return out


# ---------------------------------------------------------------------------
# Compressed stream framing
# ---------------------------------------------------------------------------


def decompress_stream(buf: bytes, compression: str) -> bytes:
    if compression == "NONE":
        return buf
    if compression not in ("ZLIB", "SNAPPY", "LZ4", "ZSTD", "LZO"):
        raise NotImplementedError(f"orc: compression {compression} unsupported")
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if pos + 3 > len(buf):
            raise ValueError("orc: truncated chunk header")
        header = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        is_original = header & 1
        n = header >> 1
        if pos + n > len(buf):
            raise ValueError("orc: truncated compression chunk")
        chunk = buf[pos : pos + n]
        pos += n
        if is_original:
            out += chunk
        elif compression == "ZLIB":
            payload, meta = inflate(chunk, 0)
            if meta["end"] != len(chunk):
                raise ValueError("orc: trailing bytes in deflate chunk")
            out += payload
        elif compression == "SNAPPY":
            out += snappy_decompress(chunk)
        elif compression == "LZ4":
            # raw block format, size bounded by the framing
            out += lz4_block_decompress(chunk, None)
        elif compression == "LZO":
            # raw LZO1X per chunk (aircompressor's form)
            out += lzo1x_decompress(chunk)
        else:  # ZSTD: full RFC 8878 frames per chunk
            out += zstd_decompress(chunk)
    return bytes(out)


# ---------------------------------------------------------------------------
# Run-length encodings
# ---------------------------------------------------------------------------


def byte_rle(buf: bytes, n: int | None = None) -> bytes:
    """Byte-level RLE (spec "Byte Run Length Encoding"): control 0-127
    = run of control+3 copies of the next byte; 128-255 = 256-control
    literal bytes."""
    out = bytearray()
    pos = 0
    while pos < len(buf) and (n is None or len(out) < n):
        ctrl = buf[pos]
        pos += 1
        if ctrl < 128:
            if pos >= len(buf):
                raise ValueError("orc: truncated byte-RLE run")
            out += bytes([buf[pos]]) * (ctrl + 3)
            pos += 1
        else:
            ln = 256 - ctrl
            if pos + ln > len(buf):
                raise ValueError("orc: truncated byte-RLE literal")
            out += buf[pos : pos + ln]
            pos += ln
    return bytes(out)


def boolean_rle(buf: bytes, n: int) -> list[bool]:
    """Booleans are bit-packed MSB-first inside a byte-RLE stream."""
    raw = byte_rle(buf)
    if len(raw) * 8 < n:
        raise ValueError("orc: boolean stream too short")
    return [bool(raw[i >> 3] & (0x80 >> (i & 7))) for i in range(n)]


#: 5-bit encoded-width table (spec: "bit width encoding") — closed
#: form: 0..23 -> 1..24 bits, then 26/28/30/32/40/48/56/64.
_WIDTHS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


def _decode_width(w: int) -> int:
    return _WIDTHS[w]


def _closest_fixed_bits(n: int) -> int:
    """Round a bit count UP to the nearest width in the closed-form
    table — the spec packs the PATCHED_BASE patch list at this
    aligned width (gap and patch bits combined)."""
    for w in _WIDTHS:
        if w >= n:
            return w
    return 64


class _BitUnpacker:
    """Big-endian bit unpacking for RLEv2 DIRECT/PATCHED/DELTA runs."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bit = 0

    def take(self, width: int) -> int:
        acc = 0
        need = width
        while need:
            if self.pos >= len(self.buf):
                raise ValueError("orc: truncated bit-packed run")
            avail = 8 - self.bit
            grab = min(avail, need)
            b = self.buf[self.pos]
            acc = (acc << grab) | ((b >> (avail - grab)) & ((1 << grab) - 1))
            self.bit += grab
            need -= grab
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return acc

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.pos += 1
        return self.pos


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    return _pb_varint(buf, pos)


def _signed_varint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = _pb_varint(buf, pos)
    return _zigzag(u), pos


def rle_v2(buf: bytes, n: int, signed: bool) -> list[int]:
    """Integer RLE v2 — all four sub-encodings."""
    out: list[int] = []
    pos = 0
    while len(out) < n:
        if pos >= len(buf):
            raise ValueError("orc: truncated RLEv2 stream")
        first = buf[pos]
        enc = first >> 6
        if enc == 0:  # SHORT_REPEAT
            width = ((first >> 3) & 0x7) + 1
            repeat = (first & 0x7) + 3
            if pos + 1 + width > len(buf):
                raise ValueError("orc: truncated SHORT_REPEAT")
            v = int.from_bytes(buf[pos + 1 : pos + 1 + width], "big")
            if signed:
                v = _zigzag(v)
            out += [v] * repeat
            pos += 1 + width
        elif enc == 1:  # DIRECT
            width = _decode_width((first >> 1) & 0x1F)
            if pos + 1 >= len(buf):
                raise ValueError("orc: truncated DIRECT header")
            length = ((first & 1) << 8 | buf[pos + 1]) + 1
            bp = _BitUnpacker(buf, pos + 2)
            vals = [bp.take(width) for _ in range(length)]
            pos = bp.align()
            out += [_zigzag(v) for v in vals] if signed else vals
        elif enc == 3:  # DELTA
            w5 = (first >> 1) & 0x1F
            width = 0 if w5 == 0 else _decode_width(w5)
            if pos + 1 >= len(buf):
                raise ValueError("orc: truncated DELTA header")
            length = ((first & 1) << 8 | buf[pos + 1]) + 1  # incl. base
            p = pos + 2
            if signed:
                base, p = _signed_varint(buf, p)
            else:
                base, p = _varint(buf, p)
            delta_base, p = _signed_varint(buf, p)
            vals = [base, base + delta_base]
            sign = 1 if delta_base >= 0 else -1
            if width:
                bp = _BitUnpacker(buf, p)
                cur = vals[-1]
                for _ in range(length - 2):
                    d = bp.take(width)
                    cur += sign * d
                    vals.append(cur)
                pos = bp.align()
            else:
                # fixed-delta run
                cur = vals[-1]
                for _ in range(length - 2):
                    cur += delta_base
                    vals.append(cur)
                pos = p
            out += vals[:length]
        else:  # enc == 2: PATCHED_BASE
            width = _decode_width((first >> 1) & 0x1F)
            if pos + 3 >= len(buf):
                raise ValueError("orc: truncated PATCHED_BASE header")
            length = ((first & 1) << 8 | buf[pos + 1]) + 1
            third, fourth = buf[pos + 2], buf[pos + 3]
            base_bytes = ((third >> 5) & 0x7) + 1
            patch_width = _decode_width(third & 0x1F)
            patch_gap_width = ((fourth >> 5) & 0x7) + 1
            patch_len = fourth & 0x1F
            p = pos + 4
            if p + base_bytes > len(buf):
                raise ValueError("orc: truncated PATCHED_BASE base")
            base = int.from_bytes(buf[p : p + base_bytes], "big")
            # base is sign-magnitude: msb of the encoded width
            sign_bit = 1 << (base_bytes * 8 - 1)
            if base & sign_bit:
                base = -(base & (sign_bit - 1))
            p += base_bytes
            bp = _BitUnpacker(buf, p)
            vals = [bp.take(width) for _ in range(length)]
            p = bp.align()
            bp = _BitUnpacker(buf, p)
            patch_total = _closest_fixed_bits(patch_gap_width + patch_width)
            patches = [bp.take(patch_total) for _ in range(patch_len)]
            pos = bp.align()
            idx = 0
            for patch in patches:
                gap = patch >> patch_width
                pv = patch & ((1 << patch_width) - 1)
                idx += gap
                if idx >= length:
                    raise ValueError("orc: PATCHED_BASE patch out of range")
                vals[idx] |= pv << width
            out += [base + v for v in vals]
    if len(out) != n:
        # a run may overshoot the requested count only at stream end
        del out[n:]
    return out


# ---------------------------------------------------------------------------
# File / stripe decoding
# ---------------------------------------------------------------------------


def rle_v1(buf: bytes, n: int, signed: bool) -> list[int]:
    """Integer RLE version 1 (ORC spec "Run Length Encoding version 1",
    pre-hive-0.12 writers and the Java writer's 0.11 format): header
    byte 0-127 = a RUN of (header + 3) values starting at a varint
    base and stepping by a signed delta byte; header 128-255 =
    (256 - header) LITERAL varints. Signed streams zigzag the
    varints. Spec example vectors pinned in tests/test_orc_read.py:
    100 x 7 -> [0x61, 0x00, 0x07]; 7,8,...,106 -> [0x61, 0x01, 0x07]."""
    out: list[int] = []
    pos = 0
    while len(out) < n:
        if pos >= len(buf):
            raise ValueError("orc: truncated RLE v1 stream")
        h = buf[pos]
        pos += 1
        if h < 128:  # run
            length = h + 3
            if pos >= len(buf):
                raise ValueError("orc: truncated RLE v1 run header")
            delta = buf[pos]
            pos += 1
            if delta > 127:
                delta -= 256
            base, pos = _varint(buf, pos)
            if signed:
                base = _zigzag(base)
            out.extend(base + i * delta for i in range(length))
        else:  # literals
            count = 256 - h
            for _ in range(count):
                v, pos = _varint(buf, pos)
                out.append(_zigzag(v) if signed else v)
    return out[:n]


def rle_v1_encode(values: list[int], signed: bool) -> bytes:
    """Fixture-synthesis RLE v1 encoder: equal-delta runs of 3-130
    values, literal groups of up to 128 otherwise — enough to
    roundtrip any sequence (the reader is the product; this pins it
    against hand-checkable bytes)."""
    def varint(v: int) -> bytes:
        if signed:
            v = (v << 1) ^ (v >> 63) if v < 0 else v << 1
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    out = bytearray()
    i = 0
    nvals = len(values)
    while i < nvals:
        # longest equal-delta run from i (delta must fit a byte)
        j = i + 1
        if j < nvals:
            delta = values[j] - values[i]
            if -128 <= delta <= 127:
                while (
                    j < nvals
                    and j - i < 130
                    and values[j] - values[j - 1] == delta
                ):
                    j += 1
        if j - i >= 3:
            out.append(j - i - 3)
            d = values[i + 1] - values[i]
            out.append(d & 0xFF)
            out += varint(values[i])
            i = j
            continue
        # literal group: until the next run of >= 3 starts
        lit_start = i
        while i < nvals and i - lit_start < 128:
            if i + 2 < nvals:
                d = values[i + 1] - values[i]
                if (
                    -128 <= d <= 127
                    and values[i + 2] - values[i + 1] == d
                ):
                    break
            i += 1
        count = i - lit_start
        out.append(256 - count)
        for v in values[lit_start:i]:
            out += varint(v)
    return bytes(out)


def parse_tail(buf: bytes) -> dict:
    """PostScript + Footer -> schema, stripes, compression."""
    if len(buf) < 4:
        raise ValueError("orc: file too short")
    ps_len = buf[-1]
    ps = pb_parse(buf[len(buf) - 1 - ps_len : len(buf) - 1])
    magic = _one(ps, 8000, b"")
    if magic != MAGIC:
        raise ValueError("orc: bad PostScript magic")
    compression = COMPRESSION.get(_one(ps, 2, 0))
    if compression is None:
        raise ValueError("orc: unknown compression code")
    footer_len = _one(ps, 1)
    meta_len = _one(ps, 5, 0)
    footer_start = len(buf) - 1 - ps_len - footer_len
    footer = pb_parse(decompress_stream(
        buf[footer_start : footer_start + footer_len], compression
    ))
    types = []
    for t in footer.get(4, []):
        msg = pb_parse(t)
        kind_code = _one(msg, 1, 0)
        if kind_code not in KIND:
            raise ValueError(f"orc: unknown type kind {kind_code}")
        types.append(
            {
                "kind": KIND[kind_code],
                "subtypes": _packed_varints(msg.get(2, [])),
                "field_names": [
                    f.decode("utf-8") for f in msg.get(3, [])
                ],
            }
        )
    stripes = []
    for s in footer.get(3, []):
        msg = pb_parse(s)
        stripes.append(
            {
                "offset": _one(msg, 1, 0),
                "index_length": _one(msg, 2, 0),
                "data_length": _one(msg, 3, 0),
                "footer_length": _one(msg, 4, 0),
                "n_rows": _one(msg, 5, 0),
            }
        )
    return {
        "compression": compression,
        "types": types,
        "stripes": stripes,
        "n_rows": _one(footer, 6, 0),
        "row_index_stride": _one(footer, 8, 0),
        "metadata_length": meta_len,
    }


def _stripe_footer(buf: bytes, stripe: dict, compression: str) -> dict:
    start = stripe["offset"] + stripe["index_length"] + stripe["data_length"]
    raw = decompress_stream(
        buf[start : start + stripe["footer_length"]], compression
    )
    msg = pb_parse(raw)
    streams = []
    for s in msg.get(1, []):
        sm = pb_parse(s)
        streams.append(
            {
                "kind": STREAM_KIND.get(_one(sm, 1, 0), "?"),
                "column": _one(sm, 2, 0),
                "length": _one(sm, 3, 0),
            }
        )
    encodings = []
    for e in msg.get(2, []):
        em = pb_parse(e)
        encodings.append(
            {
                "kind": ENCODING.get(_one(em, 1, 0), "?"),
                "dictionary_size": _one(em, 2, 0),
            }
        )
    tz = _one(msg, 3, b"")
    return {
        "streams": streams,
        "encodings": encodings,
        "writer_timezone": tz.decode("utf-8") if tz else "",
    }


def _apply_present(values: list, present: list[bool] | None, n: int) -> list:
    if present is None:
        if len(values) < n:
            raise ValueError("orc: column stream shorter than stripe")
        return values[:n]
    out = []
    it = iter(values)
    for flag in present[:n]:
        out.append(next(it) if flag else None)
    return out


#: 2015-01-01 00:00:00 UTC — the ORC timestamp epoch.
_ORC_EPOCH_S = 1_420_070_400


def _parse_nanos(v: int) -> int:
    """SECONDARY-stream nanos: the 3 low bits count removed trailing
    zeros (0 = none; t>0 means multiply by 10^(t+1))."""
    zeros = v & 7
    out = v >> 3
    if zeros:
        out *= 10 ** (zeros + 1)
    return out


def _int_stream(buf: bytes, n: int, signed: bool, enc_kind: str):
    """Dispatch integer-stream decode on the column encoding: _V2
    kinds use RLE v2, plain DIRECT/DICTIONARY (0.11-format files) use
    RLE v1. (Whether a DICTIONARY kind is VALID for the column is the
    caller's check — see _reject_dictionary below.)"""
    if enc_kind in ("DIRECT_V2", "DICTIONARY_V2"):
        return rle_v2(buf, n, signed)
    return rle_v1(buf, n, signed)


def _reject_dictionary(enc_kind: str, col_kind: str) -> None:
    """Hive 0.11 could dictionary-encode NUMERIC columns (dropped in
    0.12): their DATA stream holds dictionary INDEXES, which the
    value decoders here would silently mis-read as values. Reject
    loudly — the 'never mis-decoded' contract."""
    if enc_kind in ("DICTIONARY", "DICTIONARY_V2"):
        raise NotImplementedError(
            f"orc: dictionary-encoded {col_kind} columns unsupported "
            "(DATA holds dictionary indexes; only string dictionary "
            "encoding is implemented)"
        )


def _decode_column(
    col: int, types: list, encodings: list, streams: dict, n: int,
    compression: str, writer_timezone: str = "",
):
    kind = types[col]["kind"]
    enc = encodings[col]
    present = None
    if ("PRESENT", col) in streams:
        present = boolean_rle(
            decompress_stream(streams[("PRESENT", col)], compression), n
        )
    n_vals = sum(present) if present is not None else n

    def data(kind_name="DATA"):
        return decompress_stream(streams[(kind_name, col)], compression)

    if kind == "boolean":
        vals = boolean_rle(data(), n_vals)
        return _apply_present(vals, present, n)
    if kind in ("short", "int", "long"):
        _reject_dictionary(enc["kind"], kind)
        vals = _int_stream(data(), n_vals, True, enc["kind"])
        return _apply_present(vals, present, n)
    if kind == "byte":
        raw = byte_rle(data(), n_vals)
        vals = [b - 256 if b > 127 else b for b in raw[:n_vals]]
        return _apply_present(vals, present, n)
    if kind == "decimal":
        _reject_dictionary(enc["kind"], kind)
        import decimal as _dec

        raw = data()
        unscaled = []
        pos = 0
        for _ in range(n_vals):
            acc = 0
            shift = 0
            while True:
                if pos >= len(raw):
                    raise ValueError("orc: truncated decimal varint")
                b = raw[pos]
                pos += 1
                acc |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
                if shift > 16 * 8:
                    raise ValueError("orc: decimal varint too long")
            unscaled.append((acc >> 1) ^ -(acc & 1))  # zigzag
        scales = _int_stream(data("SECONDARY"), n_vals, True,
                             enc["kind"])
        vals = [
            _dec.Decimal(u).scaleb(-s) for u, s in zip(unscaled, scales)
        ]
        return _apply_present(vals, present, n)
    if kind in ("timestamp", "timestamp_instant"):
        _reject_dictionary(enc["kind"], kind)
        import datetime

        wz = None
        base_utc_s = _ORC_EPOCH_S
        if kind == "timestamp" and writer_timezone not in (
            "GMT", "UTC", "Etc/UTC", "",
        ):
            # Wall-clock timestamps are stored relative to the epoch
            # 2015-01-01 00:00:00 IN THE WRITER TIMEZONE (stripe
            # footer). Reconstruction matching the reference readers
            # (pinned value-exact against pyarrow across 4 zones x
            # 12 instants incl. pre-1970 sub-second forms, on REAL
            # Java-writer files written under a non-UTC JVM default
            # zone — tests/test_orc_read.py): instant = stored +
            # epoch@writer_tz, rendered as the naive wall-clock in
            # the writer timezone at that instant; the Java writer's
            # truncated-seconds/positive-nanos pre-1970 form needs
            # the one-second step back exactly when the LOCAL
            # (offset-adjusted) seconds are negative — the empirical
            # grid rejects every variant conditioned on the UTC
            # instant instead.
            import zoneinfo

            try:
                wz = zoneinfo.ZoneInfo(writer_timezone)
            except (zoneinfo.ZoneInfoNotFoundError, ValueError) as ex:
                raise NotImplementedError(
                    f"orc: writer timezone {writer_timezone!r} not "
                    f"resolvable via zoneinfo ({ex})"
                )
            base_utc_s = int(
                datetime.datetime(
                    2015, 1, 1, tzinfo=wz
                ).timestamp()
            )

        secs = _int_stream(data(), n_vals, True, enc["kind"])
        nanos_enc = _int_stream(data("SECONDARY"), n_vals, False,
                                enc["kind"])
        base = datetime.datetime(2015, 1, 1)
        vals = []
        for s, ne in zip(secs, nanos_enc):
            # the C++ writer emits SIGNED nanos for pre-1970 instants
            # (seconds truncated toward zero, negative fraction); the
            # Java writer emits floor-seconds with positive nanos.
            # Interpreting the SECONDARY value as two's complement
            # handles both: positive nanos add forward, negative nanos
            # subtract from the truncated second.
            if ne >= 1 << 63:
                ne -= 1 << 64
            # python's arithmetic shift and mask parse the signed form
            # directly: zeros live in the low 3 bits either way
            nanos = _parse_nanos(ne)
            # Java writers work in MILLIS and truncate pre-1970
            # seconds toward zero, keeping nanos positive — shift back
            # one second exactly when the millisecond part is nonzero
            # (nanos > 999999), matching the Java reader. The C++
            # writer's signed-nanos form never triggers this.
            if wz is None:
                if nanos > 999_999 and s + base_utc_s < 0:
                    s -= 1
                micros = (nanos // 1000 if nanos >= 0
                          else -((-nanos) // 1000))
                vals.append(
                    base
                    + datetime.timedelta(seconds=s, microseconds=micros)
                )
            else:
                inst = s + base_utc_s
                wall = datetime.datetime.fromtimestamp(inst, tz=wz)
                local = inst + int(
                    wall.utcoffset().total_seconds()
                )
                if nanos > 999_999 and local < 0:
                    inst -= 1
                    wall = datetime.datetime.fromtimestamp(
                        inst, tz=wz
                    )
                # same truncation-toward-zero as the UTC branch, so
                # the C++ writer's signed-nanos pre-1970 form decodes
                # identically under both branches
                micros = (nanos // 1000 if nanos >= 0
                          else -((-nanos) // 1000))
                vals.append(
                    wall.replace(tzinfo=None)
                    + datetime.timedelta(microseconds=micros)
                )
        return _apply_present(vals, present, n)
    if kind == "date":
        _reject_dictionary(enc["kind"], kind)
        import datetime

        days = _int_stream(data(), n_vals, True, enc["kind"])
        epoch = datetime.date(1970, 1, 1)
        vals = [epoch + datetime.timedelta(days=d) for d in days]
        return _apply_present(vals, present, n)
    if kind == "float":
        raw = data()
        vals = list(struct.unpack(f"<{n_vals}f", raw[: 4 * n_vals]))
        return _apply_present(vals, present, n)
    if kind == "double":
        raw = data()
        vals = list(struct.unpack(f"<{n_vals}d", raw[: 8 * n_vals]))
        return _apply_present(vals, present, n)
    if kind in ("string", "varchar", "char", "binary"):
        as_bytes = kind == "binary"
        if enc["kind"] in ("DIRECT", "DIRECT_V2"):
            blob = data()
            lengths = _int_stream(data("LENGTH"), n_vals, False,
                                  enc["kind"])
            vals = []
            pos = 0
            for ln in lengths:
                piece = blob[pos : pos + ln]
                if len(piece) != ln:
                    raise ValueError("orc: string data shorter than lengths")
                vals.append(piece if as_bytes else piece.decode("utf-8"))
                pos += ln
        elif enc["kind"] in ("DICTIONARY", "DICTIONARY_V2"):
            dict_size = enc["dictionary_size"]
            blob = data("DICTIONARY_DATA")
            lengths = _int_stream(data("LENGTH"), dict_size, False,
                                  enc["kind"])
            entries = []
            pos = 0
            for ln in lengths:
                piece = blob[pos : pos + ln]
                entries.append(piece if as_bytes else piece.decode("utf-8"))
                pos += ln
            idxs = _int_stream(data(), n_vals, False, enc["kind"])
            vals = []
            for i in idxs:
                if not 0 <= i < len(entries):
                    raise ValueError("orc: dictionary index out of range")
                vals.append(entries[i])
        else:
            raise NotImplementedError(
                f"orc: string encoding {enc['kind']} unsupported"
            )
        return _apply_present(vals, present, n)
    if kind in ("list", "map"):
        # LENGTH gives per-present-row child counts; children are the
        # flattened elements (one child column for list, key + value
        # columns for map), whose own streams cover only those rows.
        lengths = _int_stream(data("LENGTH"), n_vals, False,
                              enc["kind"])
        child_n = sum(lengths)
        subs = types[col]["subtypes"]
        kids = [
            _decode_column(
                s, types, encodings, streams, child_n, compression,
                writer_timezone,
            )
            for s in subs
        ]
        vals = []
        pos = 0
        for ln in lengths:
            if kind == "list":
                vals.append(kids[0][pos : pos + ln])
            else:
                vals.append(
                    list(zip(kids[0][pos : pos + ln],
                             kids[1][pos : pos + ln]))
                )
            pos += ln
        return _apply_present(vals, present, n)
    if kind == "union":
        # ORC spec "Union Columns": the DATA stream is Byte-RLE TAGS
        # (one per present value, the child-type index); each child
        # column then holds ONLY the values whose tag selects it, in
        # row order. Decoded as (tag, value) pairs so callers keep
        # the branch identity (pyarrow's read-back drops it).
        subs = types[col]["subtypes"]
        tags = list(byte_rle(data(), n_vals)[:n_vals])
        bad = [t for t in tags if t >= len(subs)]
        if bad:
            raise ValueError(
                f"orc: union tag {bad[0]} out of range "
                f"({len(subs)} subtypes)"
            )
        kids = [
            iter(_decode_column(
                s, types, encodings, streams,
                sum(1 for t in tags if t == ci), compression,
                writer_timezone,
            ))
            for ci, s in enumerate(subs)
        ]
        vals = [(t, next(kids[t])) for t in tags]
        return _apply_present(vals, present, n)
    if kind == "struct":
        # children carry one entry per parent-present row
        subs = types[col]["subtypes"]
        names = types[col]["field_names"]
        kids = [
            _decode_column(
                s, types, encodings, streams, n_vals, compression,
                writer_timezone,
            )
            for s in subs
        ]
        vals = [dict(zip(names, row)) for row in zip(*kids)] if subs else [
            {} for _ in range(n_vals)
        ]
        return _apply_present(vals, present, n)
    raise NotImplementedError(f"orc: column type {kind!r} unsupported")


def read_orc(buf: bytes) -> dict:
    """Decode every stripe of a flat ORC file. Returns
    {"columns": {name: [values]}, "n_rows", "tail"}."""
    tail = parse_tail(buf)
    types = tail["types"]
    if not types or types[0]["kind"] != "struct":
        raise NotImplementedError("orc: root type must be struct")
    root = types[0]
    columns: dict[str, list] = {nm: [] for nm in root["field_names"]}
    comp = tail["compression"]
    for stripe in tail["stripes"]:
        sf = _stripe_footer(buf, stripe, comp)
        # streams lay out sequentially: indexes first, then data
        pos = stripe["offset"]
        smap = {}
        for s in sf["streams"]:
            if s["kind"] not in ("ROW_INDEX", "BLOOM_FILTER",
                                 "BLOOM_FILTER_UTF8"):
                smap[(s["kind"], s["column"])] = buf[
                    pos : pos + s["length"]
                ]
            pos += s["length"]
        n = stripe["n_rows"]
        for name, sub in zip(root["field_names"], root["subtypes"]):
            columns[name] += _decode_column(
                sub,
                types,
                sf["encodings"],
                smap,
                n,
                comp,
                writer_timezone=sf.get("writer_timezone", ""),
            )
    total = sum(s["n_rows"] for s in tail["stripes"])
    if total != tail["n_rows"]:
        raise ValueError("orc: stripe row counts disagree with footer")
    return {"columns": columns, "n_rows": total, "tail": tail}
