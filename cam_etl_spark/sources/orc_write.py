"""ORC file WRITER from spec (the Apache ORC v1 specification) — the
write half of sources/orc_read.py, same discipline as the round-8
parquet writer (parquet_write.py): enough of the format, produced
from first principles, that INDEPENDENT readers accept the files.

Produces complete single-stripe ORC files with flat columns:
bigint (integer RLE v2 DIRECT runs, zigzag, closed-form width
table), double (IEEE-754 LE), and string (DIRECT_V2: length RLEv2
+ concatenated UTF-8); NULLABLE columns emit a PRESENT stream
(bits MSB-first, byte-RLE literal groups) with only the non-null
values in the data streams, per spec. The protobuf tail
(StripeFooter, Footer, PostScript) is emitted by a
from-first-principles protobuf WIRE writer — four rules, no
generated code. Compression NONE (the spec makes it a first-class
mode; compressed chunk framing is exercised on the READ side
against real writer output).

Verification (tests/test_orc_write.py + catalog entry
`s25_orc_write_roundtrip`): every written file is read back by
pyarrow's ORC C++ reader AND Spark's native ORC Java reader AND the
engine's own from-spec decoder, asserted row-exact.

Boundaries loud: other types, multi-stripe, and compression raise
NotImplementedError — this proves the format layer; Spark's native
ORC sink remains the production writer.

Reference parity: reference repo (cam-etl) has no lake layer;
SURVEY.md §2.1 sink-surface extension.
"""

from __future__ import annotations

import struct

from cam_etl_spark.sources.orc_read import _WIDTHS

MAGIC = b"ORC"


# ---------------------------------------------------------------------------
# Protobuf wire writer
# ---------------------------------------------------------------------------


class _PB:
    __slots__ = ("out",)

    def __init__(self):
        self.out = bytearray()

    def varint(self, v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def field_varint(self, num: int, v: int):
        self.varint(num << 3 | 0)
        self.varint(v)

    def field_bytes(self, num: int, raw: bytes):
        self.varint(num << 3 | 2)
        self.varint(len(raw))
        self.out += raw

    def field_msg(self, num: int, msg: "_PB"):
        self.field_bytes(num, bytes(msg.out))


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def _width_code(bits: int) -> tuple[int, int]:
    """(5-bit encoded width, actual width) — round UP to the closed-
    form table the spec allows for DIRECT runs."""
    for code, w in enumerate(_WIDTHS):
        if w >= bits:
            return code, w
    return len(_WIDTHS) - 1, 64


def rle_v2_direct(values: list[int], signed: bool) -> bytes:
    """Integer RLE v2 using DIRECT runs only (always-valid encoding;
    max 512 values per run, bit-packed big-endian)."""
    out = bytearray()
    pos = 0
    while pos < len(values):
        run = values[pos : pos + 512]
        pos += len(run)
        if signed:
            enc = [((v << 1) ^ (v >> 63)) & ((1 << 64) - 1) for v in run]
        else:
            for v in run:
                if v < 0:
                    raise ValueError("orc write: negative unsigned value")
            enc = list(run)
        bits = max(max(v.bit_length() for v in enc), 1)
        code, width = _width_code(bits)
        header = (0b01 << 6) | (code << 1) | ((len(run) - 1) >> 8)
        out.append(header)
        out.append((len(run) - 1) & 0xFF)
        acc = 0
        nbits = 0
        for v in enc:
            acc = (acc << width) | v
            nbits += width
            while nbits >= 8:
                nbits -= 8
                out.append((acc >> nbits) & 0xFF)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def byte_rle_literal(raw: bytes) -> bytes:
    """Byte-RLE using literal groups only (always-valid encoding;
    header 256-n then n raw bytes, n <= 128) — the spec's control
    byte >= 128 branch, inverse of orc_read.byte_rle."""
    out = bytearray()
    for pos in range(0, len(raw), 128):
        chunk = raw[pos : pos + 128]
        out.append(256 - len(chunk))
        out += chunk
    return bytes(out)


def present_stream(flags: list[bool]) -> bytes:
    """PRESENT stream: bits MSB-first packed into bytes, zero-padded,
    then byte-RLE."""
    packed = bytearray((len(flags) + 7) // 8)
    for i, f in enumerate(flags):
        if f:
            packed[i >> 3] |= 0x80 >> (i & 7)
    return byte_rle_literal(bytes(packed))


# Footer Type.kind codes for the supported types
_KIND_CODE = {"long": 4, "double": 6, "string": 7}


def write_orc(columns: list[tuple[str, str, list]]) -> bytes:
    """``columns`` = [(name, type, values)] with type in
    {"long", "double", "string"}; all columns same length. None
    values are encoded via a PRESENT stream (boolean RLE over
    byte-RLE literal groups). Returns the complete ORC file bytes."""
    if not columns:
        raise ValueError("orc write: no columns")
    n_rows = len(columns[0][2])
    for name, ctype, values in columns:
        if len(values) != n_rows:
            raise ValueError("orc write: ragged columns")
        if ctype not in _KIND_CODE:
            raise NotImplementedError(f"orc write: type {ctype!r}")

    out = bytearray(MAGIC)  # headerLength = 3
    stripe_start = len(out)

    # streams per column: PRESENT (only when nulls exist) then DATA
    # (+LENGTH for strings), matching the reader's sequential layout
    streams = []  # (kind_code, column_id, bytes)
    for col_id, (name, ctype, values) in enumerate(columns, start=1):
        vals = list(values)
        if any(v is None for v in vals):
            streams.append(
                (0, col_id, present_stream([v is not None for v in vals]))
            )
            vals = [v for v in vals if v is not None]
        if ctype == "long":
            streams.append((1, col_id, rle_v2_direct(vals, True)))
        elif ctype == "double":
            streams.append(
                (1, col_id, struct.pack(f"<{len(vals)}d", *vals))
            )
        else:  # string DIRECT_V2
            blobs = [v.encode("utf-8") for v in vals]
            streams.append((1, col_id, b"".join(blobs)))
            streams.append(
                (2, col_id, rle_v2_direct([len(b) for b in blobs], False))
            )
    data_len = 0
    for _kind, _col, raw in streams:
        out += raw
        data_len += len(raw)

    # stripe footer
    sf = _PB()
    for kind, col, raw in streams:
        sm = _PB()
        sm.field_varint(1, kind)
        sm.field_varint(2, col)
        sm.field_varint(3, len(raw))
        sf.field_msg(1, sm)
    # encodings: root struct DIRECT, then per column
    enc_root = _PB()
    enc_root.field_varint(1, 0)
    sf.field_msg(2, enc_root)
    for _name, ctype, _values in columns:
        em = _PB()
        em.field_varint(1, 2 if ctype in ("long", "string") else 0)
        sf.field_msg(2, em)
    sf_bytes = bytes(sf.out)
    out += sf_bytes

    # footer
    footer = _PB()
    footer.field_varint(1, 3)  # headerLength (the magic)
    footer.field_varint(2, len(out))  # contentLength so far
    si = _PB()
    si.field_varint(1, stripe_start)
    si.field_varint(2, 0)  # indexLength
    si.field_varint(3, data_len)
    si.field_varint(4, len(sf_bytes))
    si.field_varint(5, n_rows)
    footer.field_msg(3, si)
    root = _PB()
    root.field_varint(1, 12)  # STRUCT
    for i in range(len(columns)):
        root.field_varint(2, i + 1)  # subtypes (unpacked repeated)
    for name, _ctype, _values in columns:
        root.field_bytes(3, name.encode("utf-8"))
    footer.field_msg(4, root)
    for _name, ctype, _values in columns:
        tm = _PB()
        tm.field_varint(1, _KIND_CODE[ctype])
        footer.field_msg(4, tm)
    footer.field_varint(6, n_rows)
    footer.field_varint(8, 0)  # rowIndexStride: no row index
    footer_bytes = bytes(footer.out)
    out += footer_bytes

    ps = _PB()
    ps.field_varint(1, len(footer_bytes))
    ps.field_varint(2, 0)  # compression NONE
    ps.field_varint(3, 0)  # compressionBlockSize (unused for NONE)
    vm = _PB()
    vm.varint(0)
    vm.varint(12)
    ps.field_bytes(4, bytes(vm.out))  # version [0, 12] (packed)
    ps.field_varint(5, 0)  # metadataLength
    ps.field_varint(6, 1)  # writerVersion
    ps.field_bytes(8000, MAGIC)
    ps_bytes = bytes(ps.out)
    if len(ps_bytes) > 255:
        raise ValueError("orc write: postscript too long")
    out += ps_bytes
    out.append(len(ps_bytes))
    return bytes(out)
