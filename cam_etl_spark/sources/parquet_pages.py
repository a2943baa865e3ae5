"""Parquet DATA PAGE decode from spec — the companion to
parquet_meta.py's footer reader: page headers (thrift compact), data
pages v1 AND v2, Snappy and LZ4 block decompression (from-spec: both
formats are varint/nibble tag streams, no tables), GZIP pages through
the engine's own RFC-1952 inflater, ZSTD pages through the engine's
own RFC-8878 decoder (multimodal/zstd.py — round 11), BROTLI pages
through the engine's own RFC-7932 decoder (multimodal/brotli.py —
round 12), RLE/bit-packed
hybrid definition levels, and PLAIN / PLAIN_DICTIONARY /
RLE_DICTIONARY / DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY /
DELTA_BYTE_ARRAY / BYTE_STREAM_SPLIT value decoding — every
non-deprecated encoding in parquet-format
(INT32/INT64/DOUBLE/FLOAT/BYTE_ARRAY/BOOLEAN).

Scope covers the engine's ENTIRE bronze schema: flat columns plus
single-level LIST leaves, whose records reassemble through real
Dremel repetition/definition levels. The legacy Hadoop-framed 'LZ4'
codec (what parquet-mr/Spark write for compression=lz4) decodes via
lz4_hadoop_decompress (round 11). With BROTLI landed
(round 12) the codec matrix is COMPLETE — every parquet-format codec
except the spec-deprecated LZO decodes from spec. Boundaries are
loud: nesting deeper than one list raises NotImplementedError;
every integrity violation (snappy/lz4 overrun, page-size mismatch,
level overrun) raises ValueError.

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
# LZ4 block format (lz4_Block_format.md — token nibbles + 255-extension
# bytes + 2-byte LE offsets; fully derivable, no tables)
# ---------------------------------------------------------------------------


def lz4_block_decompress(buf: bytes, expected: int | None) -> bytes:
    """``expected`` None skips the exact-size check (ORC's chunk
    framing does not carry the decompressed size; parquet page
    headers do)."""
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = buf[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: literal run overruns input")
        out += buf[pos : pos + lit]
        pos += lit
        if pos >= n:
            break  # last sequence carries literals only
        offset = buf[pos] | buf[pos + 1] << 8
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: match offset out of range")
        mlen = (token & 0x0F) + 4
        if token & 0x0F == 15:
            while True:
                b = buf[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        for _ in range(mlen):
            out.append(out[-offset])
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"lz4: decoded {len(out)} bytes, page header says {expected}"
        )
    return bytes(out)


def lz4_hadoop_decompress(buf: bytes, expected: int) -> bytes:
    """The LEGACY parquet 'LZ4' codec (what parquet-mr — and thus
    Spark's `compression=lz4` — writes): Hadoop BlockCompressorStream
    framing around raw LZ4 blocks. Each outer block is a 4-byte
    big-endian uncompressed size followed by one or more inner
    chunks, each a 4-byte big-endian compressed size + an LZ4 raw
    block; outer blocks repeat until the input is consumed."""
    out = bytearray()
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 8 > n:
            raise ValueError("lz4-hadoop: truncated block header")
        usize = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
        got = 0
        while got < usize:
            if pos + 4 > n:
                raise ValueError("lz4-hadoop: truncated chunk header")
            csize = int.from_bytes(buf[pos : pos + 4], "big")
            pos += 4
            chunk = buf[pos : pos + csize]
            if len(chunk) < csize:
                raise ValueError("lz4-hadoop: truncated chunk body")
            pos += csize
            dec = lz4_block_decompress(chunk, None)
            out += dec
            got += len(dec)
        if got != usize:
            raise ValueError(
                f"lz4-hadoop: block inflated to {got}, header says "
                f"{usize}"
            )
    if len(out) != expected:
        raise ValueError(
            f"lz4-hadoop: decoded {len(out)} bytes, page header says "
            f"{expected}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# RLE / bit-packed hybrid (parquet-format Encodings.md)
# ---------------------------------------------------------------------------


def bitpacked_msb_levels(buf: bytes, width: int,
                         count: int) -> list[int]:
    """The DEPRECATED standalone BIT_PACKED level encoding
    (parquet-format Encodings.md): values packed most-significant-bit
    first with no length prefix — distinct from the RLE hybrid's
    LSB-first bit-packed runs."""
    out = []
    bitpos = 0
    for _ in range(count):
        v = 0
        for _b in range(width):
            v = (v << 1) | ((buf[bitpos >> 3] >> (7 - (bitpos & 7)))
                            & 1)
            bitpos += 1
        out.append(v)
    return out


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
# DELTA encodings (Encodings.md §5-7 — all closed-form: varint headers,
# zigzag first value / min-deltas, little-endian bit-packed miniblocks)
# ---------------------------------------------------------------------------


def delta_binary_packed(r: _Reader, want: int | None = None) -> list[int]:
    """DELTA_BINARY_PACKED: <block size><miniblocks/block><count>
    <first value> then blocks of <min delta><bit widths><packed>."""
    block_size = r.varint()
    n_mini = r.varint()
    count = r.varint()
    first = r.zigzag()
    if want is not None and count != want:
        raise ValueError(
            f"delta: header count {count} != expected {want}"
        )
    if n_mini == 0 or block_size % n_mini:
        raise ValueError("delta: bad miniblock geometry")
    per_mini = block_size // n_mini
    out = [first]
    remaining = count - 1
    while remaining > 0:
        min_delta = r.zigzag()
        widths = list(r.take(n_mini))
        for w in widths:
            if remaining <= 0:
                break  # wholly-unneeded miniblocks carry no data
            raw = r.take((per_mini * w + 7) // 8)
            acc = int.from_bytes(raw, "little")
            mask = (1 << w) - 1
            take = min(per_mini, remaining)
            for i in range(take):
                d = ((acc >> (i * w)) & mask) if w else 0
                out.append(out[-1] + min_delta + d)
            remaining -= take
    return out[:count]


def delta_length_byte_array(r: _Reader, n: int) -> list[bytes]:
    """DELTA_LENGTH_BYTE_ARRAY: lengths (DELTA_BINARY_PACKED) then the
    concatenated bytes."""
    lengths = delta_binary_packed(r, n)
    out = []
    for ln in lengths:
        if ln < 0:
            raise ValueError("delta: negative byte-array length")
        out.append(r.take(ln))
    return out


def delta_byte_array(r: _Reader, n: int) -> list[bytes]:
    """DELTA_BYTE_ARRAY (incremental): shared-prefix lengths
    (DELTA_BINARY_PACKED) + suffixes (DELTA_LENGTH_BYTE_ARRAY)."""
    prefix = delta_binary_packed(r, n)
    suffix = delta_length_byte_array(r, n)
    out: list[bytes] = []
    for p, s in zip(prefix, suffix):
        if p > (len(out[-1]) if out else 0):
            raise ValueError("delta: prefix longer than previous value")
        out.append((out[-1][:p] if p else b"") + s)
    return out


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
    file_bytes: bytes,
    chunk: dict,
    num_rows: int,
    optional: bool = True,
    max_def: int | None = None,
    max_rep: int = 0,
) -> list:
    """Decode every value of one column chunk (footer dict from
    parquet_meta.parse_footer row_groups[i]['columns'][j]).

    Flat columns (max_rep=0): returns a list of length num_rows with
    None for nulls; ``optional`` is the schema repetition (max
    definition level 1 vs 0 — a required column's pages carry no
    definition levels).

    Single-level LIST leaves (max_rep=1, max_def 2 or 3): returns a
    list of num_rows python lists (None for a null list, None elements
    for null elements), reassembled from repetition/definition levels
    the standard Dremel way. Deeper nesting is a loud boundary."""
    if max_rep > 1:
        raise NotImplementedError("parquet: nesting deeper than one list")
    if max_def is None:
        max_def = 1 if optional else 0
    codec = chunk["codec"]
    ptype = chunk["type"]
    def_width = max_def.bit_length()
    rep_width = max_rep.bit_length()
    all_reps: list[int] = []
    all_defs: list[int] = []
    all_vals: list = []
    start = chunk["dictionary_page_offset"]
    if start is None:
        start = chunk["data_page_offset"]
    pos = start
    dictionary: list | None = None
    values: list = []
    remaining = chunk["num_values"]
    def decompress(body: bytes, expected: int) -> bytes:
        if codec == "UNCOMPRESSED":
            raw = body
        elif codec == "SNAPPY":
            raw = snappy_decompress(body)
        elif codec == "GZIP":
            raw, _ = gzip_decompress(body)
        elif codec == "LZ4_RAW":
            raw = lz4_block_decompress(body, expected)
        elif codec == "LZ4":  # legacy Hadoop-framed (parquet-mr/Spark)
            raw = lz4_hadoop_decompress(body, expected)
        elif codec == "ZSTD":
            from cam_etl_spark.multimodal.zstd import zstd_decompress

            raw = zstd_decompress(body, expected)
        elif codec == "BROTLI":
            from cam_etl_spark.multimodal.brotli import (
                brotli_decompress,
            )

            raw = brotli_decompress(body, expected)
        else:
            raise NotImplementedError(f"parquet: codec {codec}")
        if len(raw) != expected:
            raise ValueError(
                f"parquet: page inflated to {len(raw)}, header says "
                f"{expected}"
            )
        return raw

    def present_values(enc: int, n_present: int, payload: bytes) -> list:
        if enc == 0:  # PLAIN
            return plain_values(payload, ptype, n_present)
        if enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
            if dictionary is None:
                raise ValueError("parquet: dict-encoded page, no dict")
            pr = _Reader(payload)
            bw = pr.byte()
            idx = rle_bitpacked_hybrid(pr, bw, n_present)
            return [dictionary[i] for i in idx]
        if enc == 3:  # RLE — boolean values (bit width 1, 4-byte len)
            if ptype != "BOOLEAN":
                raise NotImplementedError(f"parquet: RLE values for {ptype}")
            pr = _Reader(payload)
            ln = int.from_bytes(pr.take(4), "little")
            bits = rle_bitpacked_hybrid(_Reader(pr.take(ln)), 1, n_present)
            return [b == 1 for b in bits]
        if enc == 5:  # DELTA_BINARY_PACKED (INT32/INT64)
            if ptype not in ("INT32", "INT64"):
                raise NotImplementedError(
                    f"parquet: DELTA_BINARY_PACKED for {ptype}"
                )
            return delta_binary_packed(_Reader(payload), n_present)
        if enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
            if ptype != "BYTE_ARRAY":
                raise NotImplementedError(
                    f"parquet: DELTA_LENGTH_BYTE_ARRAY for {ptype}"
                )
            return delta_length_byte_array(_Reader(payload), n_present)
        if enc == 7:  # DELTA_BYTE_ARRAY (incremental strings)
            if ptype != "BYTE_ARRAY":
                raise NotImplementedError(
                    f"parquet: DELTA_BYTE_ARRAY for {ptype}"
                )
            return delta_byte_array(_Reader(payload), n_present)
        if enc == 9:  # BYTE_STREAM_SPLIT — byte-plane transpose
            width = {"FLOAT": 4, "DOUBLE": 8, "INT32": 4, "INT64": 8}.get(
                ptype
            )
            if width is None:
                raise NotImplementedError(
                    f"parquet: BYTE_STREAM_SPLIT for {ptype}"
                )
            if len(payload) < n_present * width:
                raise ValueError("parquet: BYTE_STREAM_SPLIT underrun")
            planes = [
                payload[k * n_present : (k + 1) * n_present]
                for k in range(width)
            ]
            joined = bytes(
                planes[k][i] for i in range(n_present) for k in range(width)
            )
            return plain_values(joined, ptype, n_present)
        raise NotImplementedError(f"parquet: encoding id {enc}")

    def emit(
        enc: int, defs: list[int], reps: list[int], payload: bytes
    ) -> None:
        n_present = sum(1 for d in defs if d == max_def)
        vals = present_values(enc, n_present, payload)
        if max_rep == 0:
            it = iter(vals)
            values.extend(
                next(it) if d == max_def else None for d in defs
            )
        else:
            all_defs.extend(defs)
            all_reps.extend(reps)
            all_vals.extend(vals)

    while remaining > 0:
        r = _Reader(file_bytes)
        r.pos = pos
        hdr = _read_struct(r)
        ptype_id = hdr[1]
        uncomp_size, comp_size = hdr[2], hdr[3]
        body = file_bytes[r.pos : r.pos + comp_size]
        pos = r.pos + comp_size
        if ptype_id == _PAGE_DICT:
            dhdr = hdr[7]
            dictionary = plain_values(
                decompress(body, uncomp_size), ptype, dhdr[1]
            )
            continue
        if ptype_id == _PAGE_DATA:
            raw = decompress(body, uncomp_size)
            dph = hdr[5]
            n_vals, enc = dph[1], dph[2]
            pr = _Reader(raw)

            # v1 level blocks: rep levels first, then def levels.
            # DataPageHeader fields 3/4 carry the level encodings:
            # RLE (3, the norm — RLE/bit-packed hybrid behind a
            # 4-byte length prefix) or the DEPRECATED BIT_PACKED (4 —
            # no length prefix, values packed MSB-first). parquet-mr
            # stamps BIT_PACKED for every max-level-0 column (where
            # zero bytes follow either way); genuinely bit-packed
            # non-empty levels appear only in ancient files, decoded
            # here for spec completeness (round 12). Omitted entirely
            # at width 0.
            def levels(width: int, enc_id: int) -> list[int]:
                if enc_id == 4:  # legacy BIT_PACKED
                    nbytes = (n_vals * width + 7) // 8
                    return bitpacked_msb_levels(
                        pr.take(nbytes), width, n_vals
                    )
                if enc_id != 3:
                    raise NotImplementedError(
                        f"parquet: level encoding {enc_id}"
                    )
                ln = int.from_bytes(pr.take(4), "little")
                return rle_bitpacked_hybrid(
                    _Reader(pr.take(ln)), width, n_vals
                )

            reps = (levels(rep_width, dph.get(4, 3)) if rep_width
                    else [0] * n_vals)
            defs = (levels(def_width, dph.get(3, 3)) if def_width
                    else [max_def] * n_vals)
            emit(enc, defs, reps, raw[pr.pos :])
        elif ptype_id == _PAGE_DATA_V2:
            # v2: levels live UNCOMPRESSED (no length prefix — lengths
            # are in the header) ahead of the possibly-compressed
            # values section
            dph = hdr[8]
            n_vals = dph[1]
            enc = dph[4]
            def_len = dph[5]
            rep_len = dph[6]
            is_comp = dph.get(7, True)
            if rep_width:
                reps = rle_bitpacked_hybrid(
                    _Reader(body[:rep_len]), rep_width, n_vals
                )
            elif rep_len:
                raise ValueError("parquet: rep levels on non-repeated col")
            else:
                reps = [0] * n_vals
            if def_width:
                defs = rle_bitpacked_hybrid(
                    _Reader(body[rep_len : rep_len + def_len]),
                    def_width,
                    n_vals,
                )
            else:
                defs = [max_def] * n_vals
            vbody = body[rep_len + def_len :]
            payload = (
                decompress(vbody, uncomp_size - def_len - rep_len)
                if is_comp
                else vbody
            )
            emit(enc, defs, reps, payload)
        else:
            raise ValueError(f"parquet: unexpected page type {ptype_id}")
        remaining -= n_vals
    if remaining != 0:
        raise ValueError("parquet: page walk value-count mismatch")
    if max_rep == 0:
        if len(values) != chunk["num_values"]:
            raise ValueError("parquet: page walk value-count mismatch")
        return values
    return _assemble_lists(all_reps, all_defs, all_vals, max_def, num_rows)


def _assemble_lists(
    reps: list[int], defs: list[int], vals: list, max_def: int, num_rows: int
) -> list:
    """Dremel record assembly for a single-level LIST: with an optional
    outer group and optional element, def levels mean value (max_def),
    null element (max_def-1), empty list (1), null list (0). rep 0
    starts a new record; rep 1 continues the current list."""
    records: list = []
    it = iter(vals)
    for r, d in zip(reps, defs):
        if r == 0:
            records.append([] if d >= 1 else None)
        if d == max_def:
            records[-1].append(next(it))
        elif d == max_def - 1 and max_def >= 3:
            records[-1].append(None)
    if len(records) != num_rows:
        raise ValueError(
            f"parquet: assembled {len(records)} records, expected {num_rows}"
        )
    return records


# ---------------------------------------------------------------------------
# LZO1X (the format documented in the Linux kernel's
# Documentation/staging/lzo.rst — instruction bytes with a 0-3 literal
# "state" carried between instructions; no tables, fully derivable).
# ORC's LZO codec is raw LZO1X per chunk (what the Java writer's
# aircompressor emits).
# ---------------------------------------------------------------------------


def lzo1x_decompress(buf: bytes, expected: int | None = None) -> bytes:
    """Decode one raw LZO1X stream. ``expected`` None skips the
    exact-size check (ORC chunk framing carries no decompressed
    size). Cross-checked against real Spark/aircompressor-written
    ORC files in tests/test_orc_read.py.

    Instruction grammar (states are the 0-3 trailing-literal count of
    the previous instruction, or 4 after a literal run of >= 4):

    * first byte > 17: literal run of (byte - 17);
    * 128..255 / 64..127: 1-byte matches (lengths 5-8 / 3-4) with a
      distance byte, low 2 bits = trailing literals;
    * 32..63: medium match, length 2+(t&31) (0 extends by 255-runs),
      2-byte LE distance field (>>2, +1), low 2 bits = literals;
    * 16..31: far match (distance 16384..49151 via (t&8)<<11), length
      2+(t&7) (0 extends); distance exactly 16384 is end-of-stream;
    * 0..15: state 0 = literal run 3+t (0 extends from 18);
      states 1-3 = 2-byte match at ((next<<2)+(t>>2)+1);
      state 4 = 3-byte match at ((next<<2)+(t>>2)+2049).
    """
    out = bytearray()
    pos = 0
    n = len(buf)

    def need(k):
        if pos + k > n:
            raise ValueError("lzo: truncated input")

    def run255():
        nonlocal pos
        length = 0
        while True:
            need(1)
            b = buf[pos]
            pos += 1
            if b:
                return length + b
            length += 255

    def copy_match(dist, length):
        if dist <= 0 or dist > len(out):
            raise ValueError("lzo: match distance out of range")
        start = len(out) - dist
        if dist >= length:
            out.extend(out[start : start + length])
        else:
            for i in range(length):
                out.append(out[start + i])

    state = 0
    need(1)
    if buf[0] > 17:
        length = buf[0] - 17
        pos = 1
        need(length)
        out += buf[pos : pos + length]
        pos += length
        state = 4 if length >= 4 else length
    ended = False
    while pos < n:
        t = buf[pos]
        pos += 1
        if t >= 64:
            length = (5 + ((t >> 5) & 3)) if t >= 128 else (
                3 + ((t >> 5) & 1))
            need(1)
            dist = (buf[pos] << 3) + ((t >> 2) & 7) + 1
            pos += 1
            copy_match(dist, length)
            state = t & 3
        elif t >= 32:
            length = (t & 31) + 2 if (t & 31) else 33 + run255()
            need(2)
            le = buf[pos] | (buf[pos + 1] << 8)
            pos += 2
            copy_match((le >> 2) + 1, length)
            state = le & 3
        elif t >= 16:
            length = (t & 7) + 2 if (t & 7) else 9 + run255()
            need(2)
            le = buf[pos] | (buf[pos + 1] << 8)
            pos += 2
            dist = 16384 + ((t & 8) << 11) + (le >> 2)
            if dist == 16384:
                if length != 3:
                    raise ValueError("lzo: bad end-of-stream marker")
                ended = True
                break
            copy_match(dist, length)
            state = le & 3
        else:
            if state == 0:
                length = t + 3 if t else 18 + run255()
                need(length)
                out += buf[pos : pos + length]
                pos += length
                state = 4
                continue
            if state == 4:
                need(1)
                dist = (buf[pos] << 2) + (t >> 2) + 2049
                pos += 1
                copy_match(dist, 3)
            else:  # states 1-3
                need(1)
                dist = (buf[pos] << 2) + (t >> 2) + 1
                pos += 1
                copy_match(dist, 2)
            state = t & 3
        if state:  # 1-3 trailing literals ride every match
            need(state)
            out += buf[pos : pos + state]
            pos += state
    if not ended:
        raise ValueError("lzo: missing end-of-stream marker")
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"lzo: decoded {len(out)} bytes, expected {expected}"
        )
    return bytes(out)
