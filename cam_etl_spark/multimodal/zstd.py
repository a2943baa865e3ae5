"""Zstandard (RFC 8878) decompressor FROM SPEC — no zstd library.

The third from-spec entropy codec in the engine after DEFLATE
(multimodal/inflate.py) and the Snappy/LZ4 block formats
(sources/parquet_pages.py), and the one that matters most at the
lake layer: ZSTD is Spark 4's DEFAULT ORC compression and the common
default for modern parquet/Delta/Iceberg deployments, so a 100 TB
integrity audit that decodes every chunk with the engine's own
readers hits this codec first.

Implemented (the complete single-frame decode path):

* frame header: magic, frame-header descriptor, window descriptor,
  single-segment sizes, frame content size (all four widths);
  dictionary IDs reject loudly (no dictionary support);
* blocks: raw, RLE and compressed, with the 21-bit size header;
* literals: raw, RLE, Huffman-compressed and treeless (table reuse),
  in both 1-stream and 4-stream layouts (6-byte jump table), with
  canonical Huffman tables built from direct 4-bit weights OR
  FSE-compressed weights (two interleaved states, RFC §4.2.1), the
  implied last weight recovered from the power-of-two completeness
  invariant — which doubles as a structural validity check;
* sequences: the three interleaved FSE state machines (literal
  lengths, offsets, match lengths) over the BACKWARD bitstream, all
  four symbol-compression modes (predefined / RLE / FSE-compressed /
  repeat), the RFC's printed predefined distributions (their
  normalized counts must sum to 2^accuracy_log counting -1 as 1 —
  asserted at import), the LL/ML baseline+extra-bits code tables,
  and the 3-slot repeat-offset history with the literal-length-0
  special case;
* sequence execution with overlapping match copies, and the xxHash64
  content checksum (RFC 8878 Annex A) verified when present.

Verification: every construct is cross-checked against the REAL
zstd library (pyarrow links libzstd) — roundtrips over structured
and adversarial inputs at multiple compression levels and window
configurations, plus real Spark-written ZSTD ORC files decoded
value-exact (tests/test_zstd.py, test_orc_read.py). A wrong vendored
distribution or a broken FSE spread cannot survive those: predefined
tables are exercised by small inputs, FSE-compressed tables by large
skewed ones.

Loud boundaries: dictionaries, multi-frame concatenation beyond
what callers pass (decode_zstd consumes ONE frame and returns the
tail offset; zstd_decompress requires full consumption), and
skippable frames (recognized, skipped).

Reference parity: the reference repo (cam-etl) has no compression
layer at all; SURVEY.md §2.1 source-surface extension (the lake
readers are where this engine goes beyond the reference's scope).
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F


# ---------------------------------------------------------------------------
# Backward bitstream (FSE/Huffman payloads are written forward, read
# backward from the last byte; the highest set bit of the last byte is
# a sentinel marking the start position)
# ---------------------------------------------------------------------------


class _BackBits:
    def __init__(self, buf: bytes):
        if not buf:
            raise ValueError("zstd: empty bitstream")
        if buf[-1] == 0:
            raise ValueError("zstd: bitstream has no sentinel bit")
        self.value = int.from_bytes(buf, "little")
        self.pos = len(buf) * 8 - 8 + buf[-1].bit_length() - 1

    def read(self, n: int) -> int:
        """Read n bits below the cursor (MSB-first order). Reads past
        the start return zero bits (FSE state init may legally touch
        the boundary); grossly negative positions are caught by the
        callers' sequence accounting."""
        if n == 0:
            return 0
        self.pos -= n
        if self.pos <= -64:
            raise ValueError("zstd: bitstream overread")
        if self.pos < 0:
            return (self.value << -self.pos) & ((1 << n) - 1)
        return (self.value >> self.pos) & ((1 << n) - 1)

    @property
    def exhausted(self) -> bool:
        return self.pos <= 0


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def _fse_build(norm: list[int], accuracy_log: int):
    """Decode-table build (RFC §4.1.1): -1 probabilities take slots
    from the table end; positive probabilities spread with the
    (5/8·size + 3) step; each cell gets (symbol, nbBits, baseline)."""
    size = 1 << accuracy_log
    mask = size - 1
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(norm):
        if c == -1:
            symbols[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    for s, c in enumerate(norm):
        if c <= 0:
            continue
        for _ in range(c):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: FSE table spread did not close")
    nxt = [c if c > 0 else 1 for c in norm] + [0]
    nbbits = [0] * size
    baseline = [0] * size
    for i in range(size):
        s = symbols[i]
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy_log - (x.bit_length() - 1)
        nbbits[i] = nb
        baseline[i] = (x << nb) - size
    return symbols, nbbits, baseline


def _fse_read_norm(buf: bytes, pos: int, max_symbol: int,
                   max_accuracy: int):
    """Read an FSE table description (FORWARD bitstream, RFC §4.1.1):
    4-bit accuracy-log field, then variable-width normalized counts
    with the zero-repeat escape. Returns (norm, accuracy_log, new
    byte position)."""
    bitpos = 0

    def peek(n):
        end = pos + ((bitpos + n + 7) // 8)
        chunk = buf[pos:end]
        if len(chunk) < (bitpos + n + 7) // 8:
            chunk = chunk + b"\x00" * 8
        v = int.from_bytes(chunk, "little")
        return (v >> bitpos) & ((1 << n) - 1)

    def take(n):
        nonlocal bitpos
        v = peek(n)
        bitpos += n
        return v

    accuracy_log = take(4) + 5
    if accuracy_log > max_accuracy:
        raise ValueError(
            f"zstd: FSE accuracy log {accuracy_log} exceeds "
            f"{max_accuracy}"
        )
    size = 1 << accuracy_log
    remaining = size + 1
    norm: list[int] = []
    prev_zero = False
    while remaining > 1 and len(norm) <= max_symbol:
        if prev_zero:
            while peek(2) == 3:
                take(2)
                norm.extend([0, 0, 0])
            norm.extend([0] * take(2))
            prev_zero = False
            continue
        nbits = remaining.bit_length()  # highbit(remaining) + 1
        val = peek(nbits)
        low_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        # values whose low (nbits-1) bits fall below the threshold
        # are coded in nbits-1 bits; the rest take all nbits and
        # fold the threshold back out
        if (val & low_mask) < threshold:
            take(nbits - 1)
            val &= low_mask
        else:
            take(nbits)
            if val > low_mask:
                val -= threshold
        proba = val - 1
        remaining -= 1 if proba < 0 else proba
        norm.append(proba)
        prev_zero = proba == 0
    if remaining != 1:
        raise ValueError("zstd: FSE normalized counts do not sum to "
                         "table size")
    while len(norm) <= max_symbol:
        norm.append(0)
    return norm, accuracy_log, pos + (bitpos + 7) // 8


class _FseState:
    def __init__(self, table, bits: "_BackBits", accuracy_log: int):
        self.symbols, self.nbbits, self.baseline = table
        self.state = bits.read(accuracy_log)

    @property
    def symbol(self) -> int:
        return self.symbols[self.state]

    def update(self, bits: "_BackBits") -> None:
        nb = self.nbbits[self.state]
        self.state = self.baseline[self.state] + bits.read(nb)


# ---------------------------------------------------------------------------
# Huffman literals
# ---------------------------------------------------------------------------

#: FSE table for FSE-compressed Huffman WEIGHTS uses max accuracy 6.
_HUF_WEIGHT_MAX_ACCURACY = 6


def _huf_table_from_weights(weights: list[int]):
    """Canonical Huffman decode table from weights (RFC §4.2.1): the
    LAST weight is implied — recovered from the completeness
    invariant sum(2^(w-1)) == 2^max_bits, which also validates the
    table."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: all-zero Huffman weights")
    # Max_Number_of_Bits = highestBit(total) + 1; the implied last
    # weight completes the sum to 2^Max_Number_of_Bits exactly
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left <= 0 or (left & (left - 1)):
        raise ValueError("zstd: Huffman weights do not leave a "
                         "power-of-two remainder for the last symbol")
    last_weight = left.bit_length()
    weights = weights + [last_weight]
    # number_of_bits = max_bits + 1 - weight (weight 0 = absent)
    nbits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
    # canonical assignment: ascending weight (descending bit count),
    # equal weights in natural symbol order; table lookup by the top
    # max_bits of the stream
    size = 1 << max_bits
    sym_tab = [0] * size
    len_tab = [0] * size
    posi = 0
    for w in range(1, max_bits + 1):
        for s, sw in enumerate(weights):
            if sw != w:
                continue
            nb = max_bits + 1 - w
            span = 1 << (max_bits - nb)
            for _ in range(span):
                sym_tab[posi] = s
                len_tab[posi] = nb
                posi += 1
    if posi != size:
        raise ValueError("zstd: Huffman table incomplete")
    return sym_tab, len_tab, max_bits


def _read_huffman_table(buf: bytes, pos: int):
    """Huffman tree description: header byte < 128 selects
    FSE-compressed weights (two interleaved states), else direct
    4-bit weights. Returns (table, new position)."""
    hb = buf[pos]
    pos += 1
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        raw = buf[pos : pos + nbytes]
        if len(raw) < nbytes:
            raise ValueError("zstd: truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _huf_table_from_weights(weights), pos + nbytes
    comp = buf[pos : pos + hb]
    if len(comp) < hb:
        raise ValueError("zstd: truncated FSE-compressed Huffman "
                         "weights")
    norm, al, hdr_end = _fse_read_norm(
        comp, 0, 255, _HUF_WEIGHT_MAX_ACCURACY
    )
    table = _fse_build(norm, al)
    bits = _BackBits(comp[hdr_end:])
    even = _FseState(table, bits, al)
    odd = _FseState(table, bits, al)
    weights = []
    # two interleaved states; decoding stops when the stream is
    # consumed (RFC: "repeat until the bitstream is exhausted")
    while True:
        weights.append(even.symbol)
        if bits.pos < -int(al):
            raise ValueError("zstd: Huffman weight stream overread")
        even.update(bits)
        if bits.pos < 0:
            weights.append(odd.symbol)
            break
        weights.append(odd.symbol)
        odd.update(bits)
        if bits.pos < 0:
            weights.append(even.symbol)
            break
        if len(weights) > 255:
            raise ValueError("zstd: more than 255 Huffman weights")
    if len(weights) > 255:
        raise ValueError("zstd: more than 255 Huffman weights")
    return _huf_table_from_weights(weights), pos + hb


def _huf_decode_stream(buf: bytes, table, n_out: int) -> bytearray:
    sym_tab, len_tab, max_bits = table
    bits = _BackBits(buf)
    out = bytearray()
    while len(out) < n_out:
        idx = bits.read(max_bits)
        if bits.pos < -max_bits:
            raise ValueError("zstd: Huffman literal stream overread")
        nb = len_tab[idx]
        if nb == 0:
            raise ValueError("zstd: invalid Huffman code")
        bits.pos += max_bits - nb  # consumed only nb of the peek
        out.append(sym_tab[idx])
    return out


# ---------------------------------------------------------------------------
# Sequences: predefined distributions and code tables (RFC §3.1.1.3.2)
# ---------------------------------------------------------------------------

#: literal-length codes: code -> (baseline, nbits). Codes 0-15 are
#: literal values; the rest is the RFC's printed table.
_LL_EXTRA = [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9),
    (1024, 10), (2048, 11), (4096, 12), (8192, 13), (16384, 14),
    (32768, 15), (65536, 16),
]


def _ll_value(code: int, bits: "_BackBits") -> int:
    if code < 16:
        return code
    base, nb = _LL_EXTRA[code - 16]
    return base + bits.read(nb)


#: match-length codes: 0-31 -> code+3; the rest printed.
_ML_EXTRA = [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]


def _ml_value(code: int, bits: "_BackBits") -> int:
    if code < 32:
        return code + 3
    base, nb = _ML_EXTRA[code - 32]
    return base + bits.read(nb)


#: RFC 8878 predefined FSE distributions (normalized counts; -1 =
#: "less than one"). Each must sum to 2^accuracy_log counting -1 as
#: one slot — asserted below, and any mis-vendoring breaks the
#: real-zstd cross-checks in tests/test_zstd.py.
_LL_DEFAULT = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1], 6)
_ML_DEFAULT = ([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                -1, -1, -1, -1, -1], 6)
_OF_DEFAULT = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], 5)

for _norm, _al in (_LL_DEFAULT, _ML_DEFAULT, _OF_DEFAULT):
    assert sum(1 if c == -1 else c for c in _norm) == (1 << _al), (
        "zstd: predefined FSE distribution does not sum to table size"
    )
del _norm, _al

_MAX_SYMBOL = {"ll": 35, "of": 31, "ml": 52}
_MAX_ACCURACY = {"ll": 9, "of": 8, "ml": 9}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}


def _seq_table(kind: str, mode: int, buf: bytes, pos: int, prev):
    """One sequence-section table per the 2-bit compression mode:
    0 predefined, 1 RLE (one byte), 2 FSE-compressed, 3 repeat."""
    if mode == 0:
        norm, al = _DEFAULTS[kind]
        return (_fse_build(norm, al), al), pos
    if mode == 1:
        sym = buf[pos]
        if sym > _MAX_SYMBOL[kind]:
            raise ValueError(f"zstd: RLE {kind} symbol {sym} out of "
                             "range")
        # a 0-bit FSE table pinned to one symbol
        return (([sym], [0], [0]), 0), pos + 1
    if mode == 2:
        norm, al, pos = _fse_read_norm(
            buf, pos, _MAX_SYMBOL[kind], _MAX_ACCURACY[kind]
        )
        return (_fse_build(norm, al), al), pos
    if prev is None:
        raise ValueError(f"zstd: repeat mode for {kind} with no "
                         "previous table")
    return prev, pos


# ---------------------------------------------------------------------------
# Literals section
# ---------------------------------------------------------------------------


def _decode_literals(block: bytes, pos: int, prev_huf):
    """Returns (literals, new position, huffman table for reuse)."""
    b0 = block[pos]
    lit_type = b0 & 3
    size_format = (b0 >> 2) & 3
    if lit_type in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_format == 1:
            regen = (b0 >> 4) | (block[pos + 1] << 4)
            pos += 2
        else:
            regen = ((b0 >> 4) | (block[pos + 1] << 4)
                     | (block[pos + 2] << 12))
            pos += 3
        if lit_type == 0:
            lit = block[pos : pos + regen]
            if len(lit) < regen:
                raise ValueError("zstd: truncated raw literals")
            return bytearray(lit), pos + regen, prev_huf
        return bytearray([block[pos]] * regen), pos + 1, prev_huf
    # compressed (2) / treeless (3)
    if size_format == 0:
        streams = 1
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif size_format == 1:
        streams = 4
        regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
        comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
        pos += 3
    elif size_format == 2:
        streams = 4
        regen = ((b0 >> 4) | (block[pos + 1] << 4)
                 | ((block[pos + 2] & 3) << 12))
        comp = ((block[pos + 2] >> 2) | (block[pos + 3] << 6))
        pos += 4
    else:
        streams = 4
        regen = ((b0 >> 4) | (block[pos + 1] << 4)
                 | ((block[pos + 2] & 0x3F) << 12))
        comp = ((block[pos + 2] >> 6) | (block[pos + 3] << 2)
                | (block[pos + 4] << 10))
        pos += 5
    section = block[pos : pos + comp]
    if len(section) < comp:
        raise ValueError("zstd: truncated compressed literals")
    pos += comp
    spos = 0
    if lit_type == 2:
        huf, spos = _read_huffman_table(section, 0)
    else:
        if prev_huf is None:
            raise ValueError("zstd: treeless literals with no "
                             "previous Huffman table")
        huf = prev_huf
    if streams == 1:
        lit = _huf_decode_stream(section[spos:], huf, regen)
    else:
        if comp - spos < 6:
            raise ValueError("zstd: 4-stream literals too short for "
                             "jump table")
        s1 = int.from_bytes(section[spos : spos + 2], "little")
        s2 = int.from_bytes(section[spos + 2 : spos + 4], "little")
        s3 = int.from_bytes(section[spos + 4 : spos + 6], "little")
        spos += 6
        total = comp - spos
        s4 = total - s1 - s2 - s3
        if s4 <= 0:
            raise ValueError("zstd: 4-stream jump table inconsistent")
        each = (regen + 3) // 4
        lit = bytearray()
        off = spos
        for i, sl in enumerate((s1, s2, s3, s4)):
            want = each if i < 3 else regen - 3 * each
            if want < 0:
                raise ValueError("zstd: 4-stream sizes inconsistent")
            lit += _huf_decode_stream(
                section[off : off + sl], huf, want
            )
            off += sl
    if len(lit) != regen:
        raise ValueError("zstd: literals size mismatch")
    return lit, pos, huf


# ---------------------------------------------------------------------------
# Compressed block
# ---------------------------------------------------------------------------


def _decode_block(block: bytes, out: bytearray, state: dict) -> None:
    lit, pos, huf = _decode_literals(block, 0, state["huf"])
    state["huf"] = huf

    # number of sequences
    b0 = block[pos]
    pos += 1
    if b0 == 0:
        nseq = 0
    elif b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + block[pos]
        pos += 1
    else:
        nseq = int.from_bytes(block[pos : pos + 2], "little") + 0x7F00
        pos += 2
    if nseq == 0:
        out += lit
        return

    modes = block[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence-mode bits set")
    (ll_t, ll_al), pos = _seq_table(
        "ll", (modes >> 6) & 3, block, pos, state["ll"]
    )
    (of_t, of_al), pos = _seq_table(
        "of", (modes >> 4) & 3, block, pos, state["of"]
    )
    (ml_t, ml_al), pos = _seq_table(
        "ml", (modes >> 2) & 3, block, pos, state["ml"]
    )
    state["ll"], state["of"], state["ml"] = (
        (ll_t, ll_al), (of_t, of_al), (ml_t, ml_al),
    )

    bits = _BackBits(block[pos:])
    ll_s = _FseState(ll_t, bits, ll_al)
    of_s = _FseState(of_t, bits, of_al)
    ml_s = _FseState(ml_t, bits, ml_al)

    lit_pos = 0
    rep = state["rep"]
    for i in range(nseq):
        of_code = of_s.symbol
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_value = (1 << of_code) + bits.read(of_code)
        ml = _ml_value(ml_s.symbol, bits)
        ll = _ll_value(ll_s.symbol, bits)
        if offset_value > 3:
            offset = offset_value - 3
            rep[:] = [offset, rep[0], rep[1]]
        else:
            # repeat offsets; literal_length 0 shifts the index by one
            ov = offset_value + (1 if ll == 0 else 0)
            if ov == 1:
                offset = rep[0]
            elif ov == 2:
                offset = rep[1]
                rep[:] = [offset, rep[0], rep[2]]
            elif ov == 3:
                offset = rep[2]
                rep[:] = [offset, rep[0], rep[1]]
            else:  # ov == 4: repeat1 - 1
                offset = rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                rep[:] = [offset, rep[0], rep[1]]
        if i + 1 < nseq:
            ll_s.update(bits)
            ml_s.update(bits)
            of_s.update(bits)
        out += lit[lit_pos : lit_pos + ll]
        if lit_pos + ll > len(lit):
            raise ValueError("zstd: sequence literals overrun")
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond history")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:  # overlapping copy
            start = len(out) - offset
            for j in range(ml):
                out.append(out[start + j])
    out += lit[lit_pos:]


# ---------------------------------------------------------------------------
# xxHash64 (RFC 8878 Annex A) for the content checksum
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M64


def xxh64(buf: bytes, seed: int = 0) -> int:
    n = len(buf)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(buf[i + 8 * k : i + 8 * k + 8],
                                      "little")
                v = _rotl((v + lane * _P2) & _M64, 31) * _P1 & _M64
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ (_rotl((v * _P2) & _M64, 31) * _P1 & _M64))
                 * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(buf[i : i + 8], "little")
        h ^= _rotl((lane * _P2) & _M64, 31) * _P1 & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= int.from_bytes(buf[i : i + 4], "little") * _P1 & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= buf[i] * _P5 & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------------
# Frame
# ---------------------------------------------------------------------------


def decode_zstd(buf: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Decode ONE zstd frame starting at ``pos``; returns (content,
    position after the frame). Skippable frames are skipped."""
    while True:
        if pos + 4 > len(buf):
            raise ValueError("zstd: truncated magic")
        magic = int.from_bytes(buf[pos : pos + 4], "little")
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            pos += 8 + size
            continue
        break
    if magic != _MAGIC:
        raise ValueError(f"zstd: bad magic {magic:#x}")
    pos += 4
    fhd = buf[pos]
    pos += 1
    dict_flag = fhd & 3
    checksum = bool(fhd & 4)
    if fhd & 8:
        raise ValueError("zstd: reserved frame-header bit set")
    single_segment = bool(fhd & 0x20)
    fcs_flag = fhd >> 6
    if not single_segment:
        pos += 1  # window descriptor: bounded by content size here
    if dict_flag:
        nd = {1: 1, 2: 2, 3: 4}[dict_flag]
        did = int.from_bytes(buf[pos : pos + nd], "little")
        pos += nd
        if did:
            raise NotImplementedError(
                f"zstd: dictionary {did} unsupported (dictionary-less "
                "frames only)"
            )
    fcs = None
    nf = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
    if nf:
        fcs = int.from_bytes(buf[pos : pos + nf], "little")
        if nf == 2:
            fcs += 256
        pos += nf

    out = bytearray()
    state = {"huf": None, "ll": None, "of": None, "ml": None,
             "rep": [1, 4, 8]}
    while True:
        if pos + 3 > len(buf):
            raise ValueError("zstd: truncated block header")
        bh = int.from_bytes(buf[pos : pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:
            chunk = buf[pos : pos + bsize]
            if len(chunk) < bsize:
                raise ValueError("zstd: truncated raw block")
            out += chunk
            pos += bsize
        elif btype == 1:
            out += bytes([buf[pos]]) * bsize
            pos += 1
        elif btype == 2:
            block = buf[pos : pos + bsize]
            if len(block) < bsize:
                raise ValueError("zstd: truncated compressed block")
            _decode_block(block, out, state)
            pos += bsize
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if fcs is not None and len(out) != fcs:
        raise ValueError(
            f"zstd: decoded {len(out)} bytes, frame header says {fcs}"
        )
    if checksum:
        stored = int.from_bytes(buf[pos : pos + 4], "little")
        pos += 4
        if (xxh64(bytes(out)) & 0xFFFFFFFF) != stored:
            raise ValueError("zstd: content checksum mismatch")
    return bytes(out), pos


def zstd_decompress(buf: bytes, expected: int | None = None) -> bytes:
    """Decode a (possibly multi-frame) zstd payload to completion.
    ``expected`` None skips the exact-size check (ORC's chunk framing
    carries no decompressed size; parquet page headers do). Skippable
    frames are legal ANYWHERE, including trailing — skipped here so a
    payload ending in one still decodes."""
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if pos + 8 <= len(buf):
            magic = int.from_bytes(buf[pos : pos + 4], "little")
            if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
                size = int.from_bytes(buf[pos + 4 : pos + 8],
                                      "little")
                pos += 8 + size
                if pos > len(buf):
                    raise ValueError(
                        "zstd: truncated skippable frame"
                    )
                continue
        content, pos = decode_zstd(buf, pos)
        out += content
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"zstd: decoded {len(out)} bytes, caller expected "
            f"{expected}"
        )
    return bytes(out)
