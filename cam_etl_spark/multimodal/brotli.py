"""Brotli decompression from spec (RFC 7932) — pure from-first-
principles decoder for the parquet BROTLI page codec.

The ALGORITHM here — window-bits header, meta-block framing, simple
and complex prefix-code loading, context modeling, the insert-and-copy
command alphabet, distance ring buffer, and static-dictionary word
transforms — is written from RFC 7932 alone: every base/extra-bits
progression below is the RFC's own closed-form table (sections 4, 5,
6, 9), and canonical prefix codes are constructed from code lengths
exactly as in the sibling inflate.py (DEFLATE shares the convention:
LSB-first bit packing, codes read most-significant-code-bit first).

The static DATA the format carries — the 122,784-byte dictionary
(Appendix A), the 121 word transforms (Appendix B), and the UTF-8 /
signed context lookup tables (section 7.1) — is spec content, not
algorithm, and hand-transcribing 120 KB is exactly the silently-
wrong-table risk that kept the MP3 ESC tables declined. Unlike MP3,
this container has bit-exact referees: the tables are extracted once
from the system brotli's public API / image by
tools/extract_brotli_tables.py (structural gates documented there)
and vendored as brotli_dictionary.bin / brotli_transforms.py, and
tests/test_brotli.py cross-checks every decode — including
dictionary-transform-heavy text at quality 11 — against pyarrow's
independent brotli codec.

Why it's in the engine: parquet's BROTLI codec is the last page codec
the from-spec parquet reader (sources/parquet_pages.py) could not
decode; real BROTLI parquet exists in the wild and pyarrow writes it
in-container, so `s59_parquet_brotli_decode` reads real-writer files.

Boundaries (loud, never mis-decoded): the large-window extension
(WBITS > 24, not part of RFC 7932) raises NotImplementedError; every
integrity failure — reserved bits, non-minimal MLEN/MSKIPLEN,
over/under-subscribed prefix codes, duplicate simple-code symbols,
context-map overrun, distance before stream start, invalid dictionary
length or transform id, trailing garbage — raises ValueError naming
the check.

Reference parity: the reference repo (cam-etl) reads plain files only;
this extends the engine's source surface (SURVEY.md §2.1/§2.8).
"""

from __future__ import annotations

import os

from cam_etl_spark.multimodal.brotli_transforms import (
    CONTEXT_SIGNED,
    CONTEXT_UTF8_P1,
    CONTEXT_UTF8_P2,
    TRANSFORMS,
)

# --- RFC 7932 section 8: static dictionary geometry -------------------------
_NDBITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8,
           7, 7, 8, 7, 7, 6, 6, 5, 5]
_DICT_OFFSET = [0] * 25
for _l in range(4, 24):
    _DICT_OFFSET[_l + 1] = _DICT_OFFSET[_l] + (_l << _NDBITS[_l])

_DICT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "brotli_dictionary.bin")
_DICTIONARY: bytes | None = None


def _dictionary() -> bytes:
    global _DICTIONARY
    if _DICTIONARY is None:
        data = open(_DICT_PATH, "rb").read()
        if len(data) != 122_784:
            raise ValueError(
                f"brotli: vendored dictionary is {len(data)} bytes, "
                "RFC 7932 Appendix A says 122784"
            )
        _DICTIONARY = data
    return _DICTIONARY


# --- RFC 7932 section 5: insert/copy length code progressions ---------------
_INSERT_BASE = [0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66,
                98, 130, 194, 322, 578, 1090, 2114, 6210, 22594]
_INSERT_EXTRA = [0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                 6, 7, 8, 9, 10, 12, 14, 24]
_COPY_BASE = [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38,
              54, 70, 102, 134, 198, 326, 582, 1094, 2118]
_COPY_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
               5, 5, 6, 7, 8, 9, 10, 24]
# cell -> (insert high row, copy high row, implicit last distance);
# the 704-symbol alphabet is 11 cells of 64 (section 5's table)
_CMD_CELLS = [
    (0, 0, True), (0, 1, True),
    (0, 0, False), (0, 1, False), (1, 0, False), (1, 1, False),
    (0, 2, False), (2, 0, False), (1, 2, False), (2, 1, False),
    (2, 2, False),
]

# --- RFC 7932 section 6: block count code progression (26 codes) ------------
_BLKCNT_BASE = [1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113,
                145, 177, 209, 241, 305, 369, 497, 753, 1265, 2289,
                4337, 8433, 16625]
_BLKCNT_EXTRA = [2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
                 6, 6, 7, 8, 9, 10, 11, 12, 13, 24]

# --- RFC 7932 section 3.5: the fixed code for code-length code lengths ------
# 4-bit LSB-first lookup of (symbol, bits consumed); the underlying
# code is {0:'00', 3:'01', 4:'10', 2:'110', 1:'1110', 5:'1111'}
_CLC_VALUE = [0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5]
_CLC_LENGTH = [2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4]
# order the code-length code lengths are transmitted in
_CLC_ORDER = [1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


class _BitReader:
    """LSB-first within each byte (RFC 7932 section 2); prefix codes
    are then read one stream bit at a time, most significant code bit
    first — same convention as DEFLATE."""

    __slots__ = ("buf", "bitpos", "nbits")

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.bitpos = 0
        self.nbits = 8 * len(buf)

    def bits(self, n: int) -> int:
        p = self.bitpos
        if p + n > self.nbits:
            raise ValueError("brotli: truncated stream")
        self.bitpos = p + n
        v = int.from_bytes(
            self.buf[p >> 3: (p + n + 7) >> 3], "little")
        return (v >> (p & 7)) & ((1 << n) - 1)

    def bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            raise ValueError("brotli: truncated stream")
        self.bitpos = p + 1
        return (self.buf[p >> 3] >> (p & 7)) & 1

    def align(self) -> None:
        pad = -self.bitpos % 8
        if pad and self.bits(pad):
            raise ValueError("brotli: non-zero padding before "
                             "byte-aligned data")

    def take_bytes(self, n: int) -> bytes:
        if self.bitpos % 8:
            raise ValueError("brotli: unaligned byte read")
        start = self.bitpos >> 3
        if start + n > len(self.buf):
            raise ValueError("brotli: truncated uncompressed block")
        self.bitpos += 8 * n
        return self.buf[start: start + n]


class _Prefix:
    """Canonical prefix code from per-symbol code lengths, or a
    zero-bit single-symbol code."""

    __slots__ = ("single", "maxlen", "count", "first_code",
                 "syms_by_len")

    def __init__(self, lengths: dict[int, int] | None = None,
                 single: int | None = None) -> None:
        self.single = single
        if single is not None:
            return
        assert lengths
        maxlen = max(lengths.values())
        self.maxlen = maxlen
        self.count = [0] * (maxlen + 1)
        for ln in lengths.values():
            self.count[ln] += 1
        kraft = sum(self.count[ln] << (maxlen - ln)
                    for ln in range(1, maxlen + 1))
        if kraft != (1 << maxlen):
            raise ValueError("brotli: prefix code not exactly "
                             "subscribed")
        code = 0
        next_code = [0] * (maxlen + 2)
        for ln in range(1, maxlen + 1):
            code = (code + self.count[ln - 1]) << 1
            next_code[ln] = code
        self.first_code = list(next_code)
        self.syms_by_len: list[list[int]] = [[] for _ in
                                             range(maxlen + 1)]
        # canonical order: (length, symbol value)
        for sym in sorted(lengths):
            self.syms_by_len[lengths[sym]].append(sym)

    def decode(self, r: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | r.bit()
            n = self.count[ln]
            if n and code - self.first_code[ln] < n:
                return self.syms_by_len[ln][code - self.first_code[ln]]
        raise ValueError("brotli: invalid prefix code word")


def _read_prefix_code(r: _BitReader, alphabet_size: int) -> _Prefix:
    """RFC 7932 sections 3.4/3.5: 2-bit HSKIP selector; value 1 is a
    simple code over 1-4 explicit symbols, other values load a
    complex code with HSKIP leading code-length-code entries
    skipped."""
    hskip = r.bits(2)
    if hskip == 1:
        nsym = r.bits(2) + 1
        abits = max(1, (alphabet_size - 1).bit_length())
        syms = [r.bits(abits) for _ in range(nsym)]
        if any(s >= alphabet_size for s in syms):
            raise ValueError("brotli: simple-code symbol outside "
                             "alphabet")
        if len(set(syms)) != nsym:
            raise ValueError("brotli: duplicate simple-code symbol")
        if nsym == 1:
            return _Prefix(single=syms[0])
        if nsym == 2:
            syms.sort()
            return _Prefix({syms[0]: 1, syms[1]: 1})
        if nsym == 3:
            a, b, c = syms[0], *sorted(syms[1:])
            return _Prefix({a: 1, b: 2, c: 2})
        if r.bit():  # tree-select: depths 1,2,3,3
            a, b = syms[0], syms[1]
            c, d = sorted(syms[2:])
            return _Prefix({a: 1, b: 2, c: 3, d: 3})
        syms.sort()
        return _Prefix({s: 2 for s in syms})

    # complex code: first the code-length code, via the fixed code
    clc_len: dict[int, int] = {}
    space = 0
    num = 0
    for sym in _CLC_ORDER[hskip:]:
        peek = 0
        p = r.bitpos
        avail = min(4, r.nbits - p)
        for i in range(avail):
            peek |= ((r.buf[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        ln = _CLC_LENGTH[peek]
        if ln > avail:
            raise ValueError("brotli: truncated stream")
        r.bitpos = p + ln
        v = _CLC_VALUE[peek]
        if v:
            clc_len[sym] = v
            space += 32 >> v
            num += 1
            if space >= 32:
                break
    if num == 0:
        raise ValueError("brotli: empty code-length code")
    if num > 1 and space != 32:
        raise ValueError("brotli: code-length code space "
                         f"{space} != 32")
    clc = (_Prefix(single=next(iter(clc_len))) if num == 1
           else _Prefix(clc_len))

    # then the symbol code lengths, with 16/17 repeat semantics
    lengths: dict[int, int] = {}
    space = 0
    sym = 0
    prev_nonzero = 8
    repeat = 0
    repeat_code = 0
    while sym < alphabet_size and space < 32768:
        c = clc.decode(r)
        if c < 16:
            repeat = 0
            if c:
                lengths[sym] = c
                prev_nonzero = c
                space += 32768 >> c
            sym += 1
        else:
            extra_bits = 2 if c == 16 else 3
            extra = r.bits(extra_bits)
            if repeat_code == c and repeat:
                old = repeat
                repeat = ((repeat - 2) << extra_bits) + 3 + extra
                delta = repeat - old
            else:
                repeat = 3 + extra
                delta = repeat
            repeat_code = c
            if sym + delta > alphabet_size:
                raise ValueError("brotli: code-length repeat overruns "
                                 "alphabet")
            if c == 16:
                for i in range(delta):
                    lengths[sym + i] = prev_nonzero
                space += delta * (32768 >> prev_nonzero)
            sym += delta
    if space > 32768:
        raise ValueError("brotli: over-subscribed prefix code")
    if len(lengths) == 1:
        return _Prefix(single=next(iter(lengths)))
    if space != 32768:
        raise ValueError("brotli: under-subscribed prefix code "
                         f"({space}/32768)")
    return _Prefix(lengths)


def _read_varlen_256(r: _BitReader) -> int:
    """NBLTYPES / NTREES count in 1..256 (RFC 7932 section 9.2):
    '0' -> 1, else 3-bit k then k extra bits -> 1 + (1 << k) + extra."""
    if not r.bit():
        return 1
    k = r.bits(3)
    return 1 + (1 << k) + r.bits(k)


def _read_context_map(r: _BitReader, n_trees: int, size: int) -> list:
    """RFC 7932 section 7.3: optional zero-run-length coding plus
    optional inverse move-to-front."""
    rlemax = (r.bits(4) + 1) if r.bit() else 0
    tree = _read_prefix_code(r, n_trees + rlemax)
    cmap = [0] * size
    i = 0
    while i < size:
        s = tree.decode(r)
        if s == 0:
            i += 1
        elif s <= rlemax:
            run = (1 << s) + r.bits(s)
            if i + run > size:
                raise ValueError("brotli: context-map zero run "
                                 "overruns map")
            i += run
        else:
            cmap[i] = s - rlemax
            i += 1
    if r.bit():  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf.pop(v)
            mtf.insert(0, val)
            cmap[i] = val
    if any(v >= n_trees for v in cmap):
        raise ValueError("brotli: context map entry outside tree "
                         "count")
    return cmap


def _read_wbits(r: _BitReader) -> int:
    """RFC 7932 section 9.1 WBITS code (10..24)."""
    if not r.bit():
        return 16
    n = r.bits(3)
    if n:
        return 17 + n
    n = r.bits(3)
    if n == 0:
        return 17
    if n == 1:
        raise NotImplementedError(
            "brotli: large-window stream (WBITS > 24 extension is "
            "outside RFC 7932)"
        )
    return 8 + n


def _ferment(word: bytearray, pos: int) -> int:
    """RFC 7932 section 8 uppercase step; returns bytes consumed."""
    c = word[pos]
    if c < 192:
        if 97 <= c <= 122:
            word[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(word):
            word[pos + 1] ^= 32
        return 2
    if pos + 2 < len(word):
        word[pos + 2] ^= 5
    return 3


def _transform_word(word: bytes, transform_id: int) -> bytes:
    prefix, op, suffix = TRANSFORMS[transform_id]
    w = bytearray(word)
    if 12 <= op <= 20:  # omit first 1..9
        w = w[op - 11:]
    elif 1 <= op <= 9:  # omit last 1..9
        w = w[: max(0, len(w) - op)] if op < len(w) else bytearray()
    elif op == 10:  # ferment first
        if w:
            _ferment(w, 0)
    elif op == 11:  # ferment all
        i = 0
        while i < len(w):
            i += _ferment(w, i)
    return prefix + bytes(w) + suffix


def brotli_decompress(buf: bytes, expected: int | None = None) -> bytes:
    """Decode one complete brotli stream (the parquet BROTLI page
    payload is exactly this). ``expected`` adds a final decoded-size
    integrity check when the caller knows it (parquet page headers
    do)."""
    r = _BitReader(buf)
    wbits = _read_wbits(r)
    max_backward = (1 << wbits) - 16
    out = bytearray()
    # section 4: ring initialized with 16, 15, 11, 4 — in write
    # order, so the MOST RECENT (what code 0 references) is 4
    dist_rb = [4, 11, 15, 16]  # most recent first

    while True:
        islast = r.bit()
        if islast and r.bit():  # ISLASTEMPTY
            break
        mn = r.bits(2)
        if mn == 3:  # metadata meta-block
            if islast:
                raise ValueError("brotli: metadata meta-block marked "
                                 "ISLAST")
            if r.bit():
                raise ValueError("brotli: reserved bit set")
            skip_bytes = r.bits(2)
            skiplen = 0
            if skip_bytes:
                v = r.bits(8 * skip_bytes)
                if skip_bytes > 1 and (v >> (8 * (skip_bytes - 1))) == 0:
                    raise ValueError("brotli: non-minimal MSKIPBYTES")
                skiplen = v + 1
            r.align()
            r.take_bytes(skiplen)
            continue
        mlen = r.bits(16 + 4 * mn) + 1
        if mn and ((mlen - 1) >> (4 * (3 + mn))) == 0:
            raise ValueError("brotli: non-minimal MNIBBLES")
        if not islast and r.bit():  # ISUNCOMPRESSED
            r.align()
            out += r.take_bytes(mlen)
            continue

        _decode_compressed_metablock(r, mlen, out, max_backward,
                                     dist_rb)
        if islast:
            break

    r.align()
    if r.bitpos != r.nbits:
        raise ValueError(
            f"brotli: {(r.nbits - r.bitpos) // 8} trailing bytes "
            "after final meta-block"
        )
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"brotli: decoded {len(out)} bytes, caller expected "
            f"{expected}"
        )
    return bytes(out)


def _decode_compressed_metablock(r, mlen, out, max_backward, dist_rb):
    # --- header: block types / counts per category (L, I, D) ---
    nbltypes = [0, 0, 0]
    bt_tree: list = [None, None, None]
    bc_tree: list = [None, None, None]
    bt_cur = [0, 0, 0]
    bt_prev = [1, 1, 1]
    bcount = [1 << 60, 1 << 60, 1 << 60]
    for c in range(3):
        nbltypes[c] = _read_varlen_256(r)
        if nbltypes[c] >= 2:
            bt_tree[c] = _read_prefix_code(r, nbltypes[c] + 2)
            bc_tree[c] = _read_prefix_code(r, 26)
            sym = bc_tree[c].decode(r)
            bcount[c] = _BLKCNT_BASE[sym] + r.bits(_BLKCNT_EXTRA[sym])

    def switch_block(c: int) -> None:
        sym = bt_tree[c].decode(r)
        if sym == 0:
            new = bt_prev[c]
        elif sym == 1:
            new = (bt_cur[c] + 1) % nbltypes[c]
        else:
            new = sym - 2
        bt_prev[c], bt_cur[c] = bt_cur[c], new
        s = bc_tree[c].decode(r)
        bcount[c] = _BLKCNT_BASE[s] + r.bits(_BLKCNT_EXTRA[s])

    npostfix = r.bits(2)
    ndirect = r.bits(4) << npostfix
    postfix_mask = (1 << npostfix) - 1
    ctx_modes = [r.bits(2) for _ in range(nbltypes[0])]
    ntreesl = _read_varlen_256(r)
    cmapl = (_read_context_map(r, ntreesl, 64 * nbltypes[0])
             if ntreesl >= 2 else [0] * (64 * nbltypes[0]))
    ntreesd = _read_varlen_256(r)
    cmapd = (_read_context_map(r, ntreesd, 4 * nbltypes[2])
             if ntreesd >= 2 else [0] * (4 * nbltypes[2]))
    htree_l = [_read_prefix_code(r, 256) for _ in range(ntreesl)]
    htree_i = [_read_prefix_code(r, 704) for _ in range(nbltypes[1])]
    dist_alphabet = 16 + ndirect + (48 << npostfix)
    htree_d = [_read_prefix_code(r, dist_alphabet)
               for _ in range(ntreesd)]

    # --- command loop ---
    remaining = mlen
    while remaining > 0:
        if bcount[1] == 0:
            switch_block(1)
        bcount[1] -= 1
        cmd = htree_i[bt_cur[1]].decode(r)
        cell, low = divmod(cmd, 64)
        ins_row, cpy_row, implicit = _CMD_CELLS[cell]
        ins_code = (ins_row << 3) + (low >> 3)
        cpy_code = (cpy_row << 3) + (low & 7)
        insert_len = _INSERT_BASE[ins_code] + r.bits(
            _INSERT_EXTRA[ins_code])
        copy_len = _COPY_BASE[cpy_code] + r.bits(_COPY_EXTRA[cpy_code])

        for _ in range(insert_len):
            if bcount[0] == 0:
                switch_block(0)
            bcount[0] -= 1
            mode = ctx_modes[bt_cur[0]]
            p1 = out[-1] if out else 0
            if mode == 0:
                ctx = p1 & 0x3F
            elif mode == 1:
                ctx = p1 >> 2
            else:
                p2 = out[-2] if len(out) >= 2 else 0
                if mode == 2:
                    ctx = CONTEXT_UTF8_P1[p1] | CONTEXT_UTF8_P2[p2]
                else:
                    ctx = (CONTEXT_SIGNED[p1] << 3) | CONTEXT_SIGNED[p2]
            tree = htree_l[cmapl[(bt_cur[0] << 6) + ctx]]
            out.append(tree.decode(r))
            remaining -= 1
        if remaining <= 0:
            if remaining < 0:
                raise ValueError("brotli: insert run overran MLEN")
            break

        max_distance = min(len(out), max_backward)
        if implicit:
            distance = dist_rb[0]
        else:
            if bcount[2] == 0:
                switch_block(2)
            bcount[2] -= 1
            dctx = min(copy_len - 2, 3)
            dcode = htree_d[cmapd[(bt_cur[2] << 2) + dctx]].decode(r)
            if dcode == 0:
                distance = dist_rb[0]
            elif dcode < 4:
                distance = dist_rb[dcode]
            elif dcode < 16:
                # short codes 4..15: +/- 1..3 around the last or
                # second-last distance (section 4's table)
                anchor = dist_rb[0] if dcode < 10 else dist_rb[1]
                k = dcode - (4 if dcode < 10 else 10)
                delta = (k >> 1) + 1
                distance = anchor + (delta if k & 1 else -delta)
                if distance <= 0:
                    raise ValueError("brotli: short distance code "
                                     "yields non-positive distance")
            elif dcode < 16 + ndirect:
                distance = dcode - 15
            else:
                d = dcode - ndirect - 16
                nbits = 1 + (d >> (npostfix + 1))
                extra = r.bits(nbits)
                hcode = d >> npostfix
                lcode = d & postfix_mask
                offset = ((2 + (hcode & 1)) << nbits) - 4
                distance = (((offset + extra) << npostfix) + lcode
                            + ndirect + 1)
            if dcode != 0 and distance <= max_distance:
                dist_rb.insert(0, distance)
                dist_rb.pop()

        if distance <= max_distance:
            if copy_len > remaining:
                raise ValueError("brotli: copy overruns MLEN")
            start = len(out) - distance
            for i in range(copy_len):
                out.append(out[start + i])
            remaining -= copy_len
        else:
            # static dictionary reference (section 8)
            if not 4 <= copy_len <= 24:
                raise ValueError(
                    f"brotli: dictionary word length {copy_len} "
                    "outside 4..24"
                )
            address = distance - max_distance - 1
            ndbits = _NDBITS[copy_len]
            word_id = address & ((1 << ndbits) - 1)
            transform_id = address >> ndbits
            if transform_id >= len(TRANSFORMS):
                raise ValueError(
                    f"brotli: transform id {transform_id} outside "
                    "RFC 7932 Appendix B's 121"
                )
            base = _DICT_OFFSET[copy_len] + word_id * copy_len
            word = _dictionary()[base: base + copy_len]
            piece = _transform_word(word, transform_id)
            if len(piece) > remaining:
                raise ValueError("brotli: dictionary word overruns "
                                 "MLEN")
            out += piece
            remaining -= len(piece)
