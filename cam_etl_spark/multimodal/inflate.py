"""DEFLATE / zlib / gzip decompression from spec (RFC 1951 / 1950 /
1952) — a pure from-first-principles inflater.

Unlike the audio/video codecs, NOTHING here is a vendored printed
table: the fixed-Huffman code lengths, the length/distance base+extra
progressions, and the code-length-alphabet permutation are all given
in closed form by RFC 1951 §3.2.5-3.2.7, canonical Huffman codes are
CONSTRUCTED from code lengths (§3.2.2), and CRC-32 / Adler-32 are
defined by their polynomials. That also means verification can be far
stronger than self-round-trip: tests and the catalog fixture compress
with CPython's zlib (an independent reference implementation) and
assert OUR decoder reproduces the original bytes for stored, fixed-
Huffman (Z_FIXED) and dynamic-Huffman streams.

Why it's in the engine: training-data corpora ship gzip/zlib-wrapped
text and JSON everywhere; a 100 TB pipeline decompresses in the same
Arrow mapInPandas pass that does language-ID and quality scoring, so
the decode must be a per-row library function, not a driver-side step.

Boundaries (loud, never mis-decoded): preset dictionaries
(zlib FDICT) raise NotImplementedError; every integrity failure —
BTYPE 3, stored-block LEN/NLEN mismatch, over-subscribed or invalid
Huffman code, distance reaching before stream start, bad Adler-32 /
CRC-32 / ISIZE, trailing garbage — raises ValueError naming the check.

Reference parity: the reference repo (cam-etl) reads plain files only;
this extends the engine's source surface (SURVEY.md §2.1/§2.8).
"""

from __future__ import annotations

# --- RFC 1951 §3.2.5: length codes 257-285 ---------------------------------
_LEN_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
]
_LEN_EXTRA = [
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0,
]
# --- distance codes 0-29 ----------------------------------------------------
_DIST_BASE = [
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073,
    4097, 6145, 8193, 12289, 16385, 24577,
]
_DIST_EXTRA = [
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13,
]
# --- §3.2.7: order the code-length code lengths are transmitted in ----------
_CLC_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15]


class _LSBReader:
    """DEFLATE packs bits LSB-first within each byte (RFC 1951 §3.1.1);
    Huffman codes are then read most-significant-code-bit first, which
    with this packing means accumulating one stream bit at a time."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        while self._n < n:
            if self.pos >= len(self.buf):
                raise ValueError("inflate: truncated stream")
            self._acc |= self.buf[self.pos] << self._n
            self.pos += 1
            self._n += 8
        v = self._acc & ((1 << n) - 1)
        self._acc >>= n
        self._n -= n
        return v

    def align_byte(self) -> None:
        self._acc = 0
        self._n = 0


class _Huffman:
    """Canonical Huffman decoder built from code lengths (§3.2.2)."""

    def __init__(self, lengths: list[int]) -> None:
        maxlen = max(lengths) if lengths else 0
        if maxlen == 0:
            raise ValueError("inflate: empty Huffman alphabet")
        bl_count = [0] * (maxlen + 1)
        for ln in lengths:
            if ln:
                bl_count[ln] += 1
        # completeness check: Kraft sum must not over-subscribe
        kraft = sum(bl_count[ln] << (maxlen - ln) for ln in range(1, maxlen + 1))
        if kraft > (1 << maxlen):
            raise ValueError("inflate: over-subscribed Huffman code")
        code = 0
        next_code = [0] * (maxlen + 1)
        for ln in range(1, maxlen + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        # first_code/first_sym per length for range-based decode
        self.maxlen = maxlen
        self.first_code = [0] * (maxlen + 1)
        self.count = bl_count
        self.syms_by_len: list[list[int]] = [[] for _ in range(maxlen + 1)]
        codes = list(next_code)
        for sym, ln in enumerate(lengths):
            if ln:
                if not self.syms_by_len[ln]:
                    self.first_code[ln] = codes[ln]
                self.syms_by_len[ln].append(sym)
                codes[ln] += 1

    def decode(self, r: _LSBReader) -> int:
        code = 0
        for ln in range(1, self.maxlen + 1):
            code = (code << 1) | r.bits(1)
            n = self.count[ln]
            if n and code - self.first_code[ln] < n:
                return self.syms_by_len[ln][code - self.first_code[ln]]
        raise ValueError("inflate: invalid Huffman code")


def _fixed_litlen() -> _Huffman:
    # §3.2.6 — closed-form fixed code lengths
    lengths = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
    return _Huffman(lengths)


def _fixed_dist() -> _Huffman:
    return _Huffman([5] * 30)


def inflate(data: bytes, start: int = 0) -> tuple[bytes, dict]:
    """Raw-DEFLATE decode starting at byte offset ``start``. Returns
    (decompressed bytes, meta) where meta records per-type block counts
    and the byte position one past the final block."""
    r = _LSBReader(data)
    r.pos = start
    out = bytearray()
    blocks = {"stored": 0, "fixed": 0, "dynamic": 0}
    fixed_ll = fixed_d = None
    while True:
        bfinal = r.bits(1)
        btype = r.bits(2)
        if btype == 0b00:
            blocks["stored"] += 1
            r.align_byte()
            if r.pos + 4 > len(data):
                raise ValueError("inflate: truncated stored-block header")
            ln = data[r.pos] | data[r.pos + 1] << 8
            nlen = data[r.pos + 2] | data[r.pos + 3] << 8
            if ln ^ nlen != 0xFFFF:
                raise ValueError("inflate: stored-block LEN/NLEN mismatch")
            r.pos += 4
            if r.pos + ln > len(data):
                raise ValueError("inflate: truncated stored block")
            out += data[r.pos : r.pos + ln]
            r.pos += ln
        elif btype in (0b01, 0b10):
            if btype == 0b01:
                blocks["fixed"] += 1
                if fixed_ll is None:
                    fixed_ll, fixed_d = _fixed_litlen(), _fixed_dist()
                litlen, dist = fixed_ll, fixed_d
            else:
                blocks["dynamic"] += 1
                hlit = r.bits(5) + 257
                hdist = r.bits(5) + 1
                hclen = r.bits(4) + 4
                clc_len = [0] * 19
                for i in range(hclen):
                    clc_len[_CLC_ORDER[i]] = r.bits(3)
                clc = _Huffman(clc_len)
                lens: list[int] = []
                while len(lens) < hlit + hdist:
                    sym = clc.decode(r)
                    if sym < 16:
                        lens.append(sym)
                    elif sym == 16:
                        if not lens:
                            raise ValueError("inflate: repeat with no prior")
                        lens += [lens[-1]] * (3 + r.bits(2))
                    elif sym == 17:
                        lens += [0] * (3 + r.bits(3))
                    else:
                        lens += [0] * (11 + r.bits(7))
                if len(lens) != hlit + hdist:
                    raise ValueError("inflate: code-length overrun")
                litlen = _Huffman(lens[:hlit])
                dist = _Huffman(lens[hlit:]) if any(lens[hlit:]) else None
            while True:
                sym = litlen.decode(r)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"inflate: bad length code {sym}")
                    i = sym - 257
                    length = _LEN_BASE[i] + r.bits(_LEN_EXTRA[i])
                    if dist is None:
                        raise ValueError("inflate: match with no dist code")
                    dsym = dist.decode(r)
                    if dsym > 29:
                        raise ValueError(f"inflate: bad distance code {dsym}")
                    d = _DIST_BASE[dsym] + r.bits(_DIST_EXTRA[dsym])
                    if d > len(out):
                        raise ValueError("inflate: distance before start")
                    for _ in range(length):
                        out.append(out[-d])
        else:
            raise ValueError("inflate: reserved BTYPE 3")
        if bfinal:
            break
    # bit position rounds up to the next byte for container trailers
    end = r.pos  # _LSBReader consumed whole bytes into _acc already
    end -= r._n // 8  # return unconsumed whole bytes
    return bytes(out), {"blocks": blocks, "end": end}


# ---------------------------------------------------------------------------
# Checksums (defined by polynomial / modulus — no tables vendored;
# the CRC table is DERIVED at import from poly 0xEDB88320)
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def adler32(data: bytes) -> int:
    s1, s2 = 1, 0
    for b in data:
        s1 = (s1 + b) % 65521
        s2 = (s2 + s1) % 65521
    return (s2 << 16) | s1


# ---------------------------------------------------------------------------
# Containers
# ---------------------------------------------------------------------------


def zlib_decompress(data: bytes) -> tuple[bytes, dict]:
    """RFC 1950: CMF/FLG header, raw deflate, Adler-32 trailer."""
    if len(data) < 6:
        raise ValueError("zlib: stream too short")
    cmf, flg = data[0], data[1]
    if (cmf << 8 | flg) % 31 != 0:
        raise ValueError("zlib: FCHECK failed")
    if cmf & 0x0F != 8:
        raise ValueError(f"zlib: unsupported CM {cmf & 0x0F}")
    if flg & 0x20:
        raise NotImplementedError("zlib: preset dictionary (FDICT)")
    out, meta = inflate(data, 2)
    end = meta["end"]
    if end + 4 > len(data):
        raise ValueError("zlib: missing Adler-32 trailer")
    want = int.from_bytes(data[end : end + 4], "big")
    got = adler32(out)
    if want != got:
        raise ValueError(f"zlib: Adler-32 mismatch {want:08x} != {got:08x}")
    if end + 4 != len(data):
        raise ValueError("zlib: trailing garbage after stream")
    meta["window_log2"] = (cmf >> 4) + 8
    return out, meta


def gzip_decompress(data: bytes) -> tuple[bytes, dict]:
    """RFC 1952, incl. FEXTRA/FNAME/FCOMMENT/FHCRC fields and
    multi-member concatenation (members decode back-to-back)."""
    pos = 0
    out = bytearray()
    members = []
    while pos < len(data):
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("gzip: bad magic")
        if data[pos + 2] != 8:
            raise ValueError(f"gzip: unsupported CM {data[pos + 2]}")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError("gzip: reserved FLG bits set")
        mtime = int.from_bytes(data[pos + 4 : pos + 8], "little")
        m: dict = {"mtime": mtime, "os": data[pos + 9]}
        p = pos + 10
        if flg & 0x04:  # FEXTRA
            if p + 2 > len(data):
                raise ValueError("gzip: truncated FEXTRA")
            xlen = int.from_bytes(data[p : p + 2], "little")
            if p + 2 + xlen > len(data):
                raise ValueError("gzip: truncated FEXTRA")
            m["extra"] = data[p + 2 : p + 2 + xlen]
            p += 2 + xlen
        for flag, key in ((0x08, "name"), (0x10, "comment")):
            if flg & flag:
                z = data.index(b"\x00", p)
                m[key] = data[p:z].decode("latin-1")
                p = z + 1
        if flg & 0x02:  # FHCRC
            want = int.from_bytes(data[p : p + 2], "little")
            got = crc32(data[pos:p]) & 0xFFFF
            if want != got:
                raise ValueError("gzip: header CRC16 mismatch")
            p += 2
        payload, meta = inflate(data, p)
        end = meta["end"]
        if end + 8 > len(data):
            raise ValueError("gzip: missing CRC32/ISIZE trailer")
        want_crc = int.from_bytes(data[end : end + 4], "little")
        got_crc = crc32(payload)
        if want_crc != got_crc:
            raise ValueError(
                f"gzip: CRC-32 mismatch {want_crc:08x} != {got_crc:08x}"
            )
        isize = int.from_bytes(data[end + 4 : end + 8], "little")
        if isize != len(payload) % (1 << 32):
            raise ValueError("gzip: ISIZE mismatch")
        m["blocks"] = meta["blocks"]
        m["out_size"] = len(payload)
        members.append(m)
        out += payload
        pos = end + 8
    if not members:
        raise ValueError("gzip: empty input")
    return bytes(out), {"members": members}
