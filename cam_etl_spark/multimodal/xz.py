"""XZ / LZMA decoder (round 13) — from the public specifications
(the LZMA specification shipped with the LZMA SDK, and the
xz-file-format spec): the 11-bit-probability range decoder, the full
LZMA1 state machine (literal/match/rep contexts, position slots,
aligned distances, end marker), LZMA2 chunk framing (dict/state/props
resets, uncompressed chunks), the legacy ``.lzma`` (alone) container,
and the ``.xz`` container (stream flags, block headers, CRC32/CRC64/
SHA-256 integrity checks, index, footer, stream concatenation + padding).

With this module the engine decodes ``.xz`` corpus shards and Avro
``xz`` blocks with NO lzma library in the read path — the same
cross-format story as the zstd/brotli/bzip2 decoders.

Referee: stdlib ``lzma`` (the real liblzma) compresses every fixture
in tests/test_xz.py — presets 0-9, explicit (lc, lp, pb) filter
chains (exercising every literal-context shape), both containers,
every check type, multi-stream concatenation — and this decoder must
reproduce the exact bytes; tampered checks, bad magic, truncation,
and unsupported filters (delta, BCJ) are loud.

Boundaries (loud): filters other than LZMA2 in .xz (delta/BCJ raise),
dictionary sizes are accepted but not enforced as a window (the whole
output is in memory — shard-scale inputs by design).
"""

from __future__ import annotations

import struct

_PROB_INIT = 1024  # 2^11 / 2


class _RangeDecoder:
    """The LZMA binary range decoder (LzmaSpec: CRangeDecoder)."""

    def __init__(self, buf: bytes, pos: int):
        if pos + 5 > len(buf):
            raise ValueError("lzma: range-coder init truncated")
        if buf[pos] != 0:
            raise ValueError("lzma: first range-coded byte not 0")
        self.buf = buf
        self.code = int.from_bytes(buf[pos + 1: pos + 5], "big")
        self.range = 0xFFFFFFFF
        self.pos = pos + 5

    def _normalize(self):
        if self.range < (1 << 24):
            if self.pos >= len(self.buf):
                raise ValueError("lzma: compressed data truncated")
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8)
                         | self.buf[self.pos]) & 0xFFFFFFFF
            self.pos += 1

    def decode_bit(self, probs: dict, key) -> int:
        p = probs.get(key, _PROB_INIT)
        bound = (self.range >> 11) * p
        if self.code < bound:
            self.range = bound
            probs[key] = p + ((2048 - p) >> 5)
            bit = 0
        else:
            self.range -= bound
            self.code -= bound
            probs[key] = p - (p >> 5)
            bit = 1
        self._normalize()
        return bit

    def decode_direct(self, n: int) -> int:
        res = 0
        for _ in range(n):
            self.range >>= 1
            self.code = (self.code - self.range) & 0xFFFFFFFF
            t = 0 - (self.code >> 31)
            self.code = (self.code + (self.range & t)) & 0xFFFFFFFF
            self._normalize()
            res = (res << 1) + t + 1
        return res & 0xFFFFFFFF

    def bittree(self, probs: dict, group, nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) | self.decode_bit(probs, (group, m))
        return m - (1 << nbits)

    def bittree_rev(self, probs: dict, group, nbits: int) -> int:
        m = 1
        sym = 0
        for i in range(nbits):
            bit = self.decode_bit(probs, (group, m))
            m = (m << 1) | bit
            sym |= bit << i
        return sym


class _LzmaState:
    """Probability models + state that PERSIST across LZMA2 chunks
    (until a state-reset control)."""

    def __init__(self, lc: int, lp: int, pb: int):
        self.set_props(lc, lp, pb)
        self.reset_state()

    def set_props(self, lc: int, lp: int, pb: int):
        if lc > 8 or lp > 4 or pb > 4:
            raise ValueError(f"lzma: bad props lc={lc} lp={lp} pb={pb}")
        self.lc, self.lp, self.pb = lc, lp, pb

    def reset_state(self):
        self.probs: dict = {}
        self.state = 0
        self.reps = [0, 0, 0, 0]


def _decode_len(rc: _RangeDecoder, probs, which, pos_state) -> int:
    if rc.decode_bit(probs, (which, "choice")) == 0:
        return rc.bittree(probs, (which, "low", pos_state), 3)
    if rc.decode_bit(probs, (which, "choice2")) == 0:
        return 8 + rc.bittree(probs, (which, "mid", pos_state), 3)
    return 16 + rc.bittree(probs, (which, "high"), 8)


def _lzma_decode(rc: _RangeDecoder, st: _LzmaState, out: bytearray,
                 limit: int, dict_start: int,
                 expect_end_marker: bool) -> None:
    """Decode until ``len(out) == limit`` (or the end marker when
    ``limit`` is None-like huge and the stream self-terminates)."""
    probs = st.probs
    pb_mask = (1 << st.pb) - 1
    lp_mask = (1 << st.lp) - 1
    reps = st.reps
    while len(out) < limit:
        # positions are DICTIONARY-relative: a mid-stream dict reset
        # restarts the encoder's position contexts at 0, and the
        # decoder must mirror it or desynchronize
        rel = len(out) - dict_start
        pos_state = rel & pb_mask
        if rc.decode_bit(probs, ("is_match", st.state,
                                 pos_state)) == 0:
            prev = out[-1] if len(out) > dict_start else 0
            ctx = (((rel & lp_mask) << st.lc)
                   + (prev >> (8 - st.lc) if st.lc else 0))
            if st.state < 7:
                sym = 1
                while sym < 0x100:
                    sym = (sym << 1) | rc.decode_bit(
                        probs, ("lit", ctx, sym))
            else:
                if len(out) - dict_start <= reps[0]:
                    raise ValueError("lzma: matched literal before "
                                     "dictionary start")
                match_byte = out[len(out) - reps[0] - 1]
                sym = 1
                while sym < 0x100:
                    match_bit = (match_byte >> 7) & 1
                    match_byte = (match_byte << 1) & 0xFF
                    bit = rc.decode_bit(
                        probs,
                        ("lit", ctx, ((1 + match_bit) << 8) + sym))
                    sym = (sym << 1) | bit
                    if match_bit != bit:
                        while sym < 0x100:
                            sym = (sym << 1) | rc.decode_bit(
                                probs, ("lit", ctx, sym))
                        break
            out.append(sym & 0xFF)
            st.state = (0 if st.state < 4
                        else st.state - 3 if st.state < 10
                        else st.state - 6)
            continue
        if rc.decode_bit(probs, ("is_rep", st.state)):
            if len(out) == dict_start:
                raise ValueError("lzma: rep match at dictionary "
                                 "start")
            if rc.decode_bit(probs, ("is_rep_g0", st.state)) == 0:
                if rc.decode_bit(probs, ("is_rep0_long", st.state,
                                         pos_state)) == 0:
                    st.state = 9 if st.state < 7 else 11
                    if len(out) - dict_start <= reps[0]:
                        raise ValueError(
                            "lzma: short rep before dictionary")
                    out.append(out[len(out) - reps[0] - 1])
                    continue
                dist = reps[0]
            else:
                if rc.decode_bit(probs, ("is_rep_g1", st.state)) == 0:
                    dist = reps[1]
                else:
                    if rc.decode_bit(probs,
                                     ("is_rep_g2", st.state)) == 0:
                        dist = reps[2]
                    else:
                        dist = reps[3]
                        reps[3] = reps[2]
                    reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = dist
            length = 2 + _decode_len(rc, probs, "replen", pos_state)
            st.state = 8 if st.state < 7 else 11
        else:
            reps[3], reps[2], reps[1] = reps[2], reps[1], reps[0]
            length = 2 + _decode_len(rc, probs, "len", pos_state)
            st.state = 7 if st.state < 7 else 10
            len_state = min(length - 2, 3)
            slot = rc.bittree(probs, ("slot", len_state), 6)
            if slot < 4:
                dist = slot
            else:
                nd = (slot >> 1) - 1
                dist = (2 | (slot & 1)) << nd
                if slot < 14:
                    dist += rc.bittree_rev(
                        probs, ("spec", dist - slot), nd)
                else:
                    dist += rc.decode_direct(nd - 4) << 4
                    dist += rc.bittree_rev(probs, ("align",), 4)
                    if dist == 0xFFFFFFFF:  # end marker
                        if not expect_end_marker and len(out) < limit:
                            raise ValueError(
                                "lzma: unexpected end marker")
                        st.reps = reps
                        return
            reps[0] = dist
        if reps[0] >= len(out) - dict_start:
            raise ValueError(
                f"lzma: distance {reps[0] + 1} reaches before the "
                "dictionary start"
            )
        if len(out) + length > limit:
            raise ValueError("lzma: match overruns declared size")
        src = len(out) - reps[0] - 1
        for i in range(length):
            out.append(out[src + i])
    st.reps = reps


def lzma_alone_decompress(buf: bytes) -> bytes:
    """The legacy ``.lzma`` container: props byte, LE32 dict size,
    LE64 uncompressed size (all-FF = end-marker-terminated), raw
    LZMA1."""
    if len(buf) < 13:
        raise ValueError("lzma: alone header truncated")
    props = buf[0]
    if props >= 9 * 5 * 5:
        raise ValueError(f"lzma: bad props byte {props}")
    lc = props % 9
    lp = (props // 9) % 5
    pb = props // 45
    (usize,) = struct.unpack_from("<Q", buf, 5)
    st = _LzmaState(lc, lp, pb)
    rc = _RangeDecoder(buf, 13)
    out = bytearray()
    if usize == 0xFFFFFFFFFFFFFFFF:
        _lzma_decode(rc, st, out, 1 << 62, 0, True)
    else:
        _lzma_decode(rc, st, out, usize, 0, True)
        if len(out) != usize:
            raise ValueError(
                f"lzma: decoded {len(out)} of {usize} declared bytes"
            )
    return bytes(out)


def lzma2_decompress(buf: bytes) -> bytes:
    """LZMA2 chunk stream (the payload of xz's 0x21 filter)."""
    return bytes(_lzma2_stream(buf, 0)[1])


_CRC64_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = (_c >> 1) ^ (0xC96C5795D7870F42 if _c & 1 else 0)
    _CRC64_TABLE.append(_c)


def _crc64(data: bytes) -> int:
    crc = 0xFFFFFFFFFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ _CRC64_TABLE[(crc ^ byte) & 0xFF]
    return crc ^ 0xFFFFFFFFFFFFFFFF


def _vli(buf: bytes, pos: int) -> tuple[int, int]:
    """xz variable-length integer (little-endian base-128, ≤9 bytes)."""
    v = 0
    for i in range(9):
        if pos + i >= len(buf):
            raise ValueError("xz: VLI truncated")
        b = buf[pos + i]
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            if b == 0 and i > 0:
                raise ValueError("xz: non-minimal VLI")
            return v, pos + i + 1
    raise ValueError("xz: VLI longer than 9 bytes")


_XZ_MAGIC = b"\xfd7zXZ\x00"
_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}


def xz_decompress(buf: bytes) -> bytes:
    """Decompress .xz bytes (possibly multiple concatenated streams
    with padding): stream flags, block headers (LZMA2 filter only —
    delta/BCJ raise), per-block integrity checks (None/CRC32/CRC64/
    SHA-256), the index (count + per-block sizes cross-checked), and
    the footer (CRC'd backward size + repeated flags)."""
    import binascii
    import hashlib

    out = bytearray()
    pos = 0
    while pos < len(buf):
        if len(buf) - pos < 12:
            raise ValueError(
                f"xz: stream header truncated at byte {pos}")
        if buf[pos: pos + 6] != _XZ_MAGIC:
            raise ValueError(f"xz: bad stream magic at byte {pos}")
        flags = buf[pos + 6: pos + 8]
        if flags[0] != 0 or flags[1] not in _CHECK_SIZES:
            raise NotImplementedError(
                f"xz: unsupported stream flags {flags.hex()}"
            )
        (flag_crc,) = struct.unpack_from("<I", buf, pos + 8)
        if binascii.crc32(flags) != flag_crc:
            raise ValueError("xz: stream-flags CRC mismatch")
        check_id = flags[1]
        check_size = _CHECK_SIZES[check_id]
        pos += 12
        records = []
        while True:
            if pos >= len(buf):
                raise ValueError("xz: truncated before the index")
            hdr_size_byte = buf[pos]
            if hdr_size_byte == 0:  # index indicator
                break
            hdr_len = (hdr_size_byte + 1) * 4
            hdr = buf[pos: pos + hdr_len]
            if len(hdr) != hdr_len:
                raise ValueError("xz: block header truncated")
            (hdr_crc,) = struct.unpack_from("<I", hdr, hdr_len - 4)
            if binascii.crc32(hdr[:-4]) != hdr_crc:
                raise ValueError("xz: block-header CRC mismatch")
            bflags = hdr[1]
            n_filters = (bflags & 3) + 1
            if bflags & 0x3C:
                raise ValueError("xz: reserved block flags set")
            p = 2
            comp_size = unc_size = None
            if bflags & 0x40:
                comp_size, p = _vli(hdr, p)
            if bflags & 0x80:
                unc_size, p = _vli(hdr, p)
            filters = []
            for _ in range(n_filters):
                fid, p = _vli(hdr, p)
                plen, p = _vli(hdr, p)
                filters.append((fid, hdr[p: p + plen]))
                p += plen
            if any(b != 0 for b in hdr[p: hdr_len - 4]):
                raise ValueError("xz: block-header padding not zero")
            if len(filters) != 1 or filters[0][0] != 0x21:
                raise NotImplementedError(
                    "xz: filter chain "
                    f"{[hex(f[0]) for f in filters]} unsupported "
                    "(LZMA2 only; delta/BCJ stay loud)"
                )
            if len(filters[0][1]) != 1:
                raise ValueError("xz: bad LZMA2 props length")
            data_start = pos + hdr_len
            before = len(out)
            # LZMA2 is self-terminating; decode in place (positional
            # — no remainder slice, so multi-block files stay O(n))
            end_abs, chunk_out = _lzma2_stream(buf, data_start)
            consumed = end_abs - data_start
            out += chunk_out
            if comp_size is not None and consumed != comp_size:
                raise ValueError(
                    f"xz: block compressed size {consumed} != "
                    f"declared {comp_size}"
                )
            if unc_size is not None and len(out) - before != unc_size:
                raise ValueError(
                    f"xz: block uncompressed size "
                    f"{len(out) - before} != declared {unc_size}"
                )
            data_end = data_start + consumed
            pad = (4 - consumed % 4) % 4
            if any(b != 0 for b in buf[data_end: data_end + pad]):
                raise ValueError("xz: block padding not zero")
            check_at = data_end + pad
            check = buf[check_at: check_at + check_size]
            if len(check) != check_size:
                raise ValueError("xz: block check field truncated")
            body = bytes(chunk_out)
            if check_id == 1 and \
                    struct.unpack("<I", check)[0] != binascii.crc32(body):
                raise ValueError("xz: block CRC32 mismatch")
            if check_id == 4 and \
                    struct.unpack("<Q", check)[0] != _crc64(body):
                raise ValueError("xz: block CRC64 mismatch")
            if check_id == 10 and \
                    check != hashlib.sha256(body).digest():
                raise ValueError("xz: block SHA-256 mismatch")
            unpadded = hdr_len + consumed + check_size
            records.append((unpadded, len(out) - before))
            pos = check_at + check_size
        # index
        idx_start = pos
        pos += 1  # the 0x00 indicator
        n_rec, pos = _vli(buf, pos)
        if n_rec != len(records):
            raise ValueError(
                f"xz: index declares {n_rec} blocks, stream had "
                f"{len(records)}"
            )
        for want in records:
            got_unpadded, pos = _vli(buf, pos)
            got_unc, pos = _vli(buf, pos)
            if (got_unpadded, got_unc) != want:
                raise ValueError("xz: index record mismatch")
        while (pos - idx_start) % 4:
            if pos >= len(buf):
                raise ValueError("xz: index padding truncated")
            if buf[pos] != 0:
                raise ValueError("xz: index padding not zero")
            pos += 1
        if pos + 4 > len(buf):
            raise ValueError("xz: index CRC truncated")
        (idx_crc,) = struct.unpack_from("<I", buf, pos)
        if binascii.crc32(buf[idx_start:pos]) != idx_crc:
            raise ValueError("xz: index CRC mismatch")
        pos += 4
        # footer: CRC32(backward size + flags), backward, flags, YZ
        if pos + 12 > len(buf):
            raise ValueError("xz: stream footer truncated")
        (foot_crc,) = struct.unpack_from("<I", buf, pos)
        if binascii.crc32(buf[pos + 4: pos + 10]) != foot_crc:
            raise ValueError("xz: footer CRC mismatch")
        (backward,) = struct.unpack_from("<I", buf, pos + 4)
        idx_size = pos - idx_start
        if (backward + 1) * 4 != idx_size:
            raise ValueError("xz: footer backward size mismatch")
        if buf[pos + 8: pos + 10] != flags:
            raise ValueError("xz: footer stream flags differ")
        if buf[pos + 10: pos + 12] != b"YZ":
            raise ValueError("xz: bad footer magic")
        pos += 12
        # stream padding: zeros in 4-byte multiples
        while pos < len(buf) and buf[pos] == 0:
            pos += 1
    return bytes(out)


def _lzma2_stream(buf: bytes, start: int) -> tuple[int, bytearray]:
    """THE LZMA2 chunk-framing loop (single implementation — the xz
    block path and raw lzma2_decompress both use it): decode the
    chunk stream beginning at ``start``, returning (position just
    past the end-of-stream control, output bytes). Every header
    read is bounds-checked so truncation is a named ValueError."""
    out = bytearray()
    pos = start
    st: _LzmaState | None = None
    dict_start = 0
    need_dict_reset = True
    while True:
        if pos >= len(buf):
            raise ValueError("lzma2: missing end-of-stream control")
        ctrl = buf[pos]
        pos += 1
        if ctrl == 0:
            return pos, out
        if ctrl in (1, 2):  # uncompressed chunk
            if ctrl == 1:
                dict_start = len(out)
                need_dict_reset = False
            elif need_dict_reset:
                raise ValueError("lzma2: first chunk must reset dict")
            if pos + 2 > len(buf):
                raise ValueError("lzma2: chunk header truncated")
            n = int.from_bytes(buf[pos: pos + 2], "big") + 1
            pos += 2
            if pos + n > len(buf):
                raise ValueError("lzma2: uncompressed chunk truncated")
            out += buf[pos: pos + n]
            pos += n
            if st is not None:
                st.reset_state()  # spec: state resets after a copy chunk
            continue
        if ctrl < 0x80:
            raise ValueError(f"lzma2: bad control byte {ctrl:#04x}")
        if pos + 4 > len(buf):
            raise ValueError("lzma2: chunk header truncated")
        unpack = (((ctrl & 0x1F) << 16)
                  + int.from_bytes(buf[pos: pos + 2], "big") + 1)
        packed = int.from_bytes(buf[pos + 2: pos + 4], "big") + 1
        pos += 4
        reset = (ctrl >> 5) & 3
        if reset == 3:
            dict_start = len(out)
            need_dict_reset = False
        elif need_dict_reset:
            raise ValueError("lzma2: first chunk must reset dict")
        if reset >= 2:
            if pos >= len(buf):
                raise ValueError("lzma2: props byte truncated")
            props = buf[pos]
            pos += 1
            if props >= 9 * 5 * 5:
                raise ValueError(f"lzma2: bad props byte {props}")
            lc, lp, pb = props % 9, (props // 9) % 5, props // 45
            if lc + lp > 4:
                # the LZMA2 spec's extra restriction — no conforming
                # encoder produces such streams
                raise ValueError(
                    f"lzma2: lc+lp = {lc + lp} exceeds 4"
                )
            if st is None:
                st = _LzmaState(lc, lp, pb)
            else:
                st.set_props(lc, lp, pb)
            st.reset_state()
        elif reset == 1:
            if st is None:
                raise ValueError("lzma2: state reset before props")
            st.reset_state()
        elif st is None:
            raise ValueError("lzma2: compressed chunk before props")
        if pos + packed > len(buf):
            raise ValueError("lzma2: compressed chunk truncated")
        rc = _RangeDecoder(buf, pos)
        target = len(out) + unpack
        _lzma_decode(rc, st, out, target, dict_start, False)
        if len(out) != target:
            raise ValueError("lzma2: chunk produced short output")
        if rc.pos != pos + packed:
            raise ValueError(
                f"lzma2: chunk consumed {rc.pos - pos} of {packed} "
                "packed bytes"
            )
        pos += packed
