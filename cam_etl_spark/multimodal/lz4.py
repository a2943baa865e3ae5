"""LZ4 decoder from the public specs (round 14) — the BLOCK format
(lz4.org block spec: token nibbles, LSIC length extension, 16-bit
little-endian match offsets, overlap-copy semantics) and the FRAME
format (frame spec v1.6.x: magic 0x184D2204, FLG/BD descriptor,
xxHash32 header/block/content checksums, independent or linked
blocks), plus xxHash32 itself from its public reference spec. No lz4
library exists in this container, so this closes the Arrow IPC
LZ4_FRAME boundary with pyarrow's real lz4 codec as the writer
referee (tests/test_lz4.py pins round-trips and every checksum).

Boundaries (loud): dictionary IDs (no preset-dictionary plumbing),
reserved FLG bits, skippable frames are SKIPPED (per spec), legacy
frame magic 0x184C2102 unsupported.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(buf: bytes, seed: int = 0) -> int:
    """xxHash32 from the public reference algorithm."""
    n = len(buf)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<I", buf, pos + 4 * i)
                v = (v + lane * _P2) & _M32
                v = (_rotl(v, 13) * _P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", buf, pos)
        h = (h + lane * _P3) & _M32
        h = (_rotl(h, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (h + buf[pos] * _P5) & _M32
        h = (_rotl(h, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def _lsic(buf: bytes, pos: int, base: int) -> tuple[int, int]:
    """Linear small-integer code: ``base`` from the token nibble,
    extended by 255-valued bytes while each added byte is 255."""
    if base != 15:
        return base, pos
    total = base
    while True:
        if pos >= len(buf):
            raise ValueError("lz4: LSIC length truncated")
        b = buf[pos]
        pos += 1
        total += b
        if b != 255:
            return total, pos


def lz4_block_decompress(buf: bytes, prefix: bytes = b"") -> bytes:
    """One LZ4 block. ``prefix`` is the already-decoded window for
    linked-block frames (matches may reach back into it)."""
    out = bytearray(prefix)
    start = len(prefix)
    pos = 0
    n = len(buf)
    while pos < n:
        token = buf[pos]
        pos += 1
        lit_len, pos = _lsic(buf, pos, token >> 4)
        if pos + lit_len > n:
            raise ValueError("lz4: literals truncated")
        out += buf[pos: pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence ends with literals only
        if pos + 2 > n:
            raise ValueError("lz4: match offset truncated")
        (offset,) = struct.unpack_from("<H", buf, pos)
        pos += 2
        if offset == 0:
            raise ValueError("lz4: zero match offset is corrupt")
        match_len, pos = _lsic(buf, pos, token & 0xF)
        match_len += 4  # minmatch
        if offset > len(out):
            raise ValueError("lz4: match offset before window start")
        for _ in range(match_len):  # overlap-copy is the semantics
            out.append(out[len(out) - offset])
    return bytes(out[start:])


_FRAME_MAGIC = 0x184D2204
_SKIP_MAGIC_LO = 0x184D2A50
_BLOCK_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def lz4_frame_decompress(buf: bytes) -> bytes:
    """Decompress LZ4 FRAME bytes (possibly several concatenated
    frames, incl. skippable ones)."""
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("lz4: frame magic truncated")
        (magic,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if _SKIP_MAGIC_LO <= magic <= _SKIP_MAGIC_LO + 15:
            if pos + 4 > len(buf):
                raise ValueError("lz4: skippable frame truncated")
            (sk,) = struct.unpack_from("<I", buf, pos)
            pos += 4 + sk
            if pos > len(buf):
                raise ValueError("lz4: skippable frame truncated")
            continue
        if magic != _FRAME_MAGIC:
            raise ValueError(f"lz4: bad frame magic 0x{magic:08x}")
        desc_start = pos
        if pos + 2 > len(buf):
            raise ValueError("lz4: frame descriptor truncated")
        flg = buf[pos]
        bd = buf[pos + 1]
        pos += 2
        if (flg >> 6) != 0b01:
            raise ValueError(
                f"lz4: frame version {flg >> 6} unsupported")
        block_indep = bool(flg & 0x20)
        block_checksum = bool(flg & 0x10)
        content_size_flag = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        if flg & 0x02:
            raise ValueError("lz4: reserved FLG bit set")
        if flg & 0x01:
            raise NotImplementedError(
                "lz4: preset dictionary unsupported")
        if bd & 0x8F:
            raise ValueError("lz4: reserved BD bits set")
        if (bd >> 4) & 0x7 not in _BLOCK_MAX:
            raise ValueError("lz4: invalid block max size code")
        content_size = None
        if content_size_flag:
            if pos + 8 > len(buf):
                raise ValueError("lz4: content size truncated")
            (content_size,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        if pos >= len(buf):
            raise ValueError("lz4: header checksum truncated")
        hc = buf[pos]
        pos += 1
        want_hc = (xxh32(buf[desc_start:pos - 1]) >> 8) & 0xFF
        if hc != want_hc:
            raise ValueError("lz4: frame header checksum mismatch")
        frame_out_start = len(out)
        while True:
            if pos + 4 > len(buf):
                raise ValueError("lz4: block size truncated")
            (bsize,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if bsize == 0:
                break  # EndMark
            stored = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            data = buf[pos: pos + bsize]
            if len(data) != bsize:
                raise ValueError("lz4: block truncated")
            pos += bsize
            if block_checksum:
                if pos + 4 > len(buf):
                    raise ValueError("lz4: block checksum truncated")
                (bc,) = struct.unpack_from("<I", buf, pos)
                pos += 4
                if xxh32(data) != bc:
                    raise ValueError("lz4: block checksum mismatch")
            if stored:
                out += data
            elif block_indep:
                out += lz4_block_decompress(data)
            else:
                # linked blocks: the match window spans the last
                # 64 KB of everything decoded so far in this frame
                window = bytes(out[max(frame_out_start,
                                       len(out) - 65536):])
                out += lz4_block_decompress(data, prefix=window)
        if content_checksum:
            if pos + 4 > len(buf):
                raise ValueError("lz4: content checksum truncated")
            (cc,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            if xxh32(bytes(out[frame_out_start:])) != cc:
                raise ValueError("lz4: content checksum mismatch")
        if content_size is not None and \
                len(out) - frame_out_start != content_size:
            raise ValueError(
                f"lz4: content size {len(out) - frame_out_start} != "
                f"declared {content_size}")
    return bytes(out)
