"""FLAC (Free Lossless Audio Codec) encode/decode with NO codec library —
the compressed-audio analogue of the native JPEG/PNG/GIF/TIFF modules.

Subset implemented (the spec's core coding tools, RFC 9639 / the
xiph.org format spec): mono, 16-bit, fixed-blocksize streams; CONSTANT,
VERBATIM, and FIXED-predictor (orders 0-4) subframes; partitioned Rice
residual coding (method 0, one partition) with zigzag mapping; UTF-8
frame numbers; CRC-8 frame-header and CRC-16 whole-frame checksums, both
verified on decode. Unsupported (honest boundary, raises
NotImplementedError): LPC subframes, stereo decorrelation, wasted bits,
Rice escape partitions — the fixture encoder never emits them, and real
FLAC files that use them are rejected loudly, not mis-decoded.

Decoding is lossless by construction, so catalog fixtures built from
digest arithmetic round-trip bit-exactly and a SQL oracle can replay the
decoded sample statistics — the same discipline as the WAV/BMP/JPEG
entries (multimodal/codecs.py, multimodal/jpeg.py).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07; whole-frame CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------


def crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# MSB-first bit I/O (no byte stuffing — FLAC frames are byte-aligned blobs)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos  # byte position
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.buf):
                raise ValueError("decode_flac: truncated bitstream")
            self._acc = (self._acc << 8) | self.buf[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= nbits
        val = (self._acc >> self._n) & ((1 << nbits) - 1)
        self._acc &= (1 << self._n) - 1
        return val

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("decode_flac: runaway unary code")
        return q

    def align(self) -> None:
        self._acc = 0
        self._n = 0


# ---------------------------------------------------------------------------
# Fixed predictors (spec §9.2.1): residual = signal - prediction
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _residuals(samples: list[int], order: int) -> list[int]:
    coef = _FIXED_COEFFS[order]
    return [
        s - sum(c * samples[i - j - 1] for j, c in enumerate(coef))
        for i, s in enumerate(samples)
        if i >= order
    ]


def _restore(warmup: list[int], res: list[int], order: int) -> list[int]:
    coef = _FIXED_COEFFS[order]
    out = list(warmup)
    for e in res:
        out.append(e + sum(c * out[-j - 1] for j, c in enumerate(coef)))
    return out


def _zigzag(e: int) -> int:
    return (e << 1) if e >= 0 else (-(e << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u >> 1) + 1)


def _utf8_number(n: int) -> bytes:
    """FLAC frame numbers use UTF-8-style coding of arbitrary ints."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 - nbytes + 5 * nbytes)):
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | n
    return bytes([lead] + out[::-1])


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("decode_flac: bad UTF-8 frame number")
    n = first & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("decode_flac: bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Encoder (fixture-grade, standards-shaped): mono 16-bit, fixed blocksize
# ---------------------------------------------------------------------------


def _best_order(samples: list[int]) -> int:
    best, best_cost = 0, None
    for order in range(3):  # orders 0-2 cover the fixture signals
        if len(samples) <= order:
            continue
        res = _residuals(samples, order)
        cost = sum(_zigzag(e).bit_length() for e in res)
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(_zigzag(e) for e in res) / len(res)
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


def encode_flac(samples: list[int], sample_rate: int = 8000, block_size: int = 256) -> bytes:
    """Encode mono 16-bit samples as a real FLAC stream (header + frames
    the decoder — or any FLAC decoder supporting the subset — can read).
    Subframe type per block: CONSTANT for flat blocks, else the cheapest
    FIXED predictor (order 0-2)."""
    if any(not -32768 <= s <= 32767 for s in samples):
        raise ValueError("encode_flac: samples must be int16")
    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata flag + type 0, length 34
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    # 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total samples
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | len(samples)
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # raw-audio MD5 unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    for f, start in enumerate(range(0, max(len(samples), 1), block_size)):
        blk = samples[start : start + block_size]
        if not blk:
            break
        header = bytearray()
        header += bytes([0xFF, 0xF8])  # sync 11111111 111110, strategy 0
        # blocksize code 0111 (16-bit follows), rate code 0100 (8 kHz)
        header += bytes([(0b0111 << 4) | 0b0100])
        # channel 0000 (mono), sample size 100 (16-bit), reserved 0
        header += bytes([(0b0000 << 4) | (0b100 << 1)])
        header += _utf8_number(f)
        header += struct.pack(">H", len(blk) - 1)
        header.append(crc8(bytes(header)))

        w = _BitWriter()
        if all(s == blk[0] for s in blk):
            w.write(0b000000, 8)  # pad bit + CONSTANT + wasted 0
            w.write(blk[0] & 0xFFFF, 16)
        else:
            order = _best_order(blk)
            w.write((0b001000 | order) << 1, 8)  # pad + FIXED(order) + wasted
            for s in blk[:order]:
                w.write(s & 0xFFFF, 16)
            res = _residuals(blk, order)
            k = _rice_param(res)
            w.write(0b00, 2)   # residual method: 4-bit rice
            w.write(0, 4)      # partition order 0 -> one partition
            w.write(k, 4)
            for e in res:
                u = _zigzag(e)
                w.write(1, (u >> k) + 1)  # unary: q zeros then a 1
                if k:
                    w.write(u & ((1 << k) - 1), k)
        w.align()
        frame = bytes(header) + bytes(w.out)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {i: 256 << (i - 8) for i in range(8, 16)}
_RATE_CODES = {0b0100: 8000, 0b0101: 16000, 0b0110: 22050, 0b0111: 24000,
               0b1000: 32000, 0b1001: 44100, 0b1010: 48000, 0b1011: 96000}


def decode_flac(buf: bytes) -> dict:
    """Decode a mono 16-bit FLAC stream produced by ``encode_flac`` (or
    any encoder confined to the same subset). Verifies CRC-8 and CRC-16.
    Returns {sample_rate, n_samples, samples}."""
    if len(buf) < 8 or buf[:4] != b"fLaC":
        raise ValueError("decode_flac: not a FLAC stream")
    pos = 4
    total_samples = None
    sample_rate = None
    # metadata blocks
    while pos + 4 <= len(buf):
        head = buf[pos]
        last = head & 0x80
        btype = head & 0x7F
        length = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("decode_flac: truncated metadata block")
        if btype == 0:  # STREAMINFO
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
            if channels != 1 or bps != 16:
                raise NotImplementedError("decode_flac: mono 16-bit only")
        pos += 4 + length
        if last:
            break
    if sample_rate is None:
        raise ValueError("decode_flac: missing STREAMINFO")

    samples: list[int] = []
    while pos + 2 <= len(buf):
        frame_start = pos
        r = _BitReader(buf, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("decode_flac: bad frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy (fixed)
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        if chan != 0:
            raise NotImplementedError("decode_flac: mono only")
        if ss_code != 0b100:
            raise NotImplementedError("decode_flac: 16-bit only")
        _read_utf8_number(r)
        if bs_code == 0b0110:
            block_size = r.read(8) + 1
        elif bs_code == 0b0111:
            block_size = r.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            block_size = _BLOCKSIZE_CODES[bs_code]
        else:
            raise NotImplementedError("decode_flac: blocksize code")
        if rate_code not in _RATE_CODES:
            raise NotImplementedError("decode_flac: sample-rate code")
        header_len = r.pos - frame_start
        if crc8(buf[frame_start : frame_start + header_len]) != r.read(8):
            raise ValueError("decode_flac: frame header CRC-8 mismatch")

        # subframe
        if r.read(1) != 0:
            raise ValueError("decode_flac: bad subframe padding bit")
        stype = r.read(6)
        if r.read(1) != 0:
            raise NotImplementedError("decode_flac: wasted bits")

        def s16(v: int) -> int:
            return v - 0x10000 if v & 0x8000 else v

        if stype == 0b000000:  # CONSTANT
            blk = [s16(r.read(16))] * block_size
        elif stype == 0b000001:  # VERBATIM
            blk = [s16(r.read(16)) for _ in range(block_size)]
        elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
            order = stype & 0x07
            warmup = [s16(r.read(16)) for _ in range(order)]
            method = r.read(2)
            if method != 0b00:
                raise NotImplementedError("decode_flac: 5-bit rice method")
            part_order = r.read(4)
            if part_order != 0:
                raise NotImplementedError("decode_flac: partitioned residual")
            k = r.read(4)
            if k == 0b1111:
                raise NotImplementedError("decode_flac: rice escape partition")
            res = []
            for _ in range(block_size - order):
                q = r.read_unary()
                u = (q << k) | (r.read(k) if k else 0)
                res.append(_unzigzag(u))
            blk = _restore(warmup, res, order)
        else:
            raise NotImplementedError("decode_flac: LPC subframes")
        r.align()
        if crc16(buf[frame_start : r.pos]) != r.read(16):
            raise ValueError("decode_flac: frame CRC-16 mismatch")
        samples.extend(blk)
        pos = r.pos

    if total_samples and len(samples) > total_samples:
        samples = samples[:total_samples]
    return {
        "format": "flac",
        "sample_rate": sample_rate,
        "n_samples": len(samples),
        "samples": samples,
    }
