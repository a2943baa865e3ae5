"""Baseline JPEG (ITU-T T.81) encode/decode with NO codec library.

The whole pipeline is implemented natively: marker segment walk, DQT/DHT
table parsing, canonical Huffman code construction (spec Annex C),
entropy decoding with 0xFF00 byte unstuffing and RSTn restart handling,
DC prediction, run-length AC decoding (EOB/ZRL), dequantization, zigzag
inversion, and a float 2-D IDCT (numpy basis product) with level shift.
Grayscale, interleaved 4:4:4, and 4:2:0-subsampled YCbCr color all
decode (MCU-interleaved sampling factors up to 2x2, chroma planes
reconstructed by nearest upsampling), and SOF2 progressive streams
decode too: multiple scans accumulate into the coefficient store —
interleaved DC scans (first pass and successive-approximation
refinement bits) and non-interleaved AC band scans with EOB-run
coding, including AC successive-approximation refinement scans
(T.81 G.1.2.3 — correction bits for already-nonzero coefficients,
(run,1)+sign symbols for newly significant ones, EOB runs carrying
buffered correction bits). The remaining honest boundary is MP3 and
H.264 — the only codec paths left stubbed in this container.

The encoder is a REAL forward path (level shift, optional 4:2:0 chroma
downsampling, 2-D DCT, quantization, DC-diff + run-length Huffman
coding, byte stuffing), not a fixture writer: any MCU-aligned grayscale
or RGB image encodes to a standards-shaped JFIF stream the decoder (or
any other baseline decoder) can read. Catalog fixtures use block-constant grayscale input with an
all-ones quantization table, for which the lossy pipeline is exactly
lossless (AC coefficients vanish, the DC term is integral), so the
DuckDB oracle can replay the decoded pixels as pure digest arithmetic.

Reference parity: the reference treats imagery as opaque attachments
(SURVEY.md multimodal extension scope); this module is part of the
training-data extension surface, mirroring /root/reference's honest
"decode needs a codec" boundary while shrinking it.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K) and derived structures
# ---------------------------------------------------------------------------


def _zigzag_order() -> list[int]:
    """Row-major indices in zigzag scan order, generated from the spec's
    diagonal-walk definition rather than hardcoded (self-checking)."""
    out: list[int] = []
    for s in range(15):
        cells = [(r, s - r) for r in range(s + 1) if r < 8 and s - r < 8]
        if s % 2 == 0:
            cells = cells[::-1]
        out.extend(r * 8 + c for r, c in cells)
    return out


ZIGZAG = _zigzag_order()  # zigzag position -> row-major index

# Annex K.3.3: BITS (codes per length 1..16) and HUFFVAL for the four
# standard tables. Encoder writes these into DHT segments; the decoder
# always rebuilds tables from the stream, so the two sides cannot drift.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: All-ones quantization table: a legal DQT for which block-constant
#: input round-trips bit-exactly (the catalog-fixture table).
QTABLE_ONES = [1] * 64

#: Annex K.1 luminance table (zigzag order via row-major list below) —
#: the conventional "quality 50" table, used by tests for a lossy path.
QTABLE_STD_LUMA_ROWMAJOR = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


#: Huffman table for progressive AC band scans: flat canonical 9-bit
#: codes for every (run, size) symbol PLUS the EOBn run symbols (r 0..14)
#: that the standard sequential tables lack. Written into the stream's
#: DHT like any table, so decoder interop is by construction.
_PROG_AC_VALS = sorted(
    {(r << 4) | sz for r in range(16) for sz in range(1, 11)}
    | {0xF0}
    | {r << 4 for r in range(15)}
)
_PROG_AC_BITS = [0] * 8 + [len(_PROG_AC_VALS)] + [0] * 7


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C with C[u, x] rows, so that
    spatial->freq is C @ B @ C.T and freq->spatial is C.T @ S @ C."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16) / 2
    c[0, :] *= 1 / np.sqrt(2)
    return c


_BASIS = _dct_basis()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length) (Annex C generation)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) -> symbol, for bitwise decoding."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _magnitude(value: int) -> tuple[int, int]:
    """JPEG magnitude category: (size, appended-bit pattern)."""
    if value == 0:
        return 0, 0
    size = abs(value).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude (spec EXTEND procedure)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---------------------------------------------------------------------------
# Bit I/O with byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers, and
    exposes restart-marker consumption for DRI streams."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("decode_jpeg: entropy stream truncated")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("decode_jpeg: entropy stream truncated at 0xFF")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "decode_jpeg: unexpected restart marker inside block"
                )
            else:
                raise ValueError("decode_jpeg: entropy stream ended early at marker")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("decode_jpeg: invalid Huffman code in entropy stream")

    def sync_restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker between restart intervals."""
        self._acc = 0
        self._n = 0
        if self.pos + 2 > len(self.buf) or self.buf[self.pos] != 0xFF:
            raise ValueError("decode_jpeg: missing restart marker")
        marker = self.buf[self.pos + 1]
        if marker != 0xD0 + (n % 8):
            raise ValueError(
                f"decode_jpeg: restart marker out of sequence "
                f"(got 0x{marker:02x}, want 0x{0xD0 + (n % 8):02x})"
            )
        self.pos += 2


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _forward_blocks(plane: np.ndarray, qtable_zz: np.ndarray) -> list[np.ndarray]:
    """Level-shift, 2-D DCT, quantize; returns per-block int32 arrays of 64
    quantized coefficients in ZIGZAG order (row-major block scan)."""
    h, w = plane.shape
    out = []
    shifted = plane.astype(np.float64) - 128.0
    for by in range(h // 8):
        for bx in range(w // 8):
            block = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeffs = _BASIS @ block @ _BASIS.T
            flat = coeffs.reshape(-1)[ZIGZAG]
            out.append(np.round(flat / qtable_zz).astype(np.int64))
    return out


def _encode_block(
    writer: _BitWriter,
    coeffs_zz: np.ndarray,
    dc_pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    diff = int(coeffs_zz[0]) - dc_pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    run = 0
    last_nonzero = 0
    for k in range(63, 0, -1):
        if coeffs_zz[k]:
            last_nonzero = k
            break
    for k in range(1, last_nonzero + 1):
        v = int(coeffs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        run = 0
    if last_nonzero < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(coeffs_zz[0])


def _dqt_segment(tq: int, qtable_zz: list[int]) -> bytes:
    return struct.pack(">HHB", 0xFFDB, 2 + 65, tq) + bytes(qtable_zz)


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return struct.pack(">HH", 0xFFC4, 2 + len(body)) + body


def encode_jpeg(
    width: int,
    height: int,
    pixels: np.ndarray,
    qtable: list[int] | None = None,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """Encode a real baseline JFIF stream. ``pixels`` is (h, w) uint8 for
    grayscale or (h, w, 3) uint8 RGB; ``subsampling`` is "444" (one block
    per component per MCU) or "420" (2x2 luma blocks + one chroma block
    each per MCU, chroma planes 2x2-mean downsampled — the conventional
    photographic layout). Dimensions must be multiples of the MCU size
    (8 for 444/grayscale, 16 for 420 — no edge-padding policy to hide
    behavior behind)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    color = arr.ndim == 3
    if subsampling not in ("444", "420"):
        raise ValueError("encode_jpeg: subsampling must be '444' or '420'")
    sub = subsampling == "420" and color
    if progressive and (sub or restart_interval):
        raise ValueError(
            "encode_jpeg: progressive supports 444/grayscale without restart "
            "markers only"
        )
    mcu = 16 if sub else 8
    if width % mcu or height % mcu or width <= 0 or height <= 0:
        raise ValueError(
            f"encode_jpeg: dimensions must be positive multiples of {mcu}"
        )
    if arr.shape[:2] != (height, width) or (color and arr.shape[2] != 3):
        raise ValueError("encode_jpeg: pixel array shape mismatch")
    qtable_zz = np.array(qtable if qtable is not None else QTABLE_ONES, dtype=np.float64)
    if qtable_zz.shape != (64,) or (qtable_zz < 1).any():
        raise ValueError("encode_jpeg: qtable must be 64 entries >= 1")

    if color:
        # ITU-R BT.601 full-range YCbCr, rounded to uint8 like every
        # baseline codec (the lossy step that keeps color out of the
        # bit-exact catalog fixture).
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        if sub:
            # chroma 2x2 mean downsample (rounded) — the lossy 4:2:0 step
            planes = [planes[0]] + [
                np.round(
                    p.reshape(height // 2, 2, width // 2, 2).mean(axis=(1, 3))
                )
                for p in planes[1:]
            ]
        samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    else:
        planes = [arr]
        samp = [(1, 1)]

    blocks = [_forward_blocks(p, qtable_zz) for p in planes]

    out = bytearray()
    out += struct.pack(">H", 0xFFD8)  # SOI
    out += struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, [int(q) for q in qtable_zz])
    ncomp = 3 if color else 1
    sof_marker = 0xFFC2 if progressive else 0xFFC0
    sof = struct.pack(">HHBHHB", sof_marker, 8 + 3 * ncomp, 8, height, width, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        sof += bytes([cid, (hi << 4) | vi, 0])  # sampling factors, qtable 0
    out += sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if color:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += struct.pack(">HHH", 0xFFDD, 4, restart_interval)
    if progressive:
        out += _dht_segment(1, 2, _PROG_AC_BITS, _PROG_AC_VALS)
        _emit_progressive_scans(out, blocks, ncomp)
        out += struct.pack(">H", 0xFFD9)  # EOI
        return bytes(out)
    sos = struct.pack(">HHB", 0xFFDA, 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        table = 0 if cid == 1 else 1
        sos += bytes([cid, (table << 4) | table])
    sos += bytes([0, 63, 0])
    out += sos

    dc_tabs = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_tabs = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if color:
        dc_tabs += [_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
        ac_tabs += [_build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)] * 2
    writer = _BitWriter()
    dc_pred = [0] * ncomp
    rst = 0
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    mcus_x = width // (8 * max_h)
    mcus_y = height // (8 * max_v)
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += struct.pack(">H", 0xFFD0 + (rst % 8))
            rst += 1
            writer = _BitWriter()
            dc_pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for c in range(ncomp):
            hi, vi = samp[c]
            comp_wb = mcus_x * hi  # blocks per row in this component
            for v in range(vi):
                for hh in range(hi):
                    bidx = (my * vi + v) * comp_wb + (mx * hi + hh)
                    dc_pred[c] = _encode_block(
                        writer, blocks[c][bidx], dc_pred[c], dc_tabs[c], ac_tabs[c]
                    )
    writer.flush()
    out += writer.out
    out += struct.pack(">H", 0xFFD9)  # EOI
    return bytes(out)


def _emit_progressive_scans(out: bytearray, blocks: list, ncomp: int) -> None:
    """Spectral-selection progressive emission: one interleaved DC scan
    (diff + magnitude, exactly the sequential DC coding), then per
    component the AC bands 1-5 and 6-63 as non-interleaved scans with
    EOB-run accumulation (EOBn symbols from the _PROG_AC table)."""
    dc_tabs = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    if ncomp == 3:
        dc_tabs += [_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
    ac_prog = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    # DC scan: Ss=0, Se=0, Ah=0, Al=0, all components interleaved
    sos = struct.pack(">HHB", 0xFFDA, 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, ((0 if cid == 1 else 1) << 4) | 0])
    sos += bytes([0, 0, 0])
    out += sos
    writer = _BitWriter()
    dc_pred = [0] * ncomp
    for b in range(len(blocks[0])):
        for c in range(ncomp):
            diff = int(blocks[c][b][0]) - dc_pred[c]
            dc_pred[c] = int(blocks[c][b][0])
            size, bits = _magnitude(diff)
            code, length = dc_tabs[c][size]
            writer.write(code, length)
            if size:
                writer.write(bits, size)
    writer.flush()
    out += writer.out

    # AC band scans per component (non-interleaved)
    for c in range(ncomp):
        for k0, k1 in ((1, 5), (6, 63)):
            sos = struct.pack(">HHB", 0xFFDA, 6 + 2, 1)
            sos += bytes([c + 1, (0 << 4) | 2])  # AC table id 2 (_PROG_AC)
            sos += bytes([k0, k1, 0])
            out += sos
            writer = _BitWriter()
            eobrun = 0

            def flush_eobrun():
                nonlocal eobrun
                while eobrun > 0:
                    r = min(eobrun.bit_length() - 1, 14)
                    chunk = min(eobrun, (1 << (r + 1)) - 1)
                    code, length = ac_prog[r << 4]
                    writer.write(code, length)
                    if r:
                        writer.write(chunk - (1 << r), r)
                    eobrun -= chunk

            for b in range(len(blocks[c])):
                band = blocks[c][b][k0 : k1 + 1]
                nz = [i for i, v in enumerate(band) if v]
                if not nz:
                    eobrun += 1
                    continue
                flush_eobrun()
                run = 0
                prev = -1
                for i in nz:
                    run = i - prev - 1
                    prev = i
                    while run > 15:
                        code, length = ac_prog[0xF0]
                        writer.write(code, length)
                        run -= 16
                    v = int(band[i])
                    size, bits = _magnitude(v)
                    code, length = ac_prog[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                if prev < k1 - k0:  # trailing zeros: this block ends early
                    eobrun += 1
            flush_eobrun()
            writer.flush()
            out += writer.out


def _emit_sa_scans(out: bytearray, blocks: list) -> None:
    """Full successive-approximation progressive emission (T.81 G.1.2),
    GRAYSCALE only — the sole caller is the coefficient-domain fixture
    encoder, and color SA would need chroma DHT plumbing no caller
    provides: DC first pass at Al=1 (arithmetic-shifted, diff-coded) +
    DC refinement scan (one raw low bit per block), then per spectral
    band an AC first pass at Al=1 (point transform: sign * (|v| >> 1))
    followed by an AC refinement scan at Ah=1, Al=0 — newly significant
    ±1 coefficients as (run,1)+sign symbols, already-nonzero
    coefficients as buffered correction bits flushed with the next symbol
    or EOB run (the figure-G.7 discipline)."""
    if len(blocks) != 1:
        raise ValueError("_emit_sa_scans: grayscale (1 component) only")
    dc_tab = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_prog = _build_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def sos_header(ss_, se_, ah_, al_):
        hdr = struct.pack(">HHB", 0xFFDA, 6 + 2, 1)
        hdr += bytes([1, (0 << 4) | (2 if se_ > 0 else 0)])
        hdr += bytes([ss_, se_, (ah_ << 4) | al_])
        return hdr

    # --- DC first pass: Ss=0, Se=0, Ah=0, Al=1 ---
    out += sos_header(0, 0, 0, 1)
    writer = _BitWriter()
    dc_pred = 0
    for b in range(len(blocks[0])):
        v = int(blocks[0][b][0]) >> 1  # arithmetic shift (floor)
        diff = v - dc_pred
        dc_pred = v
        size, bits = _magnitude(diff)
        code, length = dc_tab[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
    writer.flush()
    out += writer.out

    # --- DC refinement: Ah=1, Al=0 — one raw bit per block ---
    out += sos_header(0, 0, 1, 0)
    writer = _BitWriter()
    for b in range(len(blocks[0])):
        writer.write(int(blocks[0][b][0]) & 1, 1)
    writer.flush()
    out += writer.out

    for c in range(len(blocks)):
        for k0, k1 in ((1, 5), (6, 63)):
            # --- AC first pass at Al=1: point transform sign*(|v|>>1) ---
            out += sos_header(k0, k1, 0, 1)
            writer = _BitWriter()
            eobrun = 0

            def flush_eobrun():
                nonlocal eobrun
                while eobrun > 0:
                    r = min(eobrun.bit_length() - 1, 14)
                    chunk = min(eobrun, (1 << (r + 1)) - 1)
                    code, length = ac_prog[r << 4]
                    writer.write(code, length)
                    if r:
                        writer.write(chunk - (1 << r), r)
                    eobrun -= chunk

            for b in range(len(blocks[c])):
                band = [int(v) for v in blocks[c][b][k0 : k1 + 1]]
                pt = [(1 if v >= 0 else -1) * (abs(v) >> 1) for v in band]
                nz = [i for i, v in enumerate(pt) if v]
                if not nz:
                    eobrun += 1
                    continue
                flush_eobrun()
                prev = -1
                for i in nz:
                    run = i - prev - 1
                    prev = i
                    while run > 15:
                        code, length = ac_prog[0xF0]
                        writer.write(code, length)
                        run -= 16
                    size, bits = _magnitude(pt[i])
                    code, length = ac_prog[(run << 4) | size]
                    writer.write(code, length)
                    writer.write(bits, size)
                if prev < k1 - k0:
                    eobrun += 1
            flush_eobrun()
            writer.flush()
            out += writer.out

            # --- AC refinement: Ah=1, Al=0 ---
            # Two correction-bit buffers (figure G.7 / the BE-vs-BR
            # distinction): `eob_bits` are owed to the pending EOB run
            # and flush right after its EOBn symbol; `cur_bits` are the
            # current block's bits since the last symbol and flush right
            # after the NEXT emitted symbol (ZRL or (run,1)+sign).
            out += sos_header(k0, k1, 1, 0)
            writer = _BitWriter()
            eobrun = 0
            eob_bits: list[int] = []
            cur_bits: list[int] = []

            def flush_eobrun_refine():
                nonlocal eobrun
                if eobrun > 0:
                    # the per-block force-flush above caps runs at 0x7FFF
                    r = eobrun.bit_length() - 1
                    code, length = ac_prog[r << 4]
                    writer.write(code, length)
                    if r:
                        writer.write(eobrun - (1 << r), r)
                    eobrun = 0
                for bit in eob_bits:
                    writer.write(bit, 1)
                eob_bits.clear()

            for b in range(len(blocks[c])):
                band = [int(v) for v in blocks[c][b][k0 : k1 + 1]]
                temp = [abs(v) for v in band]  # Al=0: full magnitude
                eob = -1
                for i, t in enumerate(temp):
                    if t == 1:
                        eob = i
                run = 0
                for i, t in enumerate(temp):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob:
                        flush_eobrun_refine()
                        code, length = ac_prog[0xF0]
                        writer.write(code, length)
                        run -= 16
                        for bit in cur_bits:
                            writer.write(bit, 1)
                        cur_bits.clear()
                    if t > 1:  # already nonzero at Ah: correction bit
                        cur_bits.append(t & 1)
                        continue
                    # newly significant (t == 1): (run,1) symbol + sign bit
                    flush_eobrun_refine()
                    code, length = ac_prog[(run << 4) | 1]
                    writer.write(code, length)
                    writer.write(1 if band[i] >= 0 else 0, 1)
                    for bit in cur_bits:
                        writer.write(bit, 1)
                    cur_bits.clear()
                    run = 0
                if run > 0 or cur_bits:
                    eobrun += 1
                    eob_bits.extend(cur_bits)
                    cur_bits.clear()
                    if eobrun == 0x7FFF:
                        # force the run out at the symbol's capacity —
                        # flushing mid-run is always legal (EOBn just says
                        # "n blocks end here"); the next block starts a
                        # fresh run. Same discipline as the first pass's
                        # chunked flush_eobrun.
                        flush_eobrun_refine()
            flush_eobrun_refine()
            writer.flush()
            out += writer.out


def encode_jpeg_gray_coeff_blocks(
    wb: int, hb: int, coeff_blocks: np.ndarray
) -> bytes:
    """Catalog-fixture SA-progressive encoder: emit a grayscale SOF2
    stream with the FULL successive-approximation scan script (DC Al=1 +
    refinement, AC band first passes at Al=1 + refinement scans) directly
    from quantized zigzag-order coefficients, shape (wb*hb, 64) int.
    QTABLE_ONES means the decoder's coefficient store must reproduce the
    input exactly — the bit-exact oracle hook for the refinement path."""
    arr = np.asarray(coeff_blocks, dtype=np.int32)
    if wb <= 0 or hb <= 0 or arr.shape != (wb * hb, 64):
        raise ValueError("encode_jpeg_gray_coeff_blocks: bad geometry")
    if np.abs(arr).max() > 1023:
        raise ValueError("encode_jpeg_gray_coeff_blocks: coefficients too large")
    out = bytearray()
    out += struct.pack(">H", 0xFFD8)
    out += struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, [1] * 64)
    out += struct.pack(">HHBHHB", 0xFFC2, 8 + 3, 8, hb * 8, wb * 8, 1)
    out += bytes([1, (1 << 4) | 1, 0])
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 2, _PROG_AC_BITS, _PROG_AC_VALS)
    _emit_sa_scans(out, [arr])
    out += struct.pack(">H", 0xFFD9)
    return bytes(out)


def encode_jpeg_gray_blocks(wb: int, hb: int, seed: bytes) -> bytes:
    """Catalog-fixture encoder: a (wb*8) x (hb*8) grayscale image whose
    8x8 block (by, bx) is the constant seed[(by*wb + bx) % len(seed)].
    With QTABLE_ONES the DCT of a constant block has an integral DC term
    and zero ACs, so encode->decode is bit-exact and the DuckDB oracle
    can replay the pixels as digest arithmetic."""
    if wb <= 0 or hb <= 0 or not seed:
        raise ValueError("encode_jpeg_gray_blocks: bad geometry/seed")
    vals = np.frombuffer(seed, dtype=np.uint8)
    block_vals = vals[np.arange(wb * hb) % len(vals)].reshape(hb, wb)
    plane = np.repeat(np.repeat(block_vals, 8, axis=0), 8, axis=1)
    return encode_jpeg(wb * 8, hb * 8, plane, QTABLE_ONES)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(buf: bytes, keep_coeffs: bool = False) -> dict:
    """Full baseline-family decode: sequential (SOF0/1) and progressive
    (SOF2 — multiple scans accumulating into the coefficient store:
    interleaved DC scans with successive approximation, non-interleaved
    AC band scans with EOB-run coding, both spectral-selection first
    passes AND successive-approximation refinement scans).
    Returns geometry plus ``pixels``: (h, w) uint8 for grayscale,
    (h, w, 3) uint8 RGB for 3-component color (4:4:4 or 4:2:0 — sampling
    factors up to 2x2; progressive restricted to 1x1). With
    ``keep_coeffs`` the per-component quantized coefficient grids are
    returned under ``coeffs`` (the refinement oracle hook). Raises
    ValueError for malformed streams and NotImplementedError for the
    remaining honest boundary (subsampled progressive, >2x2 sampling,
    16-bit DQT)."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict[tuple[int, int], int]] = {}
    ac_maps: dict[int, dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    restart_interval = 0
    store = None       # per component: (grid_h, grid_w, 64) quantized coeffs
    geom = None        # (max_h, max_v, mcus_x, mcus_y)
    n_scans = 0
    while pos + 2 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"decode_jpeg: expected marker at offset {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(buf):
            raise ValueError("decode_jpeg: truncated marker segment")
        (seglen,) = struct.unpack_from(">H", buf, pos + 2)
        seg = buf[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("decode_jpeg: truncated marker segment")
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("decode_jpeg: 16-bit DQT")
                if p + 65 > len(seg):
                    raise ValueError("decode_jpeg: truncated DQT")
                qtables[tq] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(
                    np.float64
                )
                p += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                if p + 17 > len(seg):
                    raise ValueError("decode_jpeg: truncated DHT")
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("decode_jpeg: truncated DHT values")
                (dc_maps if tc == 0 else ac_maps)[th] = _build_decode_map(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ValueError("decode_jpeg: truncated SOF segment")
            precision, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if len(seg) < 6 + 3 * nc:
                raise ValueError("decode_jpeg: truncated SOF component list")
            if precision != 8:
                raise NotImplementedError("decode_jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = samp >> 4, samp & 0x0F
                if nc == 1:
                    hi = vi = 1  # single-component scans are never interleaved
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        "decode_jpeg: sampling factors beyond 2x2 not supported"
                    )
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            if progressive and any(c["h"] != 1 or c["v"] != 1 for c in comps):
                raise NotImplementedError(
                    "decode_jpeg: subsampled progressive not supported"
                )
            sof = {"width": w, "height": h, "components": comps}
            max_h = max(c["h"] for c in comps)
            max_v = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * max_h))
            mcus_y = -(-h // (8 * max_v))
            geom = (max_h, max_v, mcus_x, mcus_y)
            store = [
                np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "decode_jpeg: only sequential (SOF0/1) and progressive (SOF2) "
                "Huffman frames are supported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("decode_jpeg: truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — decode the scan, keep walking markers
            if sof is None or store is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            if not seg:
                raise ValueError("decode_jpeg: empty SOS segment")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("decode_jpeg: truncated SOS segment")
            scan = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i : 3 + 2 * i]
                scan.append({"id": cid, "dc": tabs >> 4, "ac": tabs & 0x0F})
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            pos = _decode_scan(
                buf, pos + 2 + seglen, sof, store, geom, scan,
                ss, se, ah, al, progressive,
                dc_maps, ac_maps, restart_interval,
            )
            n_scans += 1
            continue
        # APPn/COM and anything else: skipped
        pos = pos + 2 + seglen
    if sof is None or n_scans == 0:
        raise ValueError("decode_jpeg: missing SOF/SOS")

    w, h = sof["width"], sof["height"]
    ncomp = len(sof["components"])
    max_h, max_v, mcus_x, mcus_y = geom
    zig = np.array(ZIGZAG)
    cropped = []
    for ci, comp in enumerate(sof["components"]):
        if comp["tq"] not in qtables:
            raise ValueError("decode_jpeg: missing quantization table")
        q = qtables[comp["tq"]]
        grid_h, grid_w = store[ci].shape[:2]
        plane = np.empty((grid_h * 8, grid_w * 8), dtype=np.float64)
        for by in range(grid_h):
            for bx in range(grid_w):
                block = np.zeros(64, dtype=np.float64)
                block[zig] = store[ci][by, bx] * q
                spatial = _BASIS.T @ block.reshape(8, 8) @ _BASIS
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial + 128.0
        # crop to component resolution, upsample (nearest) to full frame
        cw = -(-w * comp["h"] // max_h)
        ch = -(-h * comp["v"] // max_v)
        p = plane[:ch, :cw]
        ry, rx = max_v // comp["v"], max_h // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        cropped.append(p[:h, :w])
    if ncomp == 1:
        pixels = np.clip(np.round(cropped[0]), 0, 255).astype(np.uint8)
    elif ncomp == 3:
        y, cb, cr = cropped
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bch = y + 1.772 * (cb - 128.0)
        pixels = np.clip(np.round(np.stack([r, g, bch], axis=-1)), 0, 255).astype(
            np.uint8
        )
    else:
        raise NotImplementedError("decode_jpeg: only 1 or 3 components")
    result = {
        "format": "jpeg",
        "width": w,
        "height": h,
        "n_channels": ncomp,
        "progressive": progressive,
        "restart_interval": restart_interval,
        "pixels": pixels,
    }
    if keep_coeffs:
        result["coeffs"] = store
    return result


def _decode_scan(
    buf, pos, sof, store, geom, scan, ss, se, ah, al, progressive,
    dc_maps, ac_maps, restart_interval,
):
    """Decode one entropy-coded scan into the coefficient store; returns
    the buffer position of the next marker. Handles sequential full
    scans, progressive interleaved DC scans (first + refinement bits),
    and progressive non-interleaved AC band scans with EOB runs."""
    by_id = {c["id"]: i for i, c in enumerate(sof["components"])}
    scomps = []
    for s in scan:
        i = by_id.get(s["id"])
        if i is None:
            raise ValueError("decode_jpeg: scan references unknown component")
        sc = sof["components"][i]
        rec = {"idx": i, "h": sc["h"], "v": sc["v"]}
        if ss == 0:  # needs a DC table
            if s["dc"] not in dc_maps and ah == 0:
                raise ValueError("decode_jpeg: missing Huffman table")
            rec["dc"] = dc_maps.get(s["dc"])
        if se > 0:  # needs an AC table
            if s["ac"] not in ac_maps:
                raise ValueError("decode_jpeg: missing Huffman table")
            rec["ac"] = ac_maps[s["ac"]]
        scomps.append(rec)
    max_h, max_v, mcus_x, mcus_y = geom
    reader = _BitReader(buf, pos)
    rst = 0

    def decode_band(coef, comp, k0, k1, shift):
        k = k0
        while k <= k1:
            sym = reader.read_symbol(comp["ac"])
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: run of (2^run - 1 + extra) further all-done blocks
                return (1 << run) - 1 + (reader.read_bits(run) if run else 0)
            k += run
            if k > k1:
                raise ValueError("decode_jpeg: AC coefficient index overflow")
            coef[k] = _extend(reader.read_bits(size), size) << shift
            k += 1
        return 0

    if ss == 0 and (se == 63 or (not progressive)):
        # sequential full scan: interleaved, DC + all ACs per block
        if progressive:
            raise ValueError("decode_jpeg: progressive scan cannot span 0..63")
        dc_pred = [0] * len(scomps)
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                reader.sync_restart(rst)
                rst += 1
                dc_pred = [0] * len(scomps)
            my, mx = divmod(m, mcus_x)
            for ci, comp in enumerate(scomps):
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        coef = store[comp["idx"]][my * comp["v"] + v, mx * comp["h"] + hh]
                        size = reader.read_symbol(comp["dc"])
                        dc_pred[ci] += _extend(reader.read_bits(size), size)
                        coef[0] = dc_pred[ci]
                        decode_band(coef, comp, 1, 63, 0)
    elif ss == 0:
        # progressive DC scan (interleaved; 1x1 sampling enforced at SOF)
        if se != 0:
            raise ValueError("decode_jpeg: progressive DC scan must cover 0..0")
        dc_pred = [0] * len(scomps)
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                reader.sync_restart(rst)
                rst += 1
                dc_pred = [0] * len(scomps)
            my, mx = divmod(m, mcus_x)
            for ci, comp in enumerate(scomps):
                coef = store[comp["idx"]][my, mx]
                if ah == 0:  # first pass: diff-coded, scaled by 2^al
                    size = reader.read_symbol(comp["dc"])
                    dc_pred[ci] += _extend(reader.read_bits(size), size)
                    coef[0] = dc_pred[ci] << al
                else:  # refinement: one raw bit per block
                    if reader.read_bit():
                        coef[0] |= 1 << al
    elif ah == 0:
        # progressive AC band scan, first pass: non-interleaved, one component
        if len(scomps) != 1:
            raise ValueError("decode_jpeg: AC scans must be non-interleaved")
        comp = scomps[0]
        grid_h, grid_w = store[comp["idx"]].shape[:2]
        eobrun = 0
        for b in range(grid_h * grid_w):
            if restart_interval and b and b % restart_interval == 0:
                reader.sync_restart(rst)
                rst += 1
                eobrun = 0
            if eobrun > 0:
                eobrun -= 1
                continue
            by, bx = divmod(b, grid_w)
            eobrun = decode_band(store[comp["idx"]][by, bx], comp, ss, se, al)
    else:
        # AC successive-approximation refinement scan (T.81 G.1.2.3):
        # each previously-nonzero coefficient in the band receives one
        # correction bit; newly significant coefficients arrive as
        # (run, size=1) symbols whose appended bit is the SIGN; EOB runs
        # cover blocks with no new nonzeroes, but their already-nonzero
        # coefficients still consume correction bits in stream order.
        if len(scomps) != 1:
            raise ValueError("decode_jpeg: AC scans must be non-interleaved")
        comp = scomps[0]
        grid_h, grid_w = store[comp["idx"]].shape[:2]
        p1, m1 = 1 << al, -1 << al
        eobrun = 0
        for b in range(grid_h * grid_w):
            if restart_interval and b and b % restart_interval == 0:
                reader.sync_restart(rst)
                rst += 1
                eobrun = 0
            by, bx = divmod(b, grid_w)
            coef = store[comp["idx"]][by, bx]

            def refine_nonzero(k):
                # correction bit: set this scan's magnitude bit unless
                # a bit at this position was already set
                if reader.read_bit() and not (int(coef[k]) & p1):
                    coef[k] += p1 if coef[k] >= 0 else m1

            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = reader.read_symbol(comp["ac"])
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0 and run != 15:  # EOBn (covers THIS block too)
                        eobrun = (1 << run) + (reader.read_bits(run) if run else 0)
                        break
                    if size:
                        if size != 1:
                            raise ValueError(
                                "decode_jpeg: refinement symbols must have size 1"
                            )
                        newval = p1 if reader.read_bit() else m1
                    else:
                        newval = 0  # ZRL: 16 zero-history positions, no new coef
                    # advance over `run` zero-history coefficients, refining
                    # the already-nonzero ones passed over
                    while k <= se:
                        if coef[k] != 0:
                            refine_nonzero(k)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError(
                                "decode_jpeg: refinement coefficient overflow"
                            )
                        coef[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:  # tail of this block: correction bits only
                    if coef[k] != 0:
                        refine_nonzero(k)
                    k += 1
                eobrun -= 1
    return reader.pos


def jpeg_gray_coeffs(buf: bytes):
    """Decode a grayscale JPEG to (meta, (n_blocks, 64) int32 quantized
    zigzag-order coefficients) — the coefficient-domain companion the
    refinement catalog query consumes (pixel-domain oracles would need
    an IDCT the SQL replay can't express exactly)."""
    m = decode_jpeg(buf, keep_coeffs=True)
    if m["n_channels"] != 1:
        raise ValueError("jpeg_gray_coeffs: not a grayscale stream")
    meta = {k: v for k, v in m.items() if k not in ("pixels", "coeffs")}
    grid = m["coeffs"][0]
    return meta, grid.reshape(-1, 64)


def jpeg_gray_pixels(buf: bytes):
    """Decode a grayscale baseline JPEG to (meta, (n_pixels,) uint8) —
    the sampling companion the catalog decode query consumes."""
    m = decode_jpeg(buf)
    if m["n_channels"] != 1:
        raise ValueError("jpeg_gray_pixels: not a grayscale stream")
    meta = {k: v for k, v in m.items() if k != "pixels"}
    return meta, m["pixels"].reshape(-1)
