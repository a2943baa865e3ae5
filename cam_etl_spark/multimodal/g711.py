"""G.711 companded audio (ITU-T G.711 µ-law / A-law) — closed-form
expansion and compression, no tables: both laws are 3-bit exponent +
4-bit mantissa segment codecs whose decode is pure integer arithmetic.
Calibrated EXHAUSTIVELY (all 256 codes per law) against CPython's
audioop — an independent reference implementation — in
tests/test_multimodal_g711.py.

Sign conventions (the only non-obvious bits, pinned by the exhaustive
check): µ-law transmits the code bit-inverted and its sign bit set
means NEGATIVE after inversion; A-law XORs with 0x55 and its sign bit
set means POSITIVE. µ-law decodes to ±32124 max, A-law to ±32256
(13-bit magnitudes << 3), matching audioop's 16-bit scaling.

WAV carriage: format code 7 (µ-law) / 6 (A-law), 8 bits per sample —
`decode_wav_g711` walks the same RIFF chunk layout as codecs.decode_wav
and expands the payload to int16 PCM.
"""

from __future__ import annotations

import struct


def ulaw_decode_byte(u: int) -> int:
    c = ~u & 0xFF
    e = (c >> 4) & 7
    m = c & 0xF
    mag = (((m << 3) + 0x84) << e) - 0x84
    return -mag if c & 0x80 else mag


def alaw_decode_byte(a: int) -> int:
    c = a ^ 0x55
    e = (c >> 4) & 7
    m = c & 0xF
    mag = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return mag if c & 0x80 else -mag


#: decode tables derived at import from the closed forms — the codec
#: itself stays table-free; these are just the 256-entry memo.
ULAW_TABLE = [ulaw_decode_byte(i) for i in range(256)]
ALAW_TABLE = [alaw_decode_byte(i) for i in range(256)]


def ulaw_encode(pcm: int) -> int:
    """Inverse quantizer: nearest-code compression (matches the decode
    tables by construction — encode(x) decodes to the segment value
    for x, exact round-trip for values ON the table)."""
    sign = 0x80 if pcm < 0 else 0
    mag = min(-pcm if pcm < 0 else pcm, 32635) + 0x84
    e = mag.bit_length() - 8  # top bit position above the 7-bit base
    m = (mag >> (e + 3)) & 0xF
    return (~(sign | (e << 4) | m)) & 0xFF


def alaw_encode(pcm: int) -> int:
    sign = 0x80 if pcm >= 0 else 0
    mag = min(pcm if pcm >= 0 else -pcm, 32767)
    mag >>= 3  # 13-bit domain
    if mag < 32:
        e, m = 0, mag >> 1
    else:
        e = mag.bit_length() - 5
        m = (mag >> e) & 0xF
    return (sign | (e << 4) | m) ^ 0x55


def decode_wav_g711(buf: bytes) -> dict:
    """RIFF/WAVE with fmt code 6 (A-law) or 7 (µ-law): expand the data
    chunk to int16 PCM. Returns geometry + the decoded samples."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("decode_wav_g711: not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, csize = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("decode_wav_g711: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format not in (6, 7):
        raise ValueError(
            f"decode_wav_g711: fmt code {audio_format} is not G.711"
        )
    if bits != 8:
        raise ValueError("decode_wav_g711: G.711 is 8 bits per sample")
    table = ALAW_TABLE if audio_format == 6 else ULAW_TABLE
    samples = [table[b] for b in data]
    return {
        "law": "alaw" if audio_format == 6 else "ulaw",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "samples": samples,
    }


def encode_wav_g711(
    codes: bytes, law: str, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Fixture synthesis: wrap raw G.711 code bytes in a minimal WAV."""
    fmt_code = 6 if law == "alaw" else 7
    fmt = struct.pack(
        "<HHIIHH", fmt_code, n_channels, sample_rate,
        sample_rate * n_channels, n_channels, 8,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(codes), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(codes))
        + codes
        + (b"\x00" if len(codes) & 1 else b"")
    )
