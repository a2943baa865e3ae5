"""IMA/DVI ADPCM (round 13): the 4-bit adaptive-delta codec of
telephony-era and embedded audio corpora — nibble kernel, encoder, and
the Microsoft WAV container framing (format tag 0x0011, block headers
carrying the raw first sample + step index).

Referee: CPython's ``audioop`` (in-container on 3.11) implements the
same Intel/DVI algorithm with its own C tables —
tests/test_adpcm.py pins the nibble kernel and the encoder
byte-for-byte against ``audioop.adpcm2lin`` / ``lin2adpcm`` across
random streams, and re-EXTRACTS the step table from audioop
behaviorally (two probe nibbles at each index recover the exact step:
decode(d=4) − decode(d=0) = step) so a mistyped table entry cannot
survive. The WAV block framing is from the MS/IMA spec with a
roundtrip + boundary tests (audioop has no block layer).

Boundaries (loud): nibbles outside 0-15, non-0x0011 WAV format tags,
truncated blocks, >2 channels. Stereo closed in-round: the MS/IMA
4-byte-word interleave decodes with per-channel predictor/index
state (pinned by a roundtrip test against the mono-verified kernel).
"""

from __future__ import annotations

import struct

#: IMA step table (89 entries) — spec DATA, extracted behaviorally
#: from audioop (see module docstring) and re-verified by the tests.
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]

#: index adjustment by the magnitude bits of the nibble (d & 7)
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def ima_adpcm_decode(
    nibbles, predictor: int = 0, index: int = 0
) -> tuple[list[int], tuple[int, int]]:
    """Decode a nibble sequence (ints 0-15) from an explicit
    (predictor, index) state — one int16 sample per nibble, plus the
    final state. Bit-exact with audioop.adpcm2lin (pinned)."""
    if not 0 <= index <= 88:
        raise ValueError(f"adpcm: step index {index} out of 0..88")
    pred, idx = predictor, index
    out = []
    for d in nibbles:
        if not 0 <= d <= 15:
            raise ValueError(f"adpcm: nibble {d} out of 0..15")
        step = STEP_TABLE[idx]
        vpdiff = step >> 3
        if d & 4:
            vpdiff += step
        if d & 2:
            vpdiff += step >> 1
        if d & 1:
            vpdiff += step >> 2
        pred = _clamp16(pred - vpdiff if d & 8 else pred + vpdiff)
        idx = min(max(idx + INDEX_TABLE[d & 7], 0), 88)
        out.append(pred)
    return out, (pred, idx)


def ima_adpcm_encode(
    samples, predictor: int = 0, index: int = 0
) -> tuple[list[int], tuple[int, int]]:
    """Encode int16 samples to nibbles from an explicit state —
    the standard IMA quantizer (successive step subtraction), then
    the decoder's reconstruction to keep encoder/decoder state in
    lockstep. Bit-exact with audioop.lin2adpcm (pinned)."""
    if not 0 <= index <= 88:
        raise ValueError(f"adpcm: step index {index} out of 0..88")
    pred, idx = predictor, index
    out = []
    for s in samples:
        step = STEP_TABLE[idx]
        delta = s - pred
        d = 0
        if delta < 0:
            d = 8
            delta = -delta
        if delta >= step:
            d |= 4
            delta -= step
        if delta >= step >> 1:
            d |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            d |= 1
        # reconstruct exactly as the decoder will
        vpdiff = step >> 3
        if d & 4:
            vpdiff += step
        if d & 2:
            vpdiff += step >> 1
        if d & 1:
            vpdiff += step >> 2
        pred = _clamp16(pred - vpdiff if d & 8 else pred + vpdiff)
        idx = min(max(idx + INDEX_TABLE[d & 7], 0), 88)
        out.append(d)
    return out, (pred, idx)


def pack_nibbles_low_first(nibbles) -> bytes:
    """WAV IMA data bytes: first nibble of each pair in the LOW half
    (the opposite of audioop's high-first packing)."""
    if len(nibbles) % 2:
        raise ValueError("adpcm: odd nibble count cannot pack")
    return bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )


def unpack_nibbles_low_first(data: bytes) -> list[int]:
    out = []
    for b in data:
        out.append(b & 0xF)
        out.append(b >> 4)
    return out


def wav_ima_build(
    samp0,
    index0,
    nibbles,
    sample_rate: int = 8000,
) -> bytes:
    """One-block IMA-ADPCM WAV: RIFF/WAVE with fmt tag 0x0011, the
    required ``fact`` chunk (total per-channel sample count), and a
    single data block. Mono (ints/one nibble list): 4-byte header
    (samp0 int16, step index uint8, pad) + low-nibble-first packed
    deltas. Stereo (2-element lists): one 4-byte header per channel,
    then the MS/IMA interleave — alternating 4-byte words (8
    nibbles) per channel, so per-channel nibble counts must be equal
    multiples of 8."""
    if isinstance(samp0, int):
        samp0, index0, nibbles = [samp0], [index0], [nibbles]
    channels = len(samp0)
    if channels not in (1, 2):
        raise NotImplementedError(
            f"adpcm: {channels}-channel build unsupported"
        )
    for s in samp0:
        if not -32768 <= s <= 32767:
            raise ValueError(f"adpcm: samp0 {s} out of int16")
    header = b"".join(
        struct.pack("<hBB", samp0[c], index0[c], 0)
        for c in range(channels)
    )
    if channels == 1:
        body = pack_nibbles_low_first(nibbles[0])
        n_per_ch = len(nibbles[0])
    else:
        if len(nibbles[0]) != len(nibbles[1]) or \
                len(nibbles[0]) % 8:
            raise ValueError(
                "adpcm: stereo nibble streams must be equal-length "
                "multiples of 8"
            )
        n_per_ch = len(nibbles[0])
        words = []
        for w in range(0, n_per_ch, 8):
            for c in range(2):
                words.append(
                    pack_nibbles_low_first(nibbles[c][w: w + 8]))
        body = b"".join(words)
    data = header + body
    block_align = len(data)
    n_samples = 1 + n_per_ch  # per channel
    samples_per_block = (block_align - 4 * channels) * 2 \
        // channels + 1
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, channels, sample_rate,
        sample_rate * block_align // samples_per_block or 1,
        block_align, 4, 2, samples_per_block,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_samples)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_ima_decode(buf: bytes) -> dict:
    """Decode a mono or stereo IMA-ADPCM WAV: {"sample_rate",
    "channels", "samples"} — ``samples`` is one list (mono) or a
    2-list of per-channel lists (stereo; round 13 closed the stereo
    boundary: 4-byte words de-interleave per channel, each channel's
    predictor/index state threads across its own words). Loud: bad
    RIFF framing, format tags other than 0x0011, >2 channels,
    truncated blocks; the sample count a fact chunk truncates is
    honored (the spec's way to end mid-block)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("adpcm: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    fact_samples = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8: pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"adpcm: chunk {cid!r} truncated")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("adpcm: missing fmt /data chunk")
    tag, channels, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0)
    if tag != 0x0011:
        raise NotImplementedError(
            f"adpcm: WAV format tag {tag:#06x} unsupported "
            "(IMA ADPCM 0x0011 only)"
        )
    if channels not in (1, 2):
        raise NotImplementedError(
            f"adpcm: {channels}-channel IMA WAV unsupported "
            "(mono/stereo only)"
        )
    if bits != 4:
        raise ValueError(f"adpcm: bits-per-sample {bits} != 4")
    if block_align <= 4 * channels:
        raise ValueError(
            f"adpcm: blockAlign {block_align} cannot hold the "
            f"{4 * channels}-byte block header"
        )
    per_ch: list[list[int]] = [[] for _ in range(channels)]
    for off in range(0, len(data), block_align):
        block = data[off: off + block_align]
        if len(block) < 4 * channels:
            raise ValueError("adpcm: data block shorter than header")
        states = []
        for c in range(channels):
            samp0, index0, pad = struct.unpack_from(
                "<hBB", block, 4 * c)
            if pad != 0:
                raise ValueError(
                    f"adpcm: block header pad {pad} != 0")
            per_ch[c].append(samp0)
            states.append((samp0, index0))
        body = block[4 * channels:]
        if channels == 1:
            decoded, _ = ima_adpcm_decode(
                unpack_nibbles_low_first(body), *states[0])
            per_ch[0].extend(decoded)
        else:
            if len(body) % 8:
                raise ValueError(
                    "adpcm: stereo block body is not whole 4-byte "
                    "word pairs"
                )
            for w in range(0, len(body), 8):
                for c in range(2):
                    nibs = unpack_nibbles_low_first(
                        body[w + 4 * c: w + 4 * c + 4])
                    decoded, states[c] = ima_adpcm_decode(
                        nibs, *states[c])
                    per_ch[c].extend(decoded)
    if fact_samples is not None:
        if any(fact_samples > len(ch) for ch in per_ch):
            raise ValueError(
                f"adpcm: fact declares {fact_samples} samples, "
                f"blocks hold {min(len(ch) for ch in per_ch)}"
            )
        per_ch = [ch[:fact_samples] for ch in per_ch]
    return {
        "sample_rate": rate,
        "channels": channels,
        "samples": per_ch[0] if channels == 1 else per_ch,
    }
