"""Real (non-stubbed) media decoding for struct-parseable formats.

BMP and WAV carry their dimensions/sample geometry in fixed binary headers,
so they decode with pure ``struct`` — no codec library — exactly like the
ESRI shapefile reader (cam_etl_spark/sources/shapefile.py) parses .shp/.dbf.
Compressed codecs (JPEG/PNG/MP3/H.264) genuinely need external libraries
that are not in this container and stay behind ``NotImplementedError``.

Encoders exist so tests and catalog fixtures can synthesize REAL files the
decoder must round-trip; they write the minimal standards-compliant form
(BITMAPINFOHEADER 24-bit BMP; PCM RIFF/WAVE).
"""

from __future__ import annotations

import struct

BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def bmp_row_size(width: int, bits_per_pixel: int = 24) -> int:
    """BMP pixel rows are padded to 4-byte boundaries."""
    return ((width * bits_per_pixel + 31) // 32) * 4


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 24-bit bottom-up BMP. ``pixels`` is tiled/truncated to fill
    the padded pixel array deterministically."""
    if width <= 0 or height <= 0:
        raise ValueError("encode_bmp: width/height must be positive")
    rsize = bmp_row_size(width)
    need = rsize * height
    fill = (pixels * (need // max(len(pixels), 1) + 1))[:need] if pixels else b"\x00" * need
    header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_SIZE + need, 0, 0, BMP_HEADER_SIZE
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, need, 2835, 2835, 0, 0)
    return header + fill


def decode_bmp(buf: bytes) -> dict:
    """Parse a BMP header (BITMAPINFOHEADER or later, which share the first
    six fields). Returns format geometry; raises ValueError on malformed
    input rather than guessing."""
    if len(buf) < BMP_HEADER_SIZE or buf[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP payload")
    file_size, _, _, pixel_off = struct.unpack_from("<IHHI", buf, 2)
    dib_size, width, height, planes, bpp = struct.unpack_from("<IiiHH", buf, 14)
    if dib_size < 40:
        raise ValueError(f"decode_bmp: unsupported DIB header size {dib_size}")
    compression = struct.unpack_from("<I", buf, 30)[0]
    return {
        "format": "bmp",
        "width": width,
        "height": abs(height),  # negative height = top-down row order
        "bits_per_pixel": bpp,
        "n_channels": max(bpp // 8, 1),
        "compression": compression,
        "pixel_offset": pixel_off,
        "file_size": file_size,
    }


def encode_wav(
    n_frames: int,
    sample_rate: int = 8000,
    n_channels: int = 1,
    bits_per_sample: int = 16,
    samples: bytes = b"",
) -> bytes:
    """Minimal PCM RIFF/WAVE file; ``samples`` tiled/truncated to the data
    size implied by the frame geometry."""
    block_align = n_channels * bits_per_sample // 8
    data_size = n_frames * block_align
    fill = (
        (samples * (data_size // max(len(samples), 1) + 1))[:data_size]
        if samples
        else b"\x00" * data_size
    )
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits_per_sample,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + data_size, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", data_size)
        + fill
    )


def decode_wav(buf: bytes) -> dict:
    """Walk RIFF chunks for ``fmt `` and ``data``; PCM and any chunk order
    accepted (fact-of-life WAVs put LIST/INFO chunks before data)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(buf):
        cid, csize = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    n_frames = data_size // block_align if block_align else 0
    return {
        "format": "wav",
        "audio_format": audio_format,
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "duration_s": n_frames / sample_rate if sample_rate else 0.0,
    }


def sniff_format(buf: bytes) -> str | None:
    """Cheap magic-byte dispatch; None for anything we can't decode without
    a codec library."""
    if buf is None:
        return None
    if buf[:2] == b"BM" and len(buf) >= BMP_HEADER_SIZE:
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return "avi"
    return None


def decode_payload(buf: bytes) -> dict:
    """Decode any struct-parseable payload; NotImplementedError for formats
    that need a real codec library (honest stub boundary — JPEG/PNG/MP3
    et al. cannot be decoded from headers alone)."""
    kind = sniff_format(buf)
    if kind == "bmp":
        return decode_bmp(buf)
    if kind == "wav":
        return decode_wav(buf)
    if kind == "avi":
        return decode_avi(buf)
    raise NotImplementedError(
        "media codecs are not available in this environment for compressed "
        "formats; only BMP, PCM WAV, and uncompressed AVI decode natively"
    )


def wav_data_chunk(buf: bytes) -> tuple[dict, bytes]:
    """Locate the PCM ``data`` chunk alongside the parsed geometry — the
    sample-level companion to decode_wav (which only reports geometry)."""
    meta = decode_wav(buf)
    pos = 12
    while pos + 8 <= len(buf):
        cid, csize = struct.unpack_from("<4sI", buf, pos)
        if cid == b"data":
            return meta, buf[pos + 8 : pos + 8 + csize]
        pos += 8 + csize + (csize & 1)
    raise ValueError("wav_data_chunk: missing data chunk")


def wav_samples(buf: bytes):
    """Decode 16-bit PCM samples to an int16 numpy array (interleaved
    channels, frame-major — the on-disk order). Real DSP input, no codec
    library: the data chunk IS the waveform for PCM."""
    import numpy as np

    meta, data = wav_data_chunk(buf)
    if meta["audio_format"] != 1 or meta["bits_per_sample"] != 16:
        raise NotImplementedError("wav_samples: only 16-bit PCM")
    usable = len(data) - (len(data) % 2)
    return meta, np.frombuffer(data[:usable], dtype="<i2")


def bmp_pixels(buf: bytes):
    """Decode an uncompressed 24-bit BMP pixel array to an (n_pixels, 3)
    uint8 numpy matrix in B,G,R channel order, row padding stripped."""
    import numpy as np

    meta = decode_bmp(buf)
    if meta["compression"] != 0 or meta["bits_per_pixel"] != 24:
        raise NotImplementedError("bmp_pixels: only uncompressed 24-bit")
    w, h = meta["width"], meta["height"]
    rsize = bmp_row_size(w)
    arr = np.frombuffer(buf, dtype=np.uint8, count=rsize * h, offset=meta["pixel_offset"])
    return meta, arr.reshape(h, rsize)[:, : w * 3].reshape(-1, 3)


def encode_avi(
    width: int,
    height: int,
    n_frames: int,
    fps: int = 10,
    pixels: bytes = b"",
) -> bytes:
    """Minimal standards-compliant uncompressed AVI: RIFF('AVI ') with an
    hdrl LIST (avih + one 'vids' stream) and a movi LIST of '00db' DIB
    frames (bottom-up BGR rows, 4-byte padded, like BMP). Frame f's pixel
    bytes are ``pixels`` tiled with a per-frame rotation (offset f into the
    seed) so frames differ deterministically."""
    rsize = bmp_row_size(width)
    fsize = rsize * height

    def frame_fill(f: int) -> bytes:
        if not pixels:
            return b"\x00" * fsize
        rot = pixels[f % len(pixels):] + pixels[: f % len(pixels)]
        return (rot * (fsize // len(rot) + 1))[:fsize]

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        fsize * fps,       # dwMaxBytesPerSec
        0, 0,              # padding, flags (no idx1 chunk is written, so
                           # AVIF_HASINDEX must stay unset for spec readers)
        n_frames, 0, 1, fsize, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n_frames, fsize, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, fsize, 2835, 2835, 0, 0
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", frame_fill(f)) for f in range(n_frames)))
    riff_body = b"AVI " + hdrl + movi
    return struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body


def decode_avi(buf: bytes) -> dict:
    """Walk the RIFF/AVI chunk tree: avih header geometry + the byte
    offsets of every '00db'/'00dc' frame in the movi LIST."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("decode_avi: not a RIFF/AVI payload")
    meta: dict = {"format": "avi", "frame_offsets": [], "frame_sizes": []}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid, csize = struct.unpack_from("<4sI", buf, pos)
            body0 = pos + 8
            if cid == b"LIST":
                kind = buf[body0 : body0 + 4]
                walk(body0 + 4, body0 + csize)
            elif cid == b"avih" and csize >= 40:
                (usec, _, _, _, total, _, _streams, _bufsz, w, h) = struct.unpack_from(
                    "<10I", buf, body0
                )
                meta.update(
                    width=w,
                    height=h,
                    n_frames=total,
                    fps=(1_000_000 // usec if usec else 0),
                )
            elif cid in (b"00db", b"00dc"):
                meta["frame_offsets"].append(body0)
                meta["frame_sizes"].append(csize)
            pos = body0 + csize + (csize & 1)

    walk(12, len(buf))
    if "width" not in meta:
        raise ValueError("decode_avi: missing avih header")
    return meta


def avi_frame_pixels(buf: bytes, frame_index: int, meta: dict | None = None):
    """Pixel matrix (n_pixels, 3) uint8 BGR for one frame of an
    uncompressed AVI — same row-padding strip as bmp_pixels. Pass the
    ``decode_avi`` result as ``meta`` to skip re-walking the container
    per frame (the sampler fetches several frames per payload)."""
    import numpy as np

    if meta is None:
        meta = decode_avi(buf)
    off = meta["frame_offsets"][frame_index]
    w, h = meta["width"], meta["height"]
    rsize = bmp_row_size(w)
    arr = np.frombuffer(buf, dtype=np.uint8, count=rsize * h, offset=off)
    return meta, arr.reshape(h, rsize)[:, : w * 3].reshape(-1, 3)
