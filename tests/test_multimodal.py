"""Multimodal binary-column plumbing: schema, Arrow batch shape, determinism."""

import pytest


def test_decode_media_deterministic(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import decode_media, documents_as_media

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = documents_as_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    out1 = {r["media_id"]: (r["checksum"], r["width"], r["height"]) for r in decode_media(media).collect()}
    out2 = {r["media_id"]: (r["checksum"], r["width"], r["height"]) for r in decode_media(media.repartition(7)).collect()}
    assert out1 == out2  # partitioning must not change results
    w, h = next(iter(out1.values()))[1:]
    assert 1 <= w <= 1920 and 1 <= h <= 1080


def test_real_decode_compressed_codecs_stay_stubbed():
    """Formats needing a codec library still raise; the honest stub
    boundary is now MP3/H.264 only. A JPEG magic
    dispatches to the REAL baseline decoder, so a garbage body is a
    malformed-stream ValueError, not a stub."""
    from cam_etl_spark.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image")
    with pytest.raises(NotImplementedError):
        real_decode(b"ID3\x04" + b"\x00" * 60, "audio")  # MP3 magic
    with pytest.raises(ValueError):
        real_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 60, "image")  # junk JPEG


def test_bmp_codec_roundtrip():
    from cam_etl_spark.multimodal.codecs import (
        bmp_row_size,
        decode_bmp,
        encode_bmp,
    )

    buf = encode_bmp(5, 3, b"\x01\x02\x03")
    meta = decode_bmp(buf)
    assert meta["format"] == "bmp"
    assert (meta["width"], meta["height"], meta["bits_per_pixel"]) == (5, 3, 24)
    assert meta["file_size"] == len(buf) == 54 + bmp_row_size(5) * 3
    assert bmp_row_size(5) == 16  # 5 px * 3 B = 15 -> padded to 16
    with pytest.raises(ValueError):
        decode_bmp(buf[:10])
    with pytest.raises(ValueError):
        encode_bmp(0, 3, b"")


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    from cam_etl_spark.multimodal.codecs import decode_wav, encode_wav

    buf = encode_wav(n_frames=100, sample_rate=16000, n_channels=2, bits_per_sample=16)
    meta = decode_wav(buf)
    assert meta["format"] == "wav" and meta["audio_format"] == 1
    assert (meta["n_channels"], meta["sample_rate"], meta["bits_per_sample"]) == (2, 16000, 16)
    assert meta["n_frames"] == 100 and meta["duration_s"] == 100 / 16000
    assert len(buf) == 44 + 100 * 4

    # odd-sized unknown chunk before fmt/data: the walk must skip it with
    # word alignment (real WAVs carry LIST/INFO chunks in front)
    inner = buf[12:]
    odd = struct.pack("<4sI", b"JUNK", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    crafted = struct.pack("<4sI4s", b"RIFF", 4 + len(odd) + len(inner), b"WAVE") + odd + inner
    assert decode_wav(crafted)["n_frames"] == 100
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks


def test_real_decode_dispatches_on_magic():
    from cam_etl_spark.multimodal import real_decode
    from cam_etl_spark.multimodal.codecs import encode_bmp, encode_wav

    assert real_decode(encode_bmp(4, 4, b"x"), "image")["width"] == 4
    assert real_decode(encode_wav(8, 8000), "audio")["n_frames"] == 8


def test_struct_media_e2e_decode_matches_generator(spark, sf_dir):
    """End-to-end: synthesize real BMP/WAV files from documents, decode the
    BINARY HEADERS back, and check every field against the generator's
    doc_id formulas (the same formulas the catalog oracle pins)."""
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import decode_media_struct, synthesize_struct_media

    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = decode_media_struct(synthesize_struct_media(docs)).collect()
    assert len(out) == 40
    for r in out:
        d = r["media_id"]
        if d % 2 == 0:
            row = ((d % 31 + 1) * 3 + 3) // 4 * 4
            assert r["format"] == "bmp"
            assert (r["width"], r["height"], r["n_channels"]) == (d % 31 + 1, d % 17 + 1, 3)
            assert r["n_bytes"] == 54 + row * (d % 17 + 1)
            assert r["sample_rate"] is None and r["duration_s"] is None
        else:
            sr, nf, nc = 8000 * (d % 3 + 1), d % 100 + 1, (d >> 1) % 2 + 1
            assert r["format"] == "wav"
            assert (r["n_channels"], r["sample_rate"], r["n_frames"]) == (nc, sr, nf)
            assert r["n_bytes"] == 44 + nf * nc * 2
            assert r["duration_s"] == nf / sr
            assert r["width"] is None and r["height"] is None


def test_resize_contract(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import documents_as_media, resize_media

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(20))
    out = resize_media(media, 64, 32).collect()
    assert len(out) == 20
    assert all(r["width"] == 64 and r["height"] == 32 for r in out)
    assert all(len(r["payload"]) == 64 * 32 for r in out)
    # deterministic: same input -> same surrogate payload
    again = {r["media_id"]: bytes(r["payload"]) for r in resize_media(media, 64, 32).collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in out)


def test_frame_sample_fanout(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import documents_as_media, sample_frames

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(50))
    frames = sample_frames(media, max_frames=8).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert len(by_media) == 50
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # 0..n-1 per media
        assert 1 <= len(idxs) <= 8


def test_feature_extract_feeds_ann(spark, sf_dir):
    from cam_etl_spark.io import load_table
    from cam_etl_spark.multimodal import documents_as_media, extract_features
    from cam_etl_spark.operators.similarity import knn_brute_cosine

    media = documents_as_media(load_table(spark, sf_dir, "documents").limit(100))
    feats = extract_features(media, dim=16)
    row = feats.first()
    assert len(row["embedding"]) == 16
    assert all(0.0 <= v < 1.0 for v in row["embedding"])
    out = knn_brute_cosine(feats, feats.filter("media_id < 3"), k=3,
                           id_col="media_id", vec_col="embedding")
    got = out.collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    assert all(r["neighbor_id"] != r["query_id"] for r in got)


def test_wav_samples_roundtrip_and_sign():
    import numpy as np
    import struct as st

    from cam_etl_spark.multimodal.codecs import encode_wav, wav_samples

    # known int16 pattern incl. negatives and extremes
    vals = [0, 1, -1, 32767, -32768, 12345, -12345, 255]
    raw = st.pack("<8h", *vals)
    buf = encode_wav(n_frames=8, sample_rate=8000, n_channels=1, samples=raw)
    meta, s = wav_samples(buf)
    assert meta["n_frames"] == 8
    assert s.dtype == np.int16 and list(s) == vals

    # tiling: 3 frames stereo = 12 bytes from a 4-byte seed
    buf2 = encode_wav(n_frames=3, n_channels=2, samples=st.pack("<2h", 7, -7))
    _, s2 = wav_samples(buf2)
    assert list(s2) == [7, -7] * 3


def test_bmp_pixels_strips_row_padding():
    import numpy as np

    from cam_etl_spark.multimodal.codecs import bmp_pixels, encode_bmp

    # width 3 -> 9 pixel bytes padded to 12 per row; pattern must survive
    px = bytes(range(1, 10))  # one row worth of B,G,R triples
    buf = encode_bmp(3, 2, px)
    meta, mat = bmp_pixels(buf)
    assert meta["width"] == 3 and meta["height"] == 2
    assert mat.shape == (6, 3)
    # row 0 is the seed tiled through padding; every value within byte range
    assert mat.dtype == np.uint8
    assert mat[0].tolist() == [1, 2, 3]


def test_bmp_gray_pixels_and_dhash_bands():
    from cam_etl_spark.multimodal.codecs import (
        bmp_gray_pixels,
        dhash_bands,
        encode_bmp,
    )

    W, H = 36, 32
    # deterministic grayscale gradient; rows stored bottom-up
    grid = [[(x * 3 + y * 5) % 256 for x in range(W)] for y in range(H)]
    stored = b"".join(
        bytes(b for g in row for b in (g, g, g)) for row in reversed(grid)
    )
    buf = encode_bmp(W, H, stored)
    w, h, gray = bmp_gray_pixels(buf)
    assert (w, h) == (W, H)
    assert gray == [g for row in grid for g in row]  # top-down recovery
    bands = dhash_bands(gray, w, h)
    assert len(bands) == 4 and all(0 <= b <= 0xFFFF for b in bands)
    # identical image -> identical hash; perturbing only the top two
    # pixel rows can only move cell-lattice row 0 = bits 0..15 = band 0
    grid2 = [[255 - g if y < 2 else g for g in row]
             for y, row in enumerate(grid)]
    gray2 = [g for row in grid2 for g in row]
    bands2 = dhash_bands(gray2, W, H)
    assert bands2[1:] == bands[1:]
    # non-grayscale pixel rejected
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="non-grayscale"):
        bmp_gray_pixels(bytes(bad))
    # geometry that doesn't divide the 9x8 lattice rejected
    with pytest.raises(ValueError, match="not divisible"):
        dhash_bands([0] * (35 * 32), 35, 32)


def test_avi_explicit_frames_and_gray_extraction():
    from cam_etl_spark.multimodal.codecs import (
        avi_gray_frames,
        encode_avi,
    )

    W, H, NF = 36, 32, 3
    grids = [
        [[(x * 3 + y * 5 + f * 11) % 256 for x in range(W)]
         for y in range(H)]
        for f in range(NF)
    ]
    frames = [
        b"".join(bytes(b for g in row for b in (g, g, g))
                 for row in reversed(grid))
        for grid in grids
    ]
    buf = encode_avi(W, H, NF, frames=frames)
    w, h, grays = avi_gray_frames(buf)
    assert (w, h, len(grays)) == (W, H, NF)
    for f in range(NF):
        assert grays[f] == [g for row in grids[f] for g in row]
    # wrong frame count / size rejected
    with pytest.raises(ValueError, match="frames must be"):
        encode_avi(W, H, NF, frames=frames[:2])
    with pytest.raises(ValueError, match="frames must be"):
        encode_avi(W, H, NF, frames=[frames[0], frames[1], frames[2][:-1]])
    # non-grayscale frame pixel rejected
    bad = bytearray(buf)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="non-grayscale"):
        avi_gray_frames(bytes(bad))


def test_media_signal_features_stats(spark):
    import math

    from cam_etl_spark.multimodal import media_signal_features, synthesize_struct_media

    docs = spark.createDataFrame(
        [(2, "even doc makes a bmp"), (3, "odd doc makes a wav"), (5, None)],
        "doc_id long, text string",
    )
    out = {r["media_id"]: r for r in media_signal_features(synthesize_struct_media(docs)).collect()}
    img, aud, aud_null = out[2], out[3], out[5]
    assert img["media_type"] == "image" and img["n_pixels"] == (2 % 31 + 1) * (2 % 17 + 1)
    assert all(0 <= img[c] <= 255 for c in ("mean_b", "mean_g", "mean_r"))
    assert aud["media_type"] == "audio"
    assert aud["n_samples"] == (3 % 100 + 1) * ((3 >> 1) % 2 + 1)
    assert 0 <= aud["rms"] <= 32768 and abs(aud["peak"]) <= 32768
    assert 0 <= aud["n_zero_cross"] < aud["n_samples"]
    # rms is consistent with peak
    assert aud["rms"] <= aud["peak"] + 1e-9
    # None text still decodes (md5 of empty string seeds the waveform)
    assert aud_null["media_type"] == "audio" and not math.isnan(aud_null["rms"])


def test_avi_roundtrip_and_frame_rotation():
    from cam_etl_spark.multimodal.codecs import (
        avi_frame_pixels,
        decode_avi,
        decode_payload,
        encode_avi,
        sniff_format,
    )

    seed = bytes(range(16))
    buf = encode_avi(3, 2, 5, fps=25, pixels=seed)
    assert sniff_format(buf) == "avi"
    m = decode_avi(buf)
    assert (m["width"], m["height"], m["n_frames"], m["fps"]) == (3, 2, 5, 25)
    assert len(m["frame_offsets"]) == 5
    assert decode_payload(buf)["format"] == "avi"
    # frame f's first pixel byte = seed[f % 16] (per-frame rotation)
    for f in range(5):
        _, px = avi_frame_pixels(buf, f)
        assert px.shape == (6, 3)
        assert px[0, 0] == seed[f % 16]


def test_avi_malformed_rejected():
    import pytest

    from cam_etl_spark.multimodal.codecs import decode_avi

    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")  # wrong fourcc
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00AVI ")  # no avih header


def test_sample_frames_real_even_spacing(spark):
    from cam_etl_spark.multimodal import sample_frames_real, synthesize_avi_media

    docs = spark.createDataFrame(
        [(6, "six frames eight wide"), (0, "two frames one wide"), (5, None)],
        "doc_id long, text string",
    )
    out = sample_frames_real(synthesize_avi_media(docs), max_frames=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["media_id"], []).append(r)
    # doc 6: n = 6%7+2 = 8 frames -> indices 0, 2, 4, 7
    assert sorted(r["frame_index"] for r in by_doc[6]) == [0, 2, 4, 7]
    # doc 0: n = 2 -> both frames
    assert sorted(r["frame_index"] for r in by_doc[0]) == [0, 1]
    for r in out:
        assert r["n_pixels"] == (r["media_id"] % 15 + 1) * (r["media_id"] % 9 + 1)
        assert all(0 <= r[c] <= 255 for c in ("mean_b", "mean_g", "mean_r"))


def test_sample_frames_real_zero_frame_avi_skipped(spark):
    from cam_etl_spark.multimodal import sample_frames_real
    from cam_etl_spark.multimodal.codecs import encode_avi

    rows = [
        (1, encode_avi(3, 2, 0)),          # valid container, zero frames
        (2, encode_avi(3, 2, 2, pixels=b"\x01\x02")),
        (3, b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames_real(df).collect()
    ids = {r["media_id"] for r in out}
    assert ids == {2}  # zero-frame and non-AVI rows skipped, job survives


def test_png_roundtrip_and_dispatch():
    from cam_etl_spark.multimodal.codecs import (
        decode_payload,
        decode_png,
        encode_png,
        png_pixels,
        sniff_format,
    )

    seed = bytes(range(16))
    buf = encode_png(3, 2, seed)
    assert sniff_format(buf) == "png"
    assert decode_payload(buf)["format"] == "png"
    m = decode_png(buf)
    assert (m["width"], m["height"]) == (3, 2)
    _, px = png_pixels(buf)
    assert px.shape == (6, 3)
    # row-major tiling: pixel byte j == seed[j % 16]
    flat = px.reshape(-1)
    assert all(int(flat[j]) == seed[j % 16] for j in range(18))


def test_png_unfilter_all_filter_types():
    import struct as st
    import zlib

    from cam_etl_spark.multimodal.codecs import PNG_SIG, decode_png

    # width 2 (stride 6), 4 rows exercising Sub, Up, Average, Paeth
    rows = [
        (1, [10, 20, 30, 5, 6, 7]),     # Sub:   10,20,30, 15,26,37
        (2, [1, 1, 1, 1, 1, 1]),        # Up:    11,21,31, 16,27,38
        (3, [4, 4, 4, 4, 4, 4]),        # Avg:   a=0/prev -> see expected
        (4, [2, 2, 2, 2, 2, 2]),        # Paeth
    ]
    raw = b"".join(bytes([f] + data) for f, data in rows)

    def chunk(ctype, data):
        return (st.pack(">I", len(data)) + ctype + data
                + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = st.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0)
    buf = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    pix = decode_png(buf)["pixels"]
    r1 = [10, 20, 30, 15, 26, 37]
    r2 = [v + 1 for v in r1]
    # Average: line[i] = 4 + (a + up)//2; first pixel a=0
    r3 = []
    for i in range(6):
        a = r3[i - 3] if i >= 3 else 0
        r3.append((4 + ((a + r2[i]) >> 1)) & 0xFF)
    # Paeth over (a, b=up, c=up-left)
    r4 = []
    for i in range(6):
        a = r4[i - 3] if i >= 3 else 0
        b = r3[i]
        c = r3[i - 3] if i >= 3 else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        r4.append((2 + pred) & 0xFF)
    assert list(pix) == r1 + r2 + r3 + r4


def test_png_crc_corruption_rejected():
    import pytest

    from cam_etl_spark.multimodal.codecs import decode_png, encode_png

    buf = bytearray(encode_png(2, 2, b"\x01\x02\x03"))
    buf[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(buf))


def test_png_corrupt_zlib_and_short_idat_rejected_cleanly():
    """A corrupt zlib stream and an inflated-IDAT-too-short PNG must both
    raise ValueError (not zlib.error / IndexError) — same clean-rejection
    policy as truncated chunks and CRC mismatches."""
    import struct
    import zlib

    import pytest

    from cam_etl_spark.multimodal.codecs import PNG_SIG, decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    # valid chunk framing + CRC, garbage zlib payload
    bad_zlib = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"\x99" * 16) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="zlib"):
        decode_png(bad_zlib)
    # valid zlib stream that inflates to fewer bytes than 2x2 RGB needs
    short = PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="expected"):
        decode_png(short)


def test_wav_truncated_data_chunk_rejected():
    """A data chunk declaring more bytes than the buffer holds must raise,
    not silently produce stats over a shorter waveform."""
    import pytest

    from cam_etl_spark.multimodal.codecs import encode_wav, wav_data_chunk

    buf = encode_wav(n_frames=100, sample_rate=8000, n_channels=1)
    truncated = buf[:-50]  # drop the tail of the data chunk
    with pytest.raises(ValueError, match="truncated"):
        wav_data_chunk(truncated)


def test_gif_roundtrip_lzw_and_dispatch():
    """encode_gif → decode_gif is byte-exact through a real LZW
    compressor/decompressor; sniff/dispatch recognize the format."""
    import hashlib

    from cam_etl_spark.multimodal.codecs import (
        decode_gif,
        decode_payload,
        encode_gif,
        gif_pixels,
        sniff_format,
    )

    for d in (0, 5, 14, 27, 41, 97):  # incl. d=14, the LZW flush-boundary case
        seed = hashlib.md5(str(d).encode()).digest()
        w, h = d % 14 + 1, d % 9 + 1
        buf = encode_gif(w, h, seed)
        assert sniff_format(buf) == "gif"
        m = decode_gif(buf)
        need = w * 3 * h
        assert m["pixels"] == (seed * (need // 16 + 1))[:need]
        assert (m["width"], m["height"], m["n_channels"]) == (w, h, 3)
    meta, px = gif_pixels(encode_gif(5, 4, b"\x01\x02\x03\xff"))
    assert px.shape == (20, 3)
    assert decode_payload(encode_gif(2, 2, b"abc"))["format"] == "gif"


def test_gif_lzw_property_roundtrip():
    """Randomized index streams across lengths that straddle every code
    width boundary (the d=14 bug class: decoder grows width on its
    post-final-code append while the encoder flushed at the old width)."""
    import random

    from cam_etl_spark.multimodal.codecs import _lzw_compress, _lzw_decompress

    rng = random.Random(11)
    for L in range(1, 90):
        for nsym in (2, 3, 6, 16):
            idx = [rng.randrange(nsym) for _ in range(L)]
            mcs = max(2, (nsym - 1).bit_length())
            assert list(_lzw_decompress(_lzw_compress(idx, mcs), mcs)) == idx
    # long stream with dictionary clear at 4096 entries
    idx = [rng.randrange(2) for _ in range(60000)]
    assert list(_lzw_decompress(_lzw_compress(idx, 2), 2)) == idx


def test_gif_malformed_rejected_cleanly():
    import pytest

    from cam_etl_spark.multimodal.codecs import decode_gif, encode_gif

    buf = encode_gif(4, 3, b"\x10\x20\x30\x40")
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"XXXX" + buf[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(buf[:20])  # cut inside the color table / descriptor
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(buf[:-6])  # cut inside the image sub-blocks
    # GIF89a signature + an extension block before the image still decodes
    # (extension skipped), matching real-world files
    gct_end = 13 + 3 * 2  # header + LSD + 2-entry table for 1 color... derive:
    # rebuild: splice a graphic-control extension right before the image
    # descriptor (0x2C)
    img_at = buf.index(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = b"GIF89a" + buf[6:img_at] + ext + buf[img_at:]
    m = decode_gif(spliced)
    assert (m["width"], m["height"]) == (4, 3)
    # interlace flag → honest NotImplementedError
    interlaced = bytearray(buf)
    interlaced[img_at + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(interlaced))
    # LZW min code size above the spec max (8) must reject with the
    # intended diagnostic, not crash the decoder's root-table build
    # (review finding: 9..11 previously passed the bound check)
    for mcs in (9, 11, 1, 0):
        bad_mcs = bytearray(buf)
        bad_mcs[img_at + 10] = mcs
        with pytest.raises(ValueError, match="min code size"):
            decode_gif(bytes(bad_mcs))


def test_tiff_roundtrip_multistrip_and_dispatch():
    """encode_tiff → decode_tiff byte-exact across strip layouts; sniff
    and dispatch recognize the format; malformed payloads reject clean."""
    import hashlib

    import pytest

    from cam_etl_spark.multimodal.codecs import (
        decode_payload,
        decode_tiff,
        encode_tiff,
        sniff_format,
        tiff_pixels,
    )

    for d in (0, 6, 16, 33, 50):
        seed = hashlib.md5(str(d).encode()).digest()
        w, h = d % 17 + 1, d % 7 + 1
        for rps in (None, 1, 2):
            buf = encode_tiff(w, h, seed, rows_per_strip=rps)
            assert sniff_format(buf) == "tiff"
            m = decode_tiff(buf)
            need = w * 3 * h
            assert m["pixels"] == (seed * (need // 16 + 1))[:need]
            assert (m["width"], m["height"]) == (w, h)
    meta, px = tiff_pixels(encode_tiff(4, 5, b"\x01\x02"))
    assert px.shape == (20, 3)
    assert decode_payload(encode_tiff(2, 2, b"abc"))["format"] == "tiff"
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"XXXXXXXX")
    with pytest.raises(ValueError, match="strip extends"):
        decode_tiff(encode_tiff(3, 3, b"a")[:-5])
    # compressed profile → honest NotImplementedError, not a wrong decode
    buf = bytearray(encode_tiff(2, 2, b"ab"))
    # compression tag (259) value lives at IFD+2 + 3*12 + 8
    comp_at = 8 + 2 + 3 * 12 + 8
    buf[comp_at] = 5  # LZW
    with pytest.raises(NotImplementedError, match="codec library"):
        decode_tiff(bytes(buf))


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        idx=st.lists(st.integers(0, 15), min_size=0, max_size=400),
        mcs=st.integers(4, 8),
    )
    def test_lzw_property_roundtrip_any_stream(idx, mcs):
        """Any symbol stream round-trips at any legal min-code-size —
        hammers width-growth boundaries, the KwKwK case, and the flush
        interaction the battery tests hit only at fixed sizes."""
        from cam_etl_spark.multimodal.codecs import _lzw_compress, _lzw_decompress

        assert list(_lzw_decompress(_lzw_compress(idx, mcs), mcs)) == idx

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 12),
        seed=st.binary(min_size=1, max_size=48),
        rps=st.integers(1, 12),
    )
    def test_tiff_gif_property_roundtrip(w, h, seed, rps):
        """Random geometry × random pixel seed × random strip layout:
        encode→decode is byte-exact for both new containers (GIF skipped
        when the seed needs more than 256 palette entries — that raise is
        the documented contract, not a failure)."""
        from cam_etl_spark.multimodal.codecs import (
            decode_gif,
            decode_tiff,
            encode_gif,
            encode_tiff,
        )

        need = w * 3 * h
        fill = (seed * (need // len(seed) + 1))[:need]
        m = decode_tiff(encode_tiff(w, h, seed, rows_per_strip=rps))
        assert m["pixels"] == fill and (m["width"], m["height"]) == (w, h)
        try:
            g = decode_gif(encode_gif(w, h, seed))
        except ValueError as e:
            assert "256-entry table" in str(e)
        else:
            assert g["pixels"] == fill and (g["width"], g["height"]) == (w, h)

    @settings(max_examples=40, deadline=None)
    @given(
        wb=st.integers(1, 5),
        hb=st.integers(1, 4),
        seed=st.binary(min_size=1, max_size=32),
        rst=st.integers(0, 3),
    )
    def test_jpeg_property_block_constant_bit_exact(wb, hb, seed, rst):
        """Random block geometry × random seed × random restart interval:
        block-constant grayscale round-trips bit-exactly through the full
        Huffman+DCT pipeline — the invariant the catalog oracle rests on."""
        import numpy as np

        from cam_etl_spark.multimodal.jpeg import (
            QTABLE_ONES,
            decode_jpeg,
            encode_jpeg,
        )

        vals = np.frombuffer(seed, np.uint8)
        blocks = vals[np.arange(wb * hb) % len(vals)].reshape(hb, wb)
        img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        m = decode_jpeg(
            encode_jpeg(wb * 8, hb * 8, img, QTABLE_ONES, restart_interval=rst)
        )
        assert np.array_equal(m["pixels"], img)

    @settings(max_examples=30, deadline=None)
    @given(data=st.binary(min_size=64, max_size=64), w=st.integers(1, 3))
    def test_jpeg_property_arbitrary_content_error_bound(data, w):
        """Arbitrary (adversarial) content with the all-ones table: the
        only loss is coefficient rounding, so every pixel is within 1."""
        import numpy as np

        from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

        need = w * 8 * 8
        fill = (data * (need // len(data) + 1))[:need]
        img = np.frombuffer(fill, np.uint8).reshape(8, w * 8)
        m = decode_jpeg(encode_jpeg(w * 8, 8, img))
        assert np.abs(m["pixels"].astype(int) - img.astype(int)).max() <= 1

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.lists(st.integers(-32768, 32767), min_size=0, max_size=700),
        lpc=st.sampled_from([None, 1, 2, 3, 4, 8]),
        shiftbits=st.integers(0, 4),
        block=st.sampled_from([16, 64, 256]),
    )
    def test_flac_property_mono_roundtrip(data, lpc, shiftbits, block):
        """Any int16 signal × any LPC order × any wasted-bits factor ×
        any blocksize round-trips bit-exactly — hammers subframe-type
        selection, residual partitioning/escapes, and the wasted-bits
        header interaction the fixed tests hit only at chosen points."""
        from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

        sig = [max(-32768, min(32767, s >> shiftbits << shiftbits))
               for s in data]
        m = decode_flac(encode_flac(sig, block_size=block, lpc_order=lpc))
        assert m["samples"] == sig and m["n_samples"] == len(sig)

    @settings(max_examples=40, deadline=None)
    @given(
        data=st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
        mode=st.sampled_from(
            ["independent", "left_side", "right_side", "mid_side"]
        ),
        lpc=st.sampled_from([None, 2, 4]),
    )
    def test_flac_property_stereo_roundtrip(data, mode, lpc):
        """Any stereo pair (right = bitwise NOT of left) × any
        decorrelation mode round-trips bit-exactly through the 17-bit
        side channel."""
        from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

        left, right = data, [~s for s in data]
        m = decode_flac(
            encode_flac((left, right), 44100, lpc_order=lpc, stereo_mode=mode)
        )
        assert m["samples"][0::2] == left and m["samples"][1::2] == right

    @settings(max_examples=30, deadline=None)
    @given(
        data=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
        nch=st.integers(3, 8),
        lpc=st.sampled_from([None, 2]),
    )
    def test_flac_property_multichannel_roundtrip(data, nch, lpc):
        """3-8 channel streams (independent-channel assignments
        0b0010-0b0111): every channel round-trips bit-exactly and the
        interleave order is channel-minor."""
        from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

        chans = [[(s + 977 * c) % 65536 - 32768 for s in data]
                 for c in range(nch)]
        m = decode_flac(encode_flac(chans, 48000, lpc_order=lpc))
        assert m["channels"] == nch and m["n_samples"] == len(data)
        for c in range(nch):
            assert m["samples"][c::nch] == chans[c]

    @settings(max_examples=40, deadline=None)
    @given(seed=st.integers(0, 2**32 - 1), stereo=st.booleans())
    def test_mpeg_property_layer12_roundtrip(seed, stereo):
        """Random allocations / scalefactors / scfsi / codes for both
        layers and both channel modes: the compressed-domain integers
        round-trip bit-exactly through the full bitstream path."""
        import random

        from cam_etl_spark.multimodal.mpegaudio import (
            B2A_SBLIMIT,
            b2a_steps_list,
            decode_mpeg1_audio,
            encode_layer1_frame,
            encode_layer2_frame,
        )

        rng = random.Random(seed)
        nch = 2 if stereo else 1
        # Layer I
        alloc = [[rng.randint(0, 5) for _ in range(32)] for _ in range(nch)]
        act = [[sb for sb in range(32) if alloc[ch][sb]] for ch in range(nch)]
        scf = [[rng.randint(0, 62) for _ in act[ch]] for ch in range(nch)]
        codes = [
            [[rng.randrange((1 << (alloc[ch][sb] + 1)) - 1)
              for _ in range(12)] for sb in act[ch]]
            for ch in range(nch)
        ]
        args = (alloc, scf, codes) if stereo else (alloc[0], scf[0], codes[0])
        f = decode_mpeg1_audio(encode_layer1_frame(*args))["frames"][0]
        assert f["channels"] == nch
        assert f["codes"] == (codes if stereo else codes[0])
        # Layer II
        amax = lambda sb: 3 if sb < 3 else (5 if sb < 23 else 2)  # noqa: E731
        a2 = [
            [rng.randint(0, amax(sb)) for sb in range(B2A_SBLIMIT)]
            for _ in range(nch)
        ]
        act2 = [
            [sb for sb in range(B2A_SBLIMIT) if a2[ch][sb]]
            for ch in range(nch)
        ]
        sfs = [[rng.randint(0, 3) for _ in act2[ch]] for ch in range(nch)]
        stc = [
            [(rng.randint(0, 62), rng.randint(0, 62), rng.randint(0, 62))
             for _ in act2[ch]]
            for ch in range(nch)
        ]
        c2 = [
            [[rng.randrange(b2a_steps_list(sb)[a2[ch][sb] - 1])
              for _ in range(36)] for sb in act2[ch]]
            for ch in range(nch)
        ]
        kbps = 384 if stereo else 192
        args2 = (
            (a2, sfs, stc, c2) if stereo else (a2[0], sfs[0], stc[0], c2[0])
        )
        f2 = decode_mpeg1_audio(
            encode_layer2_frame(*args2, bitrate_kbps=kbps)
        )["frames"][0]
        assert f2["channels"] == nch
        assert f2["codes"] == (c2 if stereo else c2[0])
        assert f2["scfsi"] == (sfs if stereo else sfs[0])

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        layer=st.sampled_from([1, 2]),
        variant=st.sampled_from(["joint4", "joint8", "joint12", "joint16",
                                 "dual"]),
        crc=st.booleans(),
        pad=st.booleans(),
    )
    def test_mpeg_property_joint_dual_roundtrip(seed, layer, variant,
                                                crc, pad):
        """Joint-stereo (all four bounds) and dual_channel, both layers,
        with and without CRC protection and padding: shared-region
        allocations/codes and PER-CHANNEL scalefactors round-trip
        bit-exactly; decoded mode/bound/padding/protected match the
        header."""
        import random

        from cam_etl_spark.multimodal.mpegaudio import (
            decode_mpeg1_audio,
            encode_layer1_frame,
            encode_layer2_frame,
            l2_steps_list,
        )

        rng = random.Random(seed)
        dual = variant == "dual"
        bound = None if dual else int(variant[5:])
        sblimit = 32 if layer == 1 else 27
        eb = sblimit if dual else min(bound, sblimit)

        def amax(sb):
            if layer == 1:
                return 5
            return 2 if sb < 3 else (3 if sb < 23 else 2)

        # shared region (sb >= eb): ONE alloc + ONE code stream for both
        alloc = [[rng.randint(0, amax(sb)) for sb in range(sblimit)]
                 for _ in range(2)]
        for sb in range(eb, sblimit):
            alloc[1][sb] = alloc[0][sb]
        act = [[sb for sb in range(sblimit) if alloc[ch][sb]]
               for ch in range(2)]
        pos = [{sb: i for i, sb in enumerate(a)} for a in act]
        nsamp = 12 if layer == 1 else 36

        def steps_of(ch, sb):
            if layer == 1:
                return (1 << (alloc[ch][sb] + 1)) - 1
            return l2_steps_list("a", sb)[alloc[ch][sb] - 1]

        codes = [
            [[rng.randrange(steps_of(ch, sb)) for _ in range(nsamp)]
             for sb in act[ch]]
            for ch in range(2)
        ]
        for sb in range(eb, sblimit):
            if alloc[0][sb]:
                codes[1][pos[1][sb]] = codes[0][pos[0][sb]]
        if layer == 1:
            scf = [[rng.randint(0, 62) for _ in act[ch]] for ch in range(2)]
            buf = encode_layer1_frame(
                alloc, scf, codes, sample_rate=32000, bitrate_kbps=448,
                joint_bound=bound, dual=dual, crc=crc, padding=pad,
            )
        else:
            sfs = [[rng.randint(0, 3) for _ in act[ch]] for ch in range(2)]
            stc = [
                [(rng.randint(0, 62), rng.randint(0, 62), rng.randint(0, 62))
                 for _ in act[ch]]
                for ch in range(2)
            ]
            buf = encode_layer2_frame(
                alloc, sfs, stc, codes, sample_rate=48000,
                bitrate_kbps=384 if dual else 256,
                joint_bound=bound, dual=dual, crc=crc, padding=pad,
            )
        m = decode_mpeg1_audio(buf)
        f = m["frames"][0]
        assert f["protected"] == crc and f["padding"] == pad
        assert f["mode"] == ("dual_channel" if dual else "joint_stereo")
        assert f.get("bound") == (None if dual else eb)
        assert f["channels"] == 2
        assert f["alloc"] == alloc and f["codes"] == codes
        if layer == 1:
            assert [[t[0] for t in c] for c in f["scf"]] == scf
        else:
            assert f["scfsi"] == sfs
        # intensity trick: per-channel scalefactors survive in the shared
        # region, so shared codes requantize to DIFFERENT per-channel
        # values whenever the scalefactors differ there
        if not dual:
            for sb in range(eb, sblimit):
                if not alloc[0][sb]:
                    continue
                s0 = f["scf"][0][pos[0][sb]]
                s1 = f["scf"][1][pos[1][sb]]
                v0 = f["values"][0][pos[0][sb]]
                v1 = f["values"][1][pos[1][sb]]
                # L1 expands its one scf to (s,s,s); L2 parts are 12 wide
                for i, (a, b) in enumerate(zip(v0, v1)):
                    p = 0 if layer == 1 else i // 12
                    if s0[p] == s1[p]:
                        assert a == b
                    else:
                        assert a == b == 0.0 or a != b

    @settings(max_examples=60, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        rate=st.sampled_from([22050, 24000, 16000]),
        variant=st.sampled_from(["mono", "stereo", "joint8", "dual"]),
        kbps=st.sampled_from([144, 176, 256]),  # 144/176: LSF-only rows
        crc=st.booleans(),
        pad=st.booleans(),
    )
    def test_mpeg_property_lsf_layer1_roundtrip(seed, rate, variant,
                                                kbps, crc, pad):
        """MPEG-2 LSF (ISO 13818-3, ID bit 0) Layer I: half-rate sampling
        frequencies and the LSF bitrate table with the UNCHANGED Layer I
        body layout — all four channel modes round-trip bit-exactly,
        multi-frame streams lock the version, and mixing MPEG-1 and LSF
        frames in one stream is rejected."""
        import random

        from cam_etl_spark.multimodal.mpegaudio import (
            decode_mpeg1_audio,
            encode_layer1_frame,
            frame_bytes,
        )

        rng = random.Random(seed)
        nch = 1 if variant == "mono" else 2
        bound = 8 if variant == "joint8" else None
        dual = variant == "dual"
        # <=12 active subbands/channel keeps the densest draw inside the
        # smallest LSF frame (stereo 144 kbps @ 24 kHz = 288 B)
        alloc = [[rng.randint(0, 3) for _ in range(32)] for _ in range(nch)]
        for ch in range(nch):
            seen = 0
            for sb in range(32):
                if alloc[ch][sb]:
                    seen += 1
                    if seen > 12:
                        alloc[ch][sb] = 0
        if bound is not None:
            for sb in range(bound, 32):
                alloc[1][sb] = alloc[0][sb]
        act = [[sb for sb in range(32) if alloc[ch][sb]] for ch in range(nch)]
        pos = [{sb: i for i, sb in enumerate(a)} for a in act]
        scf = [[rng.randint(0, 62) for _ in act[ch]] for ch in range(nch)]
        codes = [
            [[rng.randrange((1 << (alloc[ch][sb] + 1)) - 1)
              for _ in range(12)] for sb in act[ch]]
            for ch in range(nch)
        ]
        if bound is not None:
            for sb in range(bound, 32):
                if alloc[0][sb]:
                    codes[1][pos[1][sb]] = codes[0][pos[0][sb]]
        args = (
            (alloc, scf, codes) if nch == 2
            else (alloc[0], scf[0], codes[0])
        )
        buf = encode_layer1_frame(
            *args, sample_rate=rate, bitrate_kbps=kbps,
            joint_bound=bound, dual=dual, crc=crc, padding=pad, version=2,
        )
        assert len(buf) == frame_bytes(1, kbps, rate, pad)
        m = decode_mpeg1_audio(buf * 2)
        assert m["format"] == "mpeg2_lsf_audio" and m["version"] == 2
        assert m["sample_rate"] == rate and m["bitrate_kbps"] == kbps
        assert m["n_frames"] == 2 and m["n_samples"] == 768
        f = m["frames"][0]
        assert f["channels"] == nch
        assert f["protected"] == crc and f["padding"] == pad
        assert f["alloc"] == (alloc if nch == 2 else alloc[0])
        assert f["codes"] == (codes if nch == 2 else codes[0])
        if bound is not None:
            assert f["mode"] == "joint_stereo" and f["bound"] == bound
        # an MPEG-1 frame appended to an LSF stream must be rejected
        v1 = encode_layer1_frame(
            *args, sample_rate=rate * 2, bitrate_kbps=448,
            joint_bound=bound, dual=dual, version=1,
        )
        with pytest.raises(ValueError, match="inconsistent stream"):
            decode_mpeg1_audio(buf + v1)

    def test_mpeg_lsf_boundaries():
        """MPEG-1-only sample rates / bitrate rows under version=2 and
        LSF rates under version=1 reject by name (LSF Layer II itself
        now decodes — see test_mpeg_property_lsf_l2_roundtrip)."""
        from cam_etl_spark.multimodal.mpegaudio import (
            encode_layer1_frame,
        )

        alloc = [1] + [0] * 31
        with pytest.raises(ValueError, match="sample rate"):
            encode_layer1_frame(alloc, [0], [[0] * 12],
                                sample_rate=44100, bitrate_kbps=64,
                                version=2)
        with pytest.raises(ValueError, match="sample rate"):
            encode_layer1_frame(alloc, [0], [[0] * 12],
                                sample_rate=24000, bitrate_kbps=64,
                                version=1)
        with pytest.raises(ValueError, match="bad bitrate"):
            # 144 kbps is an LSF-only Layer I row
            encode_layer1_frame(alloc, [0], [[0] * 12],
                                sample_rate=32000, bitrate_kbps=144,
                                version=1)

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        cfg=st.sampled_from([
            # (sample_rate, bitrate_kbps, nch) — LSF Layer II always
            # uses 13818-3 Table B.1 and the LSF L2 bitrate rows
            (22050, 64, 1),
            (24000, 160, 2),
            (16000, 8, 1),       # the LSF-only 8 kbps row
            (24000, 96, 2),
            (22050, 144, 2),
        ]),
        crc=st.booleans(),
    )
    def test_mpeg_property_lsf_l2_roundtrip(seed, cfg, crc):
        """MPEG-2 LSF Layer II (13818-3 Table B.1, vendored round 11):
        sblimit 30, nbal 4/3/2 over subbands 0-3/4-10/11-29, every
        class list starting at the GROUPED 3-step class — fixtures
        round-trip bit-exactly through multi-frame streams, the frame
        format reports mpeg2_lsf_audio, and the table in force is
        'lsf' regardless of bitrate or mode."""
        import random

        from cam_etl_spark.multimodal.mpegaudio import (
            L2_SBLIMIT,
            decode_mpeg1_audio,
            encode_layer2_frame,
            l2_nbal,
            l2_steps_list,
        )

        rate, kbps, nch = cfg
        sblimit = L2_SBLIMIT["lsf"]
        assert sblimit == 30
        rng = random.Random(seed)
        frames = []
        for _ in range(2):
            # sparse, small-class allocations so every cfg (incl. the
            # 72-byte 8 kbps frame) fits its slot count; the 2-bit
            # nbal rows still span their full range
            density = 0.15 if kbps <= 16 else 0.4
            amax_cfg = 1 if kbps <= 16 else 4
            alloc = [
                [(rng.randint(1, min(amax_cfg,
                                     (1 << l2_nbal("lsf", sb)) - 1,
                                     len(l2_steps_list("lsf", sb))))
                  if rng.random() < density else 0)
                 for sb in range(sblimit)]
                for _ in range(nch)
            ]
            if kbps <= 16:  # hard cap: 72-byte frames fit ~5 actives
                for ch in range(nch):
                    seen = 0
                    for sb in range(sblimit):
                        if alloc[ch][sb]:
                            seen += 1
                            if seen > 4:
                                alloc[ch][sb] = 0
            act = [[sb for sb in range(sblimit) if alloc[ch][sb]]
                   for ch in range(nch)]
            sfs = [[rng.randint(0, 3) for _ in act[ch]]
                   for ch in range(nch)]
            stc = [
                [(rng.randint(0, 62), rng.randint(0, 62),
                  rng.randint(0, 62)) for _ in act[ch]]
                for ch in range(nch)
            ]
            codes = [
                [[rng.randrange(
                    l2_steps_list("lsf", sb)[alloc[ch][sb] - 1])
                  for _ in range(36)] for sb in act[ch]]
                for ch in range(nch)
            ]
            args = (
                (alloc, sfs, stc, codes) if nch == 2
                else (alloc[0], sfs[0], stc[0], codes[0])
            )
            frames.append(
                (encode_layer2_frame(*args, sample_rate=rate,
                                     bitrate_kbps=kbps, crc=crc,
                                     version=2),
                 alloc, sfs, codes)
            )
        buf = b"".join(f[0] for f in frames)
        m = decode_mpeg1_audio(buf)
        assert m["format"] == "mpeg2_lsf_audio"
        assert m["sample_rate"] == rate
        assert m["bitrate_kbps"] == kbps
        assert len(m["frames"]) == 2
        for f, (_, alloc, sfs, codes) in zip(m["frames"], frames):
            assert f["table"] == "lsf"
            assert f["channels"] == nch
            assert f["alloc"] == (alloc if nch == 2 else alloc[0])
            assert f["scfsi"] == (sfs if nch == 2 else sfs[0])
            assert f["codes"] == (codes if nch == 2 else codes[0])

    @settings(max_examples=40, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        cfg=st.sampled_from([
            # (sample_rate, bitrate_kbps, nch) -> expected 3-B.2 table
            (32000, 192, 1, "b"),
            (32000, 96, 1, "b"),
            (32000, 224, 2, "b"),
            (48000, 48, 1, "c"),
            (48000, 96, 2, "c"),
            (32000, 48, 1, "d"),
            (32000, 96, 2, "d"),
            (48000, 192, 1, "a"),
            (48000, 256, 2, "a"),
        ]),
    )
    def test_mpeg_property_l2_table_roundtrip(seed, cfg):
        """Tables 3-B.2b/c/d (plus an `a` control): the header-implied
        table (sample rate x per-channel bitrate) governs sblimit, nbal,
        and the class lists, and every fixture round-trips bit-exactly."""
        import random

        from cam_etl_spark.multimodal.mpegaudio import (
            L2_SBLIMIT,
            decode_mpeg1_audio,
            encode_layer2_frame,
            l2_steps_list,
            l2_table_for,
        )

        rate, kbps, nch, expect = cfg
        assert l2_table_for(rate, kbps, nch) == expect
        sblimit = L2_SBLIMIT[expect]
        rng = random.Random(seed)

        def amax(sb):
            if expect in ("a", "b"):
                return 2 if sb < 3 else (3 if sb < 23 else 2)
            return 3 if sb < 2 else 2

        alloc = [[rng.randint(0, amax(sb)) for sb in range(sblimit)]
                 for _ in range(nch)]
        act = [[sb for sb in range(sblimit) if alloc[ch][sb]]
               for ch in range(nch)]
        sfs = [[rng.randint(0, 3) for _ in act[ch]] for ch in range(nch)]
        stc = [
            [(rng.randint(0, 62), rng.randint(0, 62), rng.randint(0, 62))
             for _ in act[ch]]
            for ch in range(nch)
        ]
        codes = [
            [[rng.randrange(l2_steps_list(expect, sb)[alloc[ch][sb] - 1])
              for _ in range(36)] for sb in act[ch]]
            for ch in range(nch)
        ]
        args = (
            (alloc, sfs, stc, codes) if nch == 2
            else (alloc[0], sfs[0], stc[0], codes[0])
        )
        m = decode_mpeg1_audio(
            encode_layer2_frame(*args, sample_rate=rate, bitrate_kbps=kbps)
        )
        assert m["sample_rate"] == rate and m["bitrate_kbps"] == kbps
        f = m["frames"][0]
        assert f["table"] == expect and f["channels"] == nch
        assert f["codes"] == (codes if nch == 2 else codes[0])
        assert f["scfsi"] == (sfs if nch == 2 else sfs[0])

    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        pads=st.tuples(st.booleans(), st.booleans()),
        crc=st.booleans(),
    )
    def test_mpeg_property_free_format(seed, pads, crc):
        """Free-format streams with RANDOM payloads after a silent first
        frame: the scan-locked length must carry any mix of padded /
        CRC-protected digest frames, and every frame round-trips."""
        import random

        from cam_etl_spark.multimodal.mpegaudio import (
            L2_SBLIMIT,
            decode_mpeg1_audio,
            encode_layer2_frame,
            l2_steps_list,
        )

        rng = random.Random(seed)
        sbl = L2_SBLIMIT["a"]

        def frame(silent, pad):
            def amax(sb):
                return 2 if sb < 3 else (3 if sb < 23 else 2)

            alloc = (
                [0] * sbl if silent
                else [rng.randint(0, amax(sb)) for sb in range(sbl)]
            )
            act = [sb for sb in range(sbl) if alloc[sb]]
            sfs = [rng.randint(0, 3) for _ in act]
            stc = [(rng.randint(0, 62),) * 3 for _ in act]
            codes = [
                [rng.randrange(l2_steps_list("a", sb)[alloc[sb] - 1])
                 for _ in range(36)]
                for sb in act
            ]
            return encode_layer2_frame(
                alloc, sfs, stc, codes, sample_rate=48000,
                free_format_bytes=440, padding=pad, crc=crc,
            ), codes

        b0, _ = frame(True, False)
        b1, c1 = frame(False, pads[0])
        b2, c2 = frame(False, pads[1])
        m = decode_mpeg1_audio(b0 + b1 + b2)
        assert m["n_frames"] == 3 and m["bitrate_kbps"] == 0
        assert [f["padding"] for f in m["frames"]] == [False, *pads]
        assert all(f["free_format"] for f in m["frames"])
        assert all(f["protected"] == crc for f in m["frames"])
        assert m["frames"][1]["codes"] == c1
        assert m["frames"][2]["codes"] == c2
except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass


def test_mpeg_l2_legality_and_joint_validation():
    """§2.4.2.3 bitrate/mode legality matrix + joint-stereo fixture
    validation: every illegal combination is rejected loudly, and a
    stream that changes channel mode mid-stream errors out."""
    import pytest as _pytest

    from cam_etl_spark.multimodal.mpegaudio import (
        decode_mpeg1_audio,
        encode_layer1_frame,
        encode_layer2_frame,
        l2_table_for,
    )

    # single_channel-only / two-channel-only bitrates
    for kbps in (224, 256, 320, 384):
        with _pytest.raises(ValueError, match="two-channel-only"):
            l2_table_for(48000, kbps, 1)
    for kbps in (32, 48, 56, 80):
        with _pytest.raises(ValueError, match="single_channel-only"):
            l2_table_for(48000, kbps, 2)

    silent2 = [[0] * 32, [0] * 32]
    # joint bound must be one of 4/8/12/16, two channels required
    with _pytest.raises(ValueError, match="not in 4/8/12/16"):
        encode_layer1_frame(silent2, [[], []], [[], []], joint_bound=5)
    with _pytest.raises(ValueError, match="needs two channels"):
        encode_layer1_frame([0] * 32, [], [], joint_bound=8)
    with _pytest.raises(ValueError, match="needs two channels"):
        encode_layer1_frame([0] * 32, [], [], dual=True)
    with _pytest.raises(ValueError, match="mutually exclusive"):
        encode_layer1_frame(silent2, [[], []], [[], []],
                            joint_bound=8, dual=True)
    # shared region must agree: differing alloc, then differing codes
    alloc = [[0] * 32, [0] * 32]
    alloc[0][20] = 2
    with _pytest.raises(ValueError, match="one shared allocation"):
        encode_layer1_frame(
            alloc, [[7], []], [[[1] * 12], []], joint_bound=8
        )
    alloc[1][20] = 2
    with _pytest.raises(ValueError, match="shares sample"):
        encode_layer1_frame(
            alloc, [[7], [9]], [[[1] * 12], [[2] * 12]], joint_bound=8
        )
    # per-channel scalefactors in the shared region are LEGAL (intensity)
    buf = encode_layer1_frame(
        alloc, [[7], [9]], [[[1] * 12], [[1] * 12]], joint_bound=8
    )
    f = decode_mpeg1_audio(buf)["frames"][0]
    assert f["mode"] == "joint_stereo" and f["bound"] == 8
    assert f["scf"][0][0][0] == 7 and f["scf"][1][0][0] == 9
    # mode is part of the cross-frame consistency tuple
    stereo_buf = encode_layer1_frame(
        alloc, [[7], [9]], [[[1] * 12], [[1] * 12]]
    )
    with _pytest.raises(ValueError, match="inconsistent stream"):
        decode_mpeg1_audio(stereo_buf + buf)
    # dual_channel carries the independent-programme tag end-to-end
    a2 = [[0] * 27, [0] * 27]
    a2[0][0], a2[1][5] = 1, 1
    m = decode_mpeg1_audio(
        encode_layer2_frame(
            a2, [[0], [0]], [[(1, 2, 3)], [(4, 5, 6)]],
            [[[1] * 36], [[2] * 36]], bitrate_kbps=384, dual=True,
        )
    )
    assert m["frames"][0]["mode"] == "dual_channel"
    assert m["frames"][0]["alloc"] == a2


def test_mpeg_crc_protection():
    """§2.4.3.1 crc_check: protected frames round-trip; corrupting any
    bit the CRC covers (allocation, header bytes 2-3) reports a CRC
    mismatch BEFORE body decode; sample bits are outside CRC scope;
    protection is per-frame and may vary within a stream."""
    import random

    import pytest as _pytest

    from cam_etl_spark.multimodal.mpegaudio import (
        B2A_SBLIMIT,
        b2a_steps_list,
        decode_mpeg1_audio,
        encode_layer1_frame,
        encode_layer2_frame,
    )

    rng = random.Random(9)
    alloc = [rng.randint(0, 5) for _ in range(32)]
    act = [sb for sb in range(32) if alloc[sb]]
    scf = [rng.randint(0, 62) for _ in act]
    codes = [[rng.randrange((1 << (alloc[sb] + 1)) - 1) for _ in range(12)]
             for sb in act]
    buf = encode_layer1_frame(alloc, scf, codes, crc=True)
    f = decode_mpeg1_audio(buf)["frames"][0]
    assert f["protected"] and f["codes"] == codes

    def amax(sb):
        return 3 if sb < 3 else (5 if sb < 23 else 2)

    a2 = [rng.randint(0, amax(sb)) for sb in range(B2A_SBLIMIT)]
    act2 = [sb for sb in range(B2A_SBLIMIT) if a2[sb]]
    sfs = [rng.randint(0, 3) for _ in act2]
    stc = [(rng.randint(0, 62),) * 3 for _ in act2]
    c2 = [[rng.randrange(b2a_steps_list(sb)[a2[sb] - 1]) for _ in range(36)]
          for sb in act2]
    buf2 = encode_layer2_frame(a2, sfs, stc, c2, bitrate_kbps=192, crc=True)
    f2 = decode_mpeg1_audio(buf2)["frames"][0]
    assert f2["protected"] and f2["codes"] == c2 and f2["scfsi"] == sfs

    # allocation corruption (payload starts at byte 6 with CRC present)
    for b in (buf, buf2):
        bad = bytearray(b)
        bad[6] ^= 0x10
        with _pytest.raises(ValueError, match="crc_check mismatch"):
            decode_mpeg1_audio(bytes(bad))
    # header byte 3 (mode/mode_ext) is covered too
    bad = bytearray(buf2)
    bad[3] ^= 0x40
    with _pytest.raises((ValueError, NotImplementedError)):
        decode_mpeg1_audio(bytes(bad))
    # protection may vary per frame within one stream
    m = decode_mpeg1_audio(
        encode_layer1_frame(alloc, scf, codes, crc=True)
        + encode_layer1_frame(alloc, scf, codes)
    )
    assert [fr["protected"] for fr in m["frames"]] == [True, False]


def test_mpeg_free_format():
    """Free-format streams (bitrate_index 0): the decoder locks the
    frame length from the first frame's sync scan, padding still adds a
    slot, the Layer II table follows the IMPLIED bitrate, and the last
    frame (no following sync) runs to the end of the buffer."""
    import random

    from cam_etl_spark.multimodal.mpegaudio import (
        L2_SBLIMIT,
        decode_mpeg1_audio,
        encode_layer1_frame,
        encode_layer2_frame,
        l2_steps_list,
    )

    rng = random.Random(3)
    sbl = L2_SBLIMIT["a"]

    def l2_frame(pad, silent=False):
        def amax(sb):
            return 2 if sb < 3 else (3 if sb < 23 else 2)

        alloc = (
            [0] * sbl if silent
            else [rng.randint(0, amax(sb)) for sb in range(sbl)]
        )
        act = [sb for sb in range(sbl) if alloc[sb]]
        sfs = [rng.randint(0, 3) for _ in act]
        stc = [(rng.randint(0, 62),) * 3 for _ in act]
        codes = [
            [rng.randrange(l2_steps_list("a", sb)[alloc[sb] - 1])
             for _ in range(36)]
            for sb in act
        ]
        # 300 B @ 48 kHz mono -> implied 100 kbps -> table a
        return encode_layer2_frame(
            alloc, sfs, stc, codes, sample_rate=48000,
            free_format_bytes=300, padding=pad,
        ), codes

    b0, _ = l2_frame(False, silent=True)
    b1, _ = l2_frame(True)
    b2, c2 = l2_frame(False)
    assert len(b0) == 300 and len(b1) == 301 and len(b2) == 300
    m = decode_mpeg1_audio(b0 + b1 + b2)
    assert m["n_frames"] == 3 and m["bitrate_kbps"] == 0
    assert [f["free_format"] for f in m["frames"]] == [True] * 3
    assert [f["padding"] for f in m["frames"]] == [False, True, False]
    assert m["frames"][2]["codes"] == c2
    assert all(f["table"] == "a" for f in m["frames"])

    # Layer I free format, padded second frame (4-byte slots)
    alloc = [0] * 32
    alloc[3] = 2
    f1 = encode_layer1_frame(alloc, [8], [[2] * 12], sample_rate=32000,
                             free_format_bytes=280)
    f2 = encode_layer1_frame(alloc, [9], [[3] * 12], sample_rate=32000,
                             free_format_bytes=280, padding=True)
    m1 = decode_mpeg1_audio(f1 + f2)
    assert m1["n_frames"] == 2 and m1["frames"][1]["codes"] == [[3] * 12]

    # implied low bitrate selects the low-rate table: 140 B @ 48 kHz
    # -> 46.67 kbps -> table c (sblimit 8)
    alloc_c = [0] * 8
    alloc_c[1] = 1
    fc = encode_layer2_frame(alloc_c, [0], [(5, 6, 7)], [[2] * 36],
                             sample_rate=48000, free_format_bytes=140)
    assert decode_mpeg1_audio(fc)["frames"][0]["table"] == "c"


def test_mpeg_padding_and_441khz():
    """The padding bit adds one slot (4 B Layer I, 1 B Layer II) and the
    per-frame length follows the header alone — which is what makes
    44.1 kHz reachable (no 44.1 kHz bitrate has an integer slot count).
    Mixed padded/unpadded back-to-back frames locate correctly."""
    import random

    from cam_etl_spark.multimodal.mpegaudio import (
        L2_SBLIMIT,
        decode_mpeg1_audio,
        encode_layer1_frame,
        encode_layer2_frame,
        frame_bytes,
        l2_steps_list,
        l2_table_for,
    )

    assert frame_bytes(2, 128, 44100) == 417  # trunc(144*128000/44100)
    assert frame_bytes(2, 128, 44100, True) == 418
    assert frame_bytes(1, 256, 44100) == 276  # trunc(12*256000/44100)*4
    assert frame_bytes(1, 256, 44100, True) == 280
    # 44.1 kHz at 128 kbps mono is a table-b stream per the matrix
    assert l2_table_for(44100, 128, 1) == "b"

    rng = random.Random(7)
    sbl = L2_SBLIMIT["b"]

    def l2_frame(pad):
        alloc = [rng.randint(0, 2) for _ in range(sbl)]
        act = [sb for sb in range(sbl) if alloc[sb]]
        sfs = [rng.randint(0, 3) for _ in act]
        stc = [(rng.randint(0, 62),) * 3 for _ in act]
        codes = [
            [rng.randrange(l2_steps_list("b", sb)[alloc[sb] - 1])
             for _ in range(36)]
            for sb in act
        ]
        return encode_layer2_frame(
            alloc, sfs, stc, codes, sample_rate=44100, bitrate_kbps=128,
            padding=pad,
        ), codes

    b0, c0 = l2_frame(True)
    b1, c1 = l2_frame(False)
    assert len(b0) == 418 and len(b1) == 417
    m = decode_mpeg1_audio(b0 + b1 + b0)
    assert m["n_frames"] == 3 and m["sample_rate"] == 44100
    assert [f["padding"] for f in m["frames"]] == [True, False, True]
    assert m["frames"][0]["codes"] == c0 and m["frames"][1]["codes"] == c1
    assert all(f["table"] == "b" for f in m["frames"])

    # Layer I at 44.1 kHz, padded + unpadded back-to-back
    alloc = [0] * 32
    alloc[5] = 2
    f_pad = encode_layer1_frame(
        alloc, [10], [[3] * 12], sample_rate=44100, bitrate_kbps=256,
        padding=True,
    )
    f_nop = encode_layer1_frame(
        alloc, [10], [[4] * 12], sample_rate=44100, bitrate_kbps=256,
    )
    assert len(f_pad) == 280 and len(f_nop) == 276
    m1 = decode_mpeg1_audio(f_pad + f_nop)
    assert m1["n_frames"] == 2
    assert [f["padding"] for f in m1["frames"]] == [True, False]
    assert m1["frames"][1]["codes"] == [[4] * 12]


def test_gif_multiframe_roundtrip_and_sampler(spark):
    """Multi-image GIF87a: every frame round-trips byte-exactly through
    the shared global color table, and sample_frames_real dispatches GIF
    payloads next to AVI ones with true-channel means."""
    import hashlib

    import numpy as np

    from cam_etl_spark.multimodal import sample_frames_real
    from cam_etl_spark.multimodal.codecs import (
        decode_gif,
        encode_gif_frames,
        gif_frames,
    )

    seed = hashlib.md5(b"x").digest()
    frames_in = [bytes(seed[(j + f) % 16] for j in range(16)) for f in range(5)]
    buf = encode_gif_frames(4, 3, frames_in)
    frames = gif_frames(buf)
    assert len(frames) == 5
    need = 4 * 3 * 3
    for f, m in enumerate(frames):
        assert m["pixels"] == (frames_in[f] * (need // 16 + 1))[:need]
    assert decode_gif(buf)["pixels"] == frames[0]["pixels"]

    df = spark.createDataFrame(
        [(1, buf), (2, b"notmedia")], "media_id long, payload binary"
    )
    out = sample_frames_real(df, max_frames=3).collect()
    assert {r["media_id"] for r in out} == {1}
    assert sorted(r["frame_index"] for r in out) == [0, 2, 4]  # evenly spaced of 5
    r0 = next(r for r in out if r["frame_index"] == 0)
    px = np.frombuffer(frames[0]["pixels"], dtype=np.uint8).reshape(-1, 3)
    # RGB storage: mean_r is channel 0
    assert abs(r0["mean_r"] - px[:, 0].mean()) < 1e-9
    assert abs(r0["mean_b"] - px[:, 2].mean()) < 1e-9
    assert r0["n_frames"] == 5 and r0["n_pixels"] == 12


def test_resize_media_real_roundtrips_exact_pixels(spark):
    import numpy as np

    from cam_etl_spark.multimodal import resize_media_real
    from cam_etl_spark.multimodal.codecs import (
        bmp_pixels,
        encode_bmp,
        encode_gif,
        encode_png,
        encode_tiff,
        gif_pixels,
        png_pixels,
        tiff_pixels,
    )

    seed = bytes(range(16))
    rows = [(1, encode_bmp(6, 4, seed)), (2, encode_png(5, 7, seed)),
            (3, b"unsupported"),
            (4, encode_gif(7, 5, seed)),
            (5, encode_tiff(6, 6, seed, rows_per_strip=2))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in resize_media_real(df, 4, 3).collect()}
    assert set(out) == {1, 2, 4, 5}  # unsupported skipped, not faked
    assert out[4]["format"] == "gif" and out[5]["format"] == "tiff"

    for mid, (w, h, dec) in {1: (6, 4, bmp_pixels), 2: (5, 7, png_pixels),
                             4: (7, 5, gif_pixels), 5: (6, 6, tiff_pixels)}.items():
        src_meta, src_px = dec(bytes(rows[mid - 1][1]))
        mat = src_px.reshape(h, w, 3)
        rs = (np.arange(3) * h) // 3
        cs = (np.arange(4) * w) // 4
        expect = mat[rs][:, cs]
        # the emitted payload is a REAL file of the same format whose
        # decoded pixels are exactly the NN-sampled source pixels
        rm, rpx = dec(bytes(out[mid]["payload"]))
        assert (rm["width"], rm["height"]) == (4, 3)
        assert np.array_equal(rpx.reshape(3, 4, 3), expect)
        assert abs(out[mid]["mean_c0"] - expect[..., 0].mean()) < 1e-9


def test_png_truncated_rejected():
    import pytest

    from cam_etl_spark.multimodal.codecs import decode_png, encode_png

    buf = encode_png(2, 2, b"\x01")
    idat = buf.index(b"IDAT")
    # cut inside the IDAT chunk body: clean ValueError, not struct.error
    with pytest.raises(ValueError, match="truncated"):
        decode_png(buf[: idat + 8])


def test_jpeg_constant_blocks_bit_exact():
    """With QTABLE_ONES, block-constant grayscale survives the full DCT+
    Huffman pipeline bit-exactly — the property the catalog oracle
    relies on. Exhaustive over every gray value."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    for v in range(256):
        m = decode_jpeg(encode_jpeg(8, 8, np.full((8, 8), v, np.uint8)))
        assert m["n_channels"] == 1 and (m["pixels"] == v).all(), v


def test_jpeg_fixture_matches_generator_and_dispatch():
    import hashlib

    import numpy as np

    from cam_etl_spark.multimodal.codecs import decode_payload, sniff_format
    from cam_etl_spark.multimodal.jpeg import (
        encode_jpeg_gray_blocks,
        jpeg_gray_pixels,
    )

    seed = hashlib.md5(b"fixture").digest()
    buf = encode_jpeg_gray_blocks(5, 3, seed)
    assert sniff_format(buf) == "jpeg"
    meta = decode_payload(buf)
    assert (meta["width"], meta["height"]) == (40, 24)
    _, px = jpeg_gray_pixels(buf)
    vals = np.frombuffer(seed, np.uint8)
    blocks = vals[np.arange(15) % 16].reshape(3, 5)
    expect = np.repeat(np.repeat(blocks, 8, 0), 8, 1).reshape(-1)
    assert np.array_equal(px, expect)


def test_jpeg_ac_runlength_zrl_and_noise():
    """Non-constant content exercises the AC run-length path (including
    ZRL for >15-zero runs). With an all-ones table quantization error is
    bounded by coefficient rounding: max pixel error <= 1."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    m = decode_jpeg(encode_jpeg(32, 24, img))
    assert np.abs(m["pixels"].astype(int) - img.astype(int)).max() <= 1

    # A single hot pixel -> DCT energy across all 64 coefficients with
    # long zero runs between survivors: the ZRL/EOB branches execute.
    img2 = np.zeros((8, 8), np.uint8)
    img2[7, 7] = 255
    m2 = decode_jpeg(encode_jpeg(8, 8, img2))
    assert np.abs(m2["pixels"].astype(int) - img2.astype(int)).max() <= 1


def test_jpeg_restart_markers_and_dc_reset():
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (16, 40), dtype=np.uint8)
    buf = decode_jpeg(encode_jpeg(40, 16, img, restart_interval=3))
    assert buf["restart_interval"] == 3
    assert np.abs(buf["pixels"].astype(int) - img.astype(int)).max() <= 1


def test_jpeg_color_444_roundtrip_tolerance():
    """3-component 4:4:4 YCbCr: lossy only through the color-space
    rounding (all-ones DQT), so the round trip stays within a few
    counts per channel."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    m = decode_jpeg(encode_jpeg(16, 16, img))
    assert m["n_channels"] == 3
    assert np.abs(m["pixels"].astype(int) - img.astype(int)).max() <= 3


def test_jpeg_lossy_standard_table_monotone_content():
    """The Annex K luminance table is a legal DQT: smooth content decodes
    close to the source (the conventional lossy path works, it is just
    excluded from the bit-exact oracle fixture)."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import (
        QTABLE_STD_LUMA_ROWMAJOR,
        ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:16, 0:16]
    img = ((yy * 4 + xx * 2) % 200 + 20).astype(np.uint8)
    zz = [QTABLE_STD_LUMA_ROWMAJOR[i] for i in ZIGZAG]
    m = decode_jpeg(encode_jpeg(16, 16, img, qtable=zz))
    assert np.abs(m["pixels"].astype(int) - img.astype(int)).mean() < 12


def test_jpeg_malformed_rejected_cleanly():
    import numpy as np
    import pytest

    from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8), np.uint8)
    buf = encode_jpeg(8, 8, img)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + buf[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(buf[:-12])
    # a sequential full-band scan under a progressive SOF2 header is an
    # inconsistent stream -> clean ValueError (progressive itself now
    # decodes; see test_jpeg_progressive_*)
    sof0 = buf.index(b"\xff\xc0")
    prog = bytearray(buf)
    prog[sof0 + 1] = 0xC2
    with pytest.raises(ValueError, match="0..63"):
        decode_jpeg(bytes(prog))
    # lossless SOF3 stays an honest NotImplementedError
    lossless = bytearray(buf)
    lossless[sof0 + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="sequential"):
        decode_jpeg(bytes(lossless))
    # sampling factors beyond 2x2 -> honest NotImplementedError
    rng = np.random.default_rng(1)
    cimg = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    cbuf = bytearray(encode_jpeg(8, 8, cimg))
    csof = cbuf.index(b"\xff\xc0")
    cbuf[csof + 11] = 0x33  # component 1 sampling 3x3
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg(bytes(cbuf))


def test_jpeg_encoder_validates_geometry():
    import numpy as np
    import pytest

    from cam_etl_spark.multimodal.jpeg import encode_jpeg

    with pytest.raises(ValueError, match="multiples of 8"):
        encode_jpeg(7, 8, np.zeros((8, 7), np.uint8))
    with pytest.raises(ValueError, match="qtable"):
        encode_jpeg(8, 8, np.zeros((8, 8), np.uint8), qtable=[0] * 64)


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 chroma subsampling: MCU-interleaved 2x2 luma + subsampled
    chroma encode AND decode natively — the conventional photographic
    JPEG layout, previously behind NotImplementedError."""
    import numpy as np

    from cam_etl_spark.multimodal.codecs import decode_payload
    from cam_etl_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(23)
    # neutral chroma (R=G=B): Cb=Cr=128 flat, so subsampling is lossless
    # and the round trip stays within DCT rounding
    g3 = np.repeat(rng.integers(0, 256, (32, 48, 1), dtype=np.uint8), 3, axis=2)
    buf = encode_jpeg(48, 32, g3, subsampling="420")
    m = decode_jpeg(buf)
    assert m["n_channels"] == 3
    assert np.abs(m["pixels"].astype(int) - g3.astype(int)).max() <= 2
    # the stream genuinely declares 2x2 luma sampling
    sof = buf.index(b"\xff\xc0")
    assert buf[sof + 11] == 0x22 and buf[sof + 14] == 0x11
    # dispatch path reports the right geometry
    meta = decode_payload(buf)
    assert (meta["width"], meta["height"]) == (48, 32)

    # 16x16-constant color tiles: chroma constant within every subsample
    # cell, so even real color survives near-exactly
    tiles = np.repeat(
        np.repeat(rng.integers(0, 256, (2, 3, 3), dtype=np.uint8), 16, 0), 16, 1
    )
    m2 = decode_jpeg(encode_jpeg(48, 32, tiles, subsampling="420"))
    assert np.abs(m2["pixels"].astype(int) - tiles.astype(int)).max() <= 3

    # restart markers count MCUs in 4:2:0 too
    m3 = decode_jpeg(encode_jpeg(48, 32, g3, subsampling="420", restart_interval=2))
    assert np.abs(m3["pixels"].astype(int) - g3.astype(int)).max() <= 2

    # geometry guard: 4:2:0 needs multiples of 16
    import pytest

    with pytest.raises(ValueError, match="multiples of 16"):
        encode_jpeg(24, 16, g3[:16, :24], subsampling="420")


def test_jpeg_progressive_equals_sequential():
    """SOF2 spectral-selection progressive: the DC scan plus per-component
    AC band scans store EXACTLY the coefficients the sequential encoding
    stores, so decoding both streams must give identical pixels — a
    cross-validation between two independent coding paths (EOB-run
    accumulation, band splitting, multi-scan accumulation on one side;
    single-scan run-length coding on the other)."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import (
        QTABLE_STD_LUMA_ROWMAJOR,
        ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(37)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    seq = decode_jpeg(encode_jpeg(40, 24, img))
    prog = decode_jpeg(encode_jpeg(40, 24, img, progressive=True))
    assert prog["progressive"] and not seq["progressive"]
    assert np.array_equal(seq["pixels"], prog["pixels"])

    cimg = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(24, 16, cimg))["pixels"],
        decode_jpeg(encode_jpeg(24, 16, cimg, progressive=True))["pixels"],
    )

    # constant image: every AC band empty -> maximal EOB runs
    flat = np.full((32, 48), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(48, 32, flat, progressive=True))["pixels"] == 77).all()

    # lossy standard table through both paths
    zz = [QTABLE_STD_LUMA_ROWMAJOR[i] for i in ZIGZAG]
    small = img[:16, :24]
    assert np.array_equal(
        decode_jpeg(encode_jpeg(24, 16, small, qtable=zz))["pixels"],
        decode_jpeg(encode_jpeg(24, 16, small, qtable=zz, progressive=True))["pixels"],
    )


def test_jpeg_progressive_guards():
    import numpy as np
    import pytest

    from cam_etl_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.default_rng(1)
    cimg = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="progressive supports"):
        encode_jpeg(32, 32, cimg, subsampling="420", progressive=True)
    with pytest.raises(ValueError, match="progressive supports"):
        encode_jpeg(32, 32, cimg, progressive=True, restart_interval=2)


def test_jpeg_sa_refinement_roundtrip_exact():
    """Full successive-approximation scan script (DC Al=1 + refinement,
    AC first passes at Al=1 + AC refinement scans) recovers quantized
    coefficients bit-exactly — including ±1 coefficients that exist ONLY
    through refinement symbols and odd magnitudes that exist ONLY through
    correction bits (T.81 G.1.2.3)."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import (
        encode_jpeg_gray_coeff_blocks,
        jpeg_gray_coeffs,
    )

    rng = np.random.RandomState(42)
    for _ in range(40):
        wb, hb = rng.randint(1, 7), rng.randint(1, 6)
        n = wb * hb
        blocks = np.zeros((n, 64), dtype=np.int32)
        blocks[:, 0] = rng.randint(-400, 400, n)
        for b in range(n):
            for _ in range(rng.randint(0, 12)):
                blocks[b, rng.randint(1, 64)] = rng.randint(-9, 10)
        meta, got = jpeg_gray_coeffs(encode_jpeg_gray_coeff_blocks(wb, hb, blocks))
        assert meta["progressive"]
        assert np.array_equal(got, blocks)


def test_jpeg_sa_refinement_edge_shapes():
    """EOB-run folding, ZRL chains, correction bits pending across blocks,
    and band-boundary newly-nonzero coefficients all round-trip."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import (
        encode_jpeg_gray_coeff_blocks,
        jpeg_gray_coeffs,
    )

    cases = []
    z = np.zeros((1, 64), np.int32); z[0, 0] = -5; cases.append((1, 1, z))
    z = np.zeros((1, 64), np.int32); z[0, 0] = 3; z[0, 63] = 1; cases.append((1, 1, z))
    z = np.zeros((1, 64), np.int32); z[0, 1:64] = 1; cases.append((1, 1, z))
    z = np.zeros((1, 64), np.int32); z[0, 1:64] = -3; cases.append((1, 1, z))
    z = np.zeros((30, 64), np.int32); z[:, 0] = np.arange(30) - 15; cases.append((6, 5, z))
    z = np.zeros((2, 64), np.int32); z[0, 63] = -1; z[1, 6] = 1; cases.append((2, 1, z))
    z = np.zeros((1, 64), np.int32); z[0, 2] = 2; z[0, 60] = 1; cases.append((1, 1, z))
    for wb, hb, blk in cases:
        _, got = jpeg_gray_coeffs(encode_jpeg_gray_coeff_blocks(wb, hb, blk))
        assert np.array_equal(got, blk)


def test_jpeg_sa_refinement_actually_needed():
    """A ±1 coefficient is INVISIBLE to the Al=1 first pass — decoding a
    stream truncated before the refinement scans must differ, proving the
    refinement path carries real information (not a no-op)."""
    import numpy as np

    from cam_etl_spark.multimodal.jpeg import (
        encode_jpeg_gray_coeff_blocks,
        jpeg_gray_coeffs,
    )

    blocks = np.zeros((2, 64), np.int32)
    blocks[:, 0] = 9          # odd DC: low bit only in DC refinement
    blocks[0, 5] = 1          # only representable by AC refinement
    blocks[1, 40] = -3        # low bit only via correction bit
    _, got = jpeg_gray_coeffs(encode_jpeg_gray_coeff_blocks(2, 1, blocks))
    assert np.array_equal(got, blocks)
    assert got[0, 5] == 1 and got[1, 40] == -3 and (got[:, 0] == 9).all()


def test_flac_roundtrip_all_subframe_types():
    """FLAC: constant blocks -> CONSTANT subframes, noise -> order-0,
    ramps -> order-1/2 fixed predictors; every signal round-trips
    bit-exactly and multi-frame streams reassemble in order."""
    import math
    import random

    from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

    rng = random.Random(21)
    signals = [
        [7] * 40,                                        # constant, partial block
        [rng.randint(-32768, 32767) for _ in range(700)],  # noise, 3 frames
        [min(32767, -3000 + 11 * i) for i in range(600)],  # ramp (order 1/2)
        [int(3000 * math.sin(i / 9)) for i in range(513)], # smooth, odd tail
        [-32768, 32767] * 150,                             # extreme alternation
        [0],                                               # single sample
    ]
    for s in signals:
        m = decode_flac(encode_flac(s))
        assert m["samples"] == s
        assert m["n_samples"] == len(s) and m["sample_rate"] == 8000


def test_flac_corruption_and_garbage_rejected():
    import pytest

    from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx")
    buf = bytearray(encode_flac([100, -200, 300, 400] * 100))
    buf[60] ^= 0x40
    with pytest.raises((ValueError, NotImplementedError)):
        decode_flac(bytes(buf))
    with pytest.raises(ValueError):
        decode_flac(bytes(encode_flac([1, 2, 3]))[:-3])  # truncated frame
    with pytest.raises(ValueError, match="unsupported sample_rate"):
        encode_flac([1, 2, 3], sample_rate=12345)


def test_flac_utf8_frame_number_boundaries():
    """UTF-8 frame-number coding: an n-byte code holds 5n+1 payload bits,
    so the width thresholds sit at 2^7, 2^11, 2^16, 2^21... — values
    straddling each boundary must round-trip (the naive 6+4n threshold
    under-sizes [2^11, 2^14) and corrupts the lead byte)."""
    from cam_etl_spark.multimodal.flac import (
        _BitReader,
        _read_utf8_number,
        _utf8_number,
    )

    for n in [0, 1, 127, 128, 2047, 2048, 4095, 16383, 16384, 65535, 65536,
              (1 << 21) - 1, 1 << 21, (1 << 26) - 1, 1 << 26, (1 << 31) - 1]:
        enc = _utf8_number(n)
        assert _read_utf8_number(_BitReader(enc)) == n, (n, enc.hex())
    # and through a real stream: blocksize-16 frames push frame numbers
    # past the 2^11 boundary by frame 2048
    import random

    from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

    rng = random.Random(5)
    sig = [rng.randint(-100, 100) for _ in range(16 * 2100)]
    assert decode_flac(encode_flac(sig, block_size=16))["samples"] == sig


def test_flac_lpc_and_stereo_roundtrip():
    """LPC subframes (quantized Levinson-Durbin, orders 1-4) and all
    stereo decorrelation modes round-trip bit-exactly, including extreme
    int16 values through the 17-bit side channel; the frame header
    carries the REAL sample-rate code (consistent with STREAMINFO)."""
    import math
    import random

    from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

    rng = random.Random(77)
    left = [int(8000 * math.sin(i / 7)) + rng.randint(-60, 60)
            for i in range(601)]
    right = [int(6000 * math.sin(i / 9 + 1)) + rng.randint(-60, 60)
             for i in range(601)]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        for order in (None, 1, 4):
            for rate in (8000, 44100, 96000):
                m = decode_flac(encode_flac(
                    (left, right), rate, lpc_order=order, stereo_mode=mode))
                assert m["channels"] == 2 and m["n_samples"] == 601
                assert m["sample_rate"] == rate
                assert m["samples"][0::2] == left, (mode, order, rate)
                assert m["samples"][1::2] == right, (mode, order, rate)
    # extremes through the side channel (L-R spans 17 bits)
    ext = [-32768, 32767] * 200
    m = decode_flac(encode_flac((ext, ext[::-1]), stereo_mode="mid_side",
                                lpc_order=2))
    assert m["samples"][0::2] == ext and m["samples"][1::2] == ext[::-1]
    # mono LPC
    sig = [int(1000 * math.sin(i / 10)) for i in range(700)]
    assert decode_flac(encode_flac(sig, lpc_order=4))["samples"] == sig
    # high-entropy noise forces Rice ESCAPE partitions on some blocks and
    # must still round-trip under LPC
    noise = [rng.randint(-32768, 32767) for _ in range(513)]
    for order in (None, 2, 8):
        assert decode_flac(encode_flac(noise, lpc_order=order))["samples"] == noise


def test_flac_wasted_bits_and_5bit_method():
    """Wasted bits (samples sharing a trailing-zero factor encode at
    reduced bps with the factor in the subframe header) and the 5-bit
    Rice method (for high-magnitude residuals, e.g. 17-bit side-channel
    noise) both round-trip bit-exactly."""
    import random

    from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

    rng = random.Random(9)
    sig = [8 * rng.randint(-4000, 4000) for _ in range(513)]
    for order in (None, 3):
        assert decode_flac(encode_flac(sig, lpc_order=order))["samples"] == sig
    left = [16 * rng.randint(-2000, 2000) for _ in range(300)]
    right = [16 * rng.randint(-2000, 2000) for _ in range(300)]
    for mode in ("left_side", "mid_side", "right_side", "independent"):
        m = decode_flac(encode_flac((left, right), 44100, lpc_order=2,
                                    stereo_mode=mode))
        assert m["samples"][0::2] == left and m["samples"][1::2] == right
    # wasted bits shrink the stream: same signal without the factor costs
    # ~3 more bits/sample
    plain = [s // 8 for s in sig]
    assert len(encode_flac(sig)) < len(encode_flac(plain)) + len(sig)
    # full-range independent noise through the 17-bit side channel
    n1 = [rng.randint(-32768, 32767) for _ in range(600)]
    n2 = [rng.randint(-32768, 32767) for _ in range(600)]
    for mode in ("left_side", "mid_side", "right_side"):
        m = decode_flac(encode_flac((n1, n2), stereo_mode=mode))
        assert m["samples"][0::2] == n1 and m["samples"][1::2] == n2


def test_flac_partitioned_residuals():
    """Partition orders > 0: a block that is smooth in one half and noisy
    in the other must round-trip through multi-partition residuals (each
    partition with its own Rice parameter or escape), and the encoder
    must actually EMIT a nonzero partition order for such blocks."""
    import math
    import random

    from cam_etl_spark.multimodal.flac import (
        _BitReader,
        decode_flac,
        encode_flac,
    )

    rng = random.Random(3)
    sig = [int(2000 * math.sin(i / 15)) for i in range(128)] + [
        rng.randint(-20000, 20000) for _ in range(128)
    ]
    sig = sig * 3 + sig[:77]
    for order in (None, 2, 4):
        assert decode_flac(encode_flac(sig, lpc_order=order))["samples"] == sig
    left = [int(5000 * math.sin(i / 11)) for i in range(300)] + [
        rng.randint(-30000, 30000) for _ in range(212)
    ]
    right = [~s for s in left]
    for mode in ("left_side", "mid_side", "right_side", "independent"):
        m = decode_flac(encode_flac((left, right), 44100, lpc_order=3,
                                    stereo_mode=mode))
        assert m["samples"][0::2] == left and m["samples"][1::2] == right
    # inspect the first frame's residual header: partition order must be >0
    buf = encode_flac(sig)
    r = _BitReader(buf, 42)  # fLaC + STREAMINFO header = 42 bytes
    r.read(32), r.read(8), r.read(16), r.read(8)  # frame hdr, utf8, bs, crc
    r.read(1)
    stype = r.read(6)
    r.read(1)
    order = stype & 0x07 if stype < 0x20 else (stype & 0x1F) + 1
    for _ in range(order):
        r.read(16)
    r.read(2)
    assert r.read(4) > 0, "mixed smooth/noisy block should partition"


def test_mpeg1_audio_layer1_roundtrip():
    """Layer I: 4-bit allocations, 6-bit scalefactors, 12 samples per
    active subband — codes round-trip bit-exactly and multi-frame
    streams reassemble via the slot-length formula."""
    import random

    from cam_etl_spark.multimodal.mpegaudio import (
        decode_mpeg1_audio,
        encode_layer1_frame,
        frame_bytes,
    )

    rng = random.Random(7)
    alloc = [rng.randint(0, 7) for _ in range(32)]
    active = [sb for sb in range(32) if alloc[sb]]
    scf = [rng.randint(0, 62) for _ in active]
    codes = [
        [rng.randrange((1 << (alloc[sb] + 1)) - 1) for _ in range(12)]
        for sb in active
    ]
    buf = encode_layer1_frame(alloc, scf, codes)
    assert len(buf) == frame_bytes(1, 448, 32000)
    m = decode_mpeg1_audio(buf * 3)
    assert m["layer"] == 1 and m["n_frames"] == 3 and m["n_samples"] == 3 * 384
    for f in m["frames"]:
        assert f["alloc"] == alloc and f["codes"] == codes
        assert [t[0] for t in f["scf"]] == scf


def test_mpeg1_audio_layer2_scfsi_and_grouping():
    """Layer II under table 3-B.2a: every scfsi mode expands correctly,
    grouped 3/5/9-step triplets degroup bit-exactly, and requantized
    values are symmetric around zero."""
    import random

    from cam_etl_spark.multimodal.mpegaudio import (
        B2A_SBLIMIT,
        GROUPED,
        b2a_steps_list,
        decode_mpeg1_audio,
        encode_layer2_frame,
        requantize,
    )

    rng = random.Random(11)
    amax = lambda sb: 3 if sb < 3 else (5 if sb < 23 else 2)  # noqa: E731
    alloc = [rng.randint(0, amax(sb)) for sb in range(B2A_SBLIMIT)]
    alloc[0], alloc[23] = 1, 2  # force an ungrouped and a grouped class
    active = [sb for sb in range(B2A_SBLIMIT) if alloc[sb]]
    scfsi = [(i % 4) for i in range(len(active))]  # all four modes
    stored = [
        (rng.randint(0, 62), rng.randint(0, 62), rng.randint(0, 62))
        for _ in active
    ]
    codes = [
        [rng.randrange(b2a_steps_list(sb)[alloc[sb] - 1]) for _ in range(36)]
        for sb in active
    ]
    buf = encode_layer2_frame(alloc, scfsi, stored, codes)
    m = decode_mpeg1_audio(buf)
    f = m["frames"][0]
    assert m["layer"] == 2 and m["n_samples"] == 1152
    assert f["alloc"] == alloc and f["scfsi"] == scfsi and f["codes"] == codes
    assert any(
        b2a_steps_list(sb)[alloc[sb] - 1] in GROUPED for sb in active
    )
    for s, orig, got in zip(scfsi, stored, f["scf"]):
        expect = {
            0: orig,
            1: (orig[0], orig[0], orig[2]),
            2: (orig[0], orig[0], orig[0]),
            3: (orig[0], orig[1], orig[1]),
        }[s]
        assert got == expect
    # requantization symmetry: code 0 and steps-1 mirror, midpoint is 0
    for steps in (3, 5, 7, 9, 15, 63, 65535):
        lo, mid, hi = (requantize(c, steps, 0) for c in (0, steps // 2, steps - 1))
        assert abs(lo + hi) < 1e-12 and abs(mid) < 1e-12


def test_mpeg1_audio_boundaries_and_dispatch():
    """Layer III headers raise the honest stub error; garbage is
    rejected; the magic-byte dispatcher routes Layer I/II payloads."""
    import pytest

    from cam_etl_spark.multimodal.codecs import decode_payload, sniff_format
    from cam_etl_spark.multimodal.mpegaudio import (
        decode_mpeg1_audio,
        encode_layer1_frame,
    )

    with pytest.raises(ValueError, match="syncword|not an MPEG"):
        decode_mpeg1_audio(b"\x00" * 16)
    # a Layer III (MP3) header: sync + ID=1 + layer=01
    mp3_hdr = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_mpeg1_audio(mp3_hdr)
    assert sniff_format(mp3_hdr) == "mpeg_audio"
    alloc = [0] * 32
    alloc[5] = 3
    buf = encode_layer1_frame(alloc, [10], [[1, 2, 3] * 4])
    assert sniff_format(buf) == "mpeg_audio"
    m = decode_payload(buf)
    assert m["format"] == "mpeg1_audio" and m["layer"] == 1
    assert m["sample_rate"] == 32000 and "frames" not in m


def test_mpeg1_audio_synthesis_structure():
    """synthesize_pcm emits 32 PCM samples per subband-sample vector with
    the spec's V/U/W structure (window: the vendored Table 3-B.3 —
    validated in tests/test_mpegaudio_synthesis.py)."""
    from cam_etl_spark.multimodal.mpegaudio import (
        decode_mpeg1_audio,
        encode_layer1_frame,
        synthesize_pcm,
    )

    alloc = [0] * 32
    alloc[0] = 7  # strong low-band content
    buf = encode_layer1_frame(alloc, [5], [list(range(12))])
    pcm = synthesize_pcm(decode_mpeg1_audio(buf)["frames"])
    assert pcm.shape == (384,)
    assert float(abs(pcm).max()) > 0.0


def test_flac_dispatch_via_decode_payload():
    """sniff_format recognizes the fLaC magic and decode_payload routes
    to the native decoder, reporting geometry without the sample blob."""
    from cam_etl_spark.multimodal.codecs import decode_payload, sniff_format
    from cam_etl_spark.multimodal.flac import encode_flac

    buf = encode_flac(([10, 20, 30] * 50, [1, 2, 3] * 50),
                      44100, stereo_mode="left_side")
    assert sniff_format(buf) == "flac"
    m = decode_payload(buf)
    assert m["format"] == "flac" and m["channels"] == 2
    assert m["sample_rate"] == 44100 and m["n_samples"] == 150
    assert "samples" not in m


def test_mpeg1_audio_stereo_roundtrip():
    """Stereo mode (0b00): per-channel allocations/scalefactors/codes
    round-trip through the spec's interleaved field layout for both
    layers; mono argument shapes keep working unchanged."""
    import random

    from cam_etl_spark.multimodal.mpegaudio import (
        B2A_SBLIMIT,
        b2a_steps_list,
        decode_mpeg1_audio,
        encode_layer1_frame,
        encode_layer2_frame,
    )

    rng = random.Random(13)
    alloc = [
        [rng.randint(0, 5) for _ in range(32)] for _ in range(2)
    ]
    active = [[sb for sb in range(32) if alloc[ch][sb]] for ch in range(2)]
    scf = [[rng.randint(0, 62) for _ in active[ch]] for ch in range(2)]
    codes = [
        [
            [rng.randrange((1 << (alloc[ch][sb] + 1)) - 1) for _ in range(12)]
            for sb in active[ch]
        ]
        for ch in range(2)
    ]
    m = decode_mpeg1_audio(encode_layer1_frame(alloc, scf, codes) * 3)
    assert m["n_frames"] == 3
    for f in m["frames"]:
        assert f["channels"] == 2 and f["alloc"] == alloc and f["codes"] == codes
    # mono shape unchanged
    fm = decode_mpeg1_audio(
        encode_layer1_frame(alloc[0], scf[0], codes[0])
    )["frames"][0]
    assert fm["channels"] == 1 and fm["codes"] == codes[0]

    amax = lambda sb: 3 if sb < 3 else (5 if sb < 23 else 2)  # noqa: E731
    a2 = [
        [rng.randint(0, amax(sb)) for sb in range(B2A_SBLIMIT)]
        for _ in range(2)
    ]
    act2 = [[sb for sb in range(B2A_SBLIMIT) if a2[ch][sb]] for ch in range(2)]
    sfs = [[rng.randint(0, 3) for _ in act2[ch]] for ch in range(2)]
    st = [
        [(rng.randint(0, 62), rng.randint(0, 62), rng.randint(0, 62))
         for _ in act2[ch]]
        for ch in range(2)
    ]
    c2 = [
        [
            [rng.randrange(b2a_steps_list(sb)[a2[ch][sb] - 1])
             for _ in range(36)]
            for sb in act2[ch]
        ]
        for ch in range(2)
    ]
    f2 = decode_mpeg1_audio(
        encode_layer2_frame(a2, sfs, st, c2, bitrate_kbps=384)
    )["frames"][0]
    assert f2["channels"] == 2 and f2["codes"] == c2 and f2["scfsi"] == sfs


def test_decode_payload_fuzz_never_crashes():
    """Arbitrary bytes through the magic-byte dispatcher must either
    decode, or raise ValueError / NotImplementedError — never an
    unhandled crash (IndexError, struct.error, ZeroDivisionError...).
    Seeds include truncated/corrupted REAL payloads of every format."""
    import random

    from cam_etl_spark.multimodal.codecs import (
        decode_payload,
        encode_bmp,
        encode_gif,
        encode_tiff,
        encode_wav,
    )
    from cam_etl_spark.multimodal.flac import encode_flac
    from cam_etl_spark.multimodal.mpegaudio import encode_layer1_frame

    rng = random.Random(99)
    alloc = [0] * 32
    alloc[3] = 2
    seeds = [
        encode_bmp(5, 4, b"\x01\x02\x03"),
        encode_wav(30, 8000, 1),
        encode_gif(6, 5, b"\x10\x20"),
        encode_tiff(7, 3, b"\x05"),
        encode_flac([100, -100] * 80, lpc_order=2),
        encode_layer1_frame(alloc, [7], [[1, 2] * 6]),
    ]
    cases = []
    for s in seeds:
        cases.append(s[: len(s) // 2])            # truncation
        b = bytearray(s)
        for _ in range(4):                         # bit corruption
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cases.append(bytes(b))
    for _ in range(200):                           # pure noise
        cases.append(bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200))))
    crashes = []
    for c in cases:
        try:
            decode_payload(c)
        except (ValueError, NotImplementedError):
            pass
        except Exception as ex:  # pragma: no cover - the failure we hunt
            crashes.append((type(ex).__name__, str(ex)[:80], c[:8].hex()))
    assert not crashes, crashes[:5]


def test_flac_all_table_bit_depths_roundtrip():
    """Every frame-header table depth (8/12/16/20/24-bit) round-trips
    bit-exactly for mono and all stereo modes (side channel at bps+1),
    including full-range extremes; STREAMINFO and the frame headers
    carry consistent real depth codes."""
    import random

    from cam_etl_spark.multimodal.flac import decode_flac, encode_flac

    rng = random.Random(4)
    for bps in (8, 12, 16, 20, 24):
        lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
        sig = [rng.randint(lo, hi) for _ in range(413)]
        for lpc in (None, 3):
            m = decode_flac(encode_flac(sig, bits_per_sample=bps,
                                        lpc_order=lpc))
            assert m["samples"] == sig and m["bits_per_sample"] == bps
        left = [rng.randint(lo, hi) for _ in range(210)]
        right = [~s for s in left]  # NOT stays in the signed range
        for mode in ("left_side", "mid_side", "right_side", "independent"):
            m = decode_flac(encode_flac(
                (left, right), 48000, bits_per_sample=bps, lpc_order=2,
                stereo_mode=mode))
            assert m["samples"][0::2] == left
            assert m["samples"][1::2] == right, (bps, mode)
        ext = [lo, hi] * 100
        m = decode_flac(encode_flac((ext, ext[::-1]), bits_per_sample=bps,
                                    stereo_mode="mid_side"))
        assert m["samples"][0::2] == ext and m["samples"][1::2] == ext[::-1]
    import pytest

    # non-table depths (ss_code 0 "get from STREAMINFO"): 13-bit, and the
    # 32-bit extreme whose order>0 residuals exceed the 31-bit escape
    # width and must stay Rice-coded
    for bps in (13, 32):
        lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
        sig = [rng.randint(lo, hi) for _ in range(150)] + [lo, hi]
        m = decode_flac(encode_flac(sig, 48000, bits_per_sample=bps,
                                    lpc_order=2))
        assert m["samples"] == sig and m["bits_per_sample"] == bps
    with pytest.raises(ValueError, match="outside 4-32"):
        encode_flac([1], bits_per_sample=33)
    with pytest.raises(ValueError, match="int8"):
        encode_flac([200], bits_per_sample=8)


def test_mpeg_synthesis_filterbank_structure():
    """Structural verification of synthesize_pcm's Annex-A flowchart
    WITHOUT the printed Table 3-B.3 window: with a one-hot prototype
    window e_m, PCM sample j of each output block must equal exactly
    U[m] when j == m % 32 and 0 otherwise, where U's value is predicted
    by independently simulating the V shift register and the U-build
    index map (V[128q:128q+32] / V[128q+96:128q+128]). This pins the
    matrixing, the 64-shift, the U half-block indexing, the windowing
    multiply, and the 16-tap sum — everything except the numeric window
    values themselves."""
    import math

    import numpy as np

    from cam_etl_spark.multimodal.mpegaudio import synthesize_pcm

    rng = np.random.default_rng(11)
    nframes, nsamp = 2, 12
    # mono Layer I frames with all 32 subbands active
    frames = []
    allvals = []
    for _ in range(nframes):
        vals = rng.standard_normal((32, nsamp)).round(3)
        allvals.append(vals)
        frames.append({
            "layer": 1, "channels": 1, "n_samples": 384,
            "active": list(range(32)),
            "values": [list(map(float, vals[sb])) for sb in range(32)],
        })
    n = np.array([
        [math.cos((16 + i) * (2 * k + 1) * math.pi / 64) for k in range(32)]
        for i in range(64)
    ])
    sequence = np.concatenate(allvals, axis=1)  # (32, T)
    T = sequence.shape[1]

    for m in (0, 37, 95, 130, 511):  # taps across several half-blocks
        window = [0.0] * 512
        window[m] = 1.0
        out = synthesize_pcm(frames, window=window)
        assert out.shape == (32 * T,)
        # independent V-register simulation
        v = np.zeros(1024)
        for t in range(T):
            v[64:] = v[:-64]
            v[:64] = n @ sequence[:, t]
            # U index map: u[64q + r] with r < 32 -> v[128q + r],
            # r >= 32 -> v[128q + 96 + (r - 32)]
            qq, rr = divmod(m, 64)
            u_m = v[128 * qq + rr] if rr < 32 else v[128 * qq + 96 + rr - 32]
            block = out[32 * t : 32 * t + 32]
            expect = np.zeros(32)
            expect[m % 32] = u_m
            assert np.allclose(block, expect, atol=1e-12), (m, t)


# ---------------------------------------------------------------------------
# MP3 (Layer III) structural scaffolding — cam_etl_spark/multimodal/mp3.py
# ---------------------------------------------------------------------------


def _mp3_granule(rng, bt, mixed, scfsi=0, gr=0):
    from cam_etl_spark.multimodal.mp3 import (
        SLEN,
        _transmitted_slots,
        scalefac_layout,
    )

    g = dict(
        block_type=bt,
        mixed_block_flag=mixed,
        scalefac_compress=rng.randrange(16),
        global_gain=rng.randrange(256),
        preflag=rng.randrange(2),
        scalefac_scale=rng.randrange(2),
        table_select=[rng.randrange(32) for _ in range(3)],
        subblock_gain=[rng.randrange(8) for _ in range(3)],
        region0_count=rng.randrange(16),
        region1_count=rng.randrange(8),
        scfsi=scfsi,
    )
    layout = scalefac_layout(bt, mixed)
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    g["scalefacs"] = [
        rng.randrange(1 << (slen1 if layout[i][1] == 1 else slen2))
        if (slen1 if layout[i][1] == 1 else slen2) else 0
        for i in _transmitted_slots(g, scfsi, gr)
    ]
    g["quads"] = [
        tuple(rng.choice([-1, 0, 1]) for _ in range(4))
        for _ in range(rng.randrange(8))
    ]
    return g


def test_mp3_sideinfo_roundtrip_all_layouts():
    """Every (block layout x block layout) granule pair, mono+stereo,
    CRC on/off, scfsi reuse: encode -> parse recovers every side-info
    field, scalefactor, and count1 quadruple bit-exactly."""
    import random

    from cam_etl_spark.multimodal.mp3 import (
        _transmitted_slots,
        encode_mp3_frame,
        parse_mp3_frame,
        scalefac_layout,
    )

    rng = random.Random(0xC0DEC)
    shapes = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 0)]
    for s0 in shapes:
        for s1 in shapes:
            for nch in (1, 2):
                crc = rng.random() < 0.5
                grs = [[], []]
                scfsis = []
                for ch in range(nch):
                    both_long = s0[0] != 2 and s1[0] != 2
                    scfsi = rng.randrange(1, 16) if both_long else 0
                    scfsis.append(scfsi)
                    grs[0].append(_mp3_granule(rng, *s0, scfsi, 0))
                    grs[1].append(_mp3_granule(rng, *s1, scfsi, 1))
                m = parse_mp3_frame(encode_mp3_frame(grs, crc=crc))
                assert m["nch"] == nch and m["protected"] == crc
                assert m["scfsi"] == scfsis
                for gr in range(2):
                    for ch in range(nch):
                        enc, dec = grs[gr][ch], m["granules"][gr][ch]
                        for k in ("block_type", "mixed_block_flag",
                                  "scalefac_compress", "global_gain",
                                  "preflag", "scalefac_scale",
                                  "part2_3_length"):
                            assert dec[k] == enc[k], (s0, s1, gr, ch, k)
                        assert dec["quads"] == enc["quads"]
                        # expand transmitted scalefacs incl. scfsi reuse
                        layout = scalefac_layout(
                            enc["block_type"], enc["mixed_block_flag"])
                        sent = set(_transmitted_slots(
                            enc, scfsis[ch], gr))
                        it = iter(enc["scalefacs"])
                        exp = [
                            next(it) if i in sent
                            else m["granules"][0][ch]["scalefacs"][i]
                            for i in range(len(layout))
                        ]
                        assert dec["scalefacs"] == exp, (s0, s1, gr, ch)


def test_mp3_sideinfo_random_roundtrip():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover - hypothesis is in the image
        pytest.skip("hypothesis unavailable")

    from cam_etl_spark.multimodal.mp3 import (
        encode_mp3_frame,
        parse_mp3_frame,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 2**63 - 1))
    def prop(seed):
        import random

        rng = random.Random(seed)
        nch = rng.choice([1, 2])
        shapes = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 0)]
        grs = [[], []]
        for ch in range(nch):
            pair = [rng.choice(shapes) for _ in range(2)]
            both_long = all(bt != 2 for bt, _ in pair)
            scfsi = rng.randrange(16) if both_long else 0
            for gr in range(2):
                grs[gr].append(
                    _mp3_granule(rng, *pair[gr], scfsi, gr))
        buf = encode_mp3_frame(grs, crc=rng.random() < 0.5)
        m = parse_mp3_frame(buf)
        for gr in range(2):
            for ch in range(nch):
                assert (m["granules"][gr][ch]["part2_3_length"]
                        == grs[gr][ch]["part2_3_length"])
                assert (m["granules"][gr][ch]["quads"]
                        == grs[gr][ch]["quads"])

    prop()


def test_mp3_boundaries_loud():
    """Unimplemented Layer III surfaces reject, never mis-parse: bit
    reservoir (standalone frame), unvendored big-values tables (on
    encode AND decode), joint stereo, CRC corruption,
    scfsi-with-short-blocks."""
    import random

    from cam_etl_spark.multimodal.mp3 import (
        encode_mp3_frame,
        parse_mp3_frame,
    )

    rng = random.Random(3)
    grs = [[_mp3_granule(rng, 0, 0)], [_mp3_granule(rng, 0, 0)]]
    buf = encode_mp3_frame(grs)

    bad = bytearray(buf)
    bad[4] |= 0x80  # main_data_begin != 0
    with pytest.raises(NotImplementedError, match="bit reservoir"):
        parse_mp3_frame(bytes(bad))

    # big-values tables beyond the vendored 0-12 reject on ENCODE...
    grs_bv = [[_mp3_granule(rng, 0, 0)], [_mp3_granule(rng, 0, 0)]]
    grs_bv[0][0]["pairs"] = [(1, -1)]
    grs_bv[0][0]["table_select"] = [13, 13, 13]
    with pytest.raises(NotImplementedError, match="not vendored"):
        encode_mp3_frame(grs_bv)
    # ...and on DECODE: re-encode under vendored table 1, then patch
    # the first table_select field in the STREAM from 1 (00001) to
    # 17 (10001). Granule-0 side info: 18 fixed bits + 12+9+8+4+1 =
    # 52 bits to table_select -> its first bit is side bit 52 = byte
    # 10 bit 4 (MSB-first), mask 0x08.
    grs_bv[0][0]["table_select"] = [1, 1, 1]
    grs_bv[0][0]["region0_count"] = 3
    grs_bv[0][0]["region1_count"] = 3
    buf_bv = bytearray(encode_mp3_frame(grs_bv))
    assert buf_bv[10] & 0x08 == 0
    buf_bv[10] |= 0x08
    with pytest.raises(NotImplementedError, match="not vendored"):
        parse_mp3_frame(bytes(buf_bv))

    bad = bytearray(buf)
    bad[3] = (bad[3] & 0x3F) | 0x80  # mode bits (byte 3 MSBs) -> dual
    with pytest.raises(NotImplementedError, match="dual_channel"):
        parse_mp3_frame(bytes(bad))

    crc_buf = bytearray(encode_mp3_frame(grs, crc=True))
    crc_buf[8] ^= 0x20
    with pytest.raises(ValueError, match="crc_check mismatch"):
        parse_mp3_frame(bytes(crc_buf))

    with pytest.raises(ValueError, match="scfsi"):
        bad_grs = [[_mp3_granule(rng, 2, 0)], [_mp3_granule(rng, 0, 0)]]
        bad_grs[0][0]["scfsi"] = 5
        encode_mp3_frame(bad_grs)


def test_mp3_bit_reservoir_stream_roundtrip():
    """Multi-frame Layer III streams through the bit reservoir
    (§2.4.2.7): frames borrow main-data bytes from predecessors'
    payload slack; every field still recovers bit-exactly, the
    encoder's stuffing caps main_data_begin at the 9-bit limit, and
    reservoir underflow is a loud error."""
    import random

    from cam_etl_spark.multimodal.mp3 import (
        encode_mp3_frame,
        encode_mp3_stream,
        parse_mp3_stream,
    )

    rng = random.Random(0xBEEF)
    shapes = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 0)]
    for nch in (1, 2):
        frames = []
        for i in range(8):
            shape = shapes[i % len(shapes)]
            frames.append(
                [[_mp3_granule(rng, *shape) for _ in range(nch)]
                 for _gr in range(2)]
            )
        buf = encode_mp3_stream(
            frames, 48000, 64 if nch == 1 else 128
        )
        shells = parse_mp3_stream(buf)
        assert len(shells) == len(frames)
        begins = [s["main_data_begin"] for s in shells]
        assert any(b > 0 for b in begins), "reservoir not exercised"
        assert max(begins) <= 511
        for i, s in enumerate(shells):
            for gr in range(2):
                for ch in range(nch):
                    enc = frames[i][gr][ch]
                    dec = s["granules"][gr][ch]
                    for k in ("block_type", "mixed_block_flag",
                              "scalefac_compress", "global_gain",
                              "preflag", "scalefac_scale",
                              "part2_3_length"):
                        assert dec[k] == enc[k], (i, gr, ch, k)
                    assert dec["quads"] == enc["quads"], (i, gr, ch)
    # underflow: a first frame claiming reservoir bytes is invalid
    grs = [[_mp3_granule(rng, 0, 0)], [_mp3_granule(rng, 0, 0)]]
    bad = bytearray(encode_mp3_frame(grs))
    bad[4] |= 0x80  # main_data_begin high bit
    with pytest.raises(ValueError, match="reservoir underflow"):
        parse_mp3_stream(bytes(bad))
    # the standalone-frame API keeps its loud boundary
    with pytest.raises(NotImplementedError, match="bit reservoir"):
        from cam_etl_spark.multimodal.mp3 import parse_mp3_frame

        parse_mp3_frame(bytes(bad))
