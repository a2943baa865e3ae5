"""From-spec Zstandard decoder (multimodal/zstd.py) — adversarial
roundtrips against the REAL zstd library (pyarrow links libzstd)
across data shapes, sizes and compression levels; xxHash64 published
vectors; hand-built frames for the paths real encoders rarely emit
(RLE blocks, checksums, multi-frame, skippable frames); and loud
boundaries. The lake-layer integration (Spark's DEFAULT ORC
compression is ZSTD) is covered in test_orc_read.py /
test_parquet_pages via the s50 catalog entry."""

import hashlib
import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cam_etl_spark.multimodal.zstd import (
    decode_zstd,
    xxh64,
    zstd_decompress,
)


def _gen(kind: str, n: int, rng) -> bytes:
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "skewed":
        return bytes(rng.choice(b"aaaaabbbcde") for _ in range(n))
    if kind == "text":
        s = b"the quick brown fox jumps over the lazy dog. "
        return (s * (n // len(s) + 1))[:n]
    if kind == "runs":
        out = bytearray()
        while len(out) < n:
            out += bytes([rng.randrange(256)]) * rng.randrange(1, 300)
        return bytes(out[:n])
    out = bytearray()  # structured rows
    i = 0
    while len(out) < n:
        h = hashlib.md5(str(i).encode()).hexdigest().encode()
        out += b"row-%08d|%s|" % (i, h[: rng.randrange(1, 30)])
        i += 1
    return bytes(out[:n])


@pytest.mark.parametrize("kind", ["random", "skewed", "text", "runs",
                                  "struct"])
def test_roundtrip_vs_real_zstd(kind):
    """Every (shape, size, level) cell decodes byte-exactly. Levels
    19/22 force FSE-compressed sequence tables and 4-stream Huffman
    literals; multi-block sizes force treeless (table-reuse) literals
    and repeat sequence tables; 'runs' forces RLE literals; 'random'
    forces raw blocks/literals."""
    rng = random.Random(7)
    for n in (0, 1, 5, 100, 1000, 17000, 150000, 700000):
        raw = _gen(kind, n, rng)
        for lvl in (1, 3, 12, 19, 22):
            comp = bytes(
                pa.Codec("zstd", compression_level=lvl).compress(raw)
            )
            assert zstd_decompress(comp) == raw, (kind, n, lvl)


def test_xxh64_published_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"a" * 101) == xxh64(b"a" * 101)
    # >32-byte path (stripes + merge)
    assert xxh64(bytes(range(64))) != xxh64(bytes(range(63)) + b"\x00")


def test_hand_built_frames():
    """Paths high-level encoders rarely emit, built by hand from the
    RFC: raw blocks, RLE blocks, content checksum, multi-frame
    payloads, skippable frames."""
    # single-segment frame, 1-byte FCS, one raw block, with checksum
    content = b"hello zstd"
    frame = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x24])                       # single_segment+checksum
        + bytes([len(content)])               # FCS
        + ((len(content) << 3) | 1).to_bytes(3, "little")  # raw, last
        + content
        + (xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little")
    )
    assert zstd_decompress(frame) == content
    # corrupt the checksum -> loud
    bad = frame[:-4] + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bad)
    # RLE block frame (no checksum)
    rle = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x20, 100])
        + ((100 << 3) | (1 << 1) | 1).to_bytes(3, "little")
        + b"Z"
    )
    assert zstd_decompress(rle) == b"Z" * 100
    # skippable frame before a real one, multi-frame after
    skip = (0x184D2A50).to_bytes(4, "little") + (3).to_bytes(
        4, "little") + b"xyz"
    assert zstd_decompress(skip + rle + frame) == b"Z" * 100 + content
    # decode_zstd returns the tail offset
    out, end = decode_zstd(skip + rle + frame)
    assert out == b"Z" * 100 and end == len(skip) + len(rle)


def test_boundaries_loud():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        zstd_decompress(b"\x28\xb5\x2f")
    comp = bytes(pa.Codec("zstd").compress(b"hello world " * 50))
    with pytest.raises(ValueError):
        zstd_decompress(comp[:-3])  # truncated block payload
    with pytest.raises(ValueError, match="expected"):
        zstd_decompress(comp, expected=999)
    # dictionary frames: dictionary_ID_flag nonzero with a real id
    dframe = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x21, 0x07, 0x05])  # single_segment + 1-byte dict id
    )
    with pytest.raises(NotImplementedError, match="dictionary"):
        zstd_decompress(dframe + b"\x00" * 8)


def test_frame_content_size_widths():
    """All FCS widths decode: pyarrow emits the natural one per size;
    the 2-byte field carries the +256 bias."""
    rng = random.Random(3)
    for n in (10, 300, 70000, 90000):
        raw = _gen("text", n, rng)
        comp = bytes(pa.Codec("zstd").compress(raw))
        out, end = decode_zstd(comp)
        assert out == raw and end == len(comp)


def test_trailing_skippable_frame():
    """Skippable frames are legal anywhere INCLUDING trailing (round
    11 review fix): a payload ending in one decodes; a truncated
    trailing skippable is loud."""
    comp = bytes(pa.Codec("zstd").compress(b"payload " * 20))
    skip = ((0x184D2A50).to_bytes(4, "little")
            + (4).to_bytes(4, "little") + b"meta")
    assert zstd_decompress(comp + skip) == b"payload " * 20
    assert zstd_decompress(skip + comp + skip) == b"payload " * 20
    with pytest.raises(ValueError, match="truncated skippable"):
        zstd_decompress(comp + skip[:-2])


def test_checksummed_frames_from_real_writer(spark):
    """Frames with REAL content checksums: zstd-jni (in Spark's jars)
    with setChecksum(true) — the engine's xxHash64-low32 verification
    must accept genuine checksums across sizes and levels, and flag a
    corrupted payload whose checksum no longer matches."""
    jvm = spark._jvm
    rng = random.Random(19)
    for lvl, n in ((1, 50), (5, 5000), (19, 200000)):
        ctx = jvm.com.github.luben.zstd.ZstdCompressCtx()
        ctx.setChecksum(True)
        ctx.setLevel(lvl)
        raw = _gen("struct", n, rng)
        comp = bytes(ctx.compress(bytearray(raw)))
        assert zstd_decompress(comp) == raw, (lvl, n)
    # corrupt one literal byte in a raw-block frame: checksum catches
    ctx = jvm.com.github.luben.zstd.ZstdCompressCtx()
    ctx.setChecksum(True)
    ctx.setLevel(1)
    raw = bytes(rng.randrange(256) for _ in range(64))  # stays raw
    comp = bytearray(ctx.compress(bytearray(raw)))
    comp[-6] ^= 0x01  # inside the raw block, before the 4-byte xxh
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(comp))


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       lvl=st.sampled_from([1, 3, 9, 17]),
       kind=st.sampled_from(["random", "skewed", "text", "runs",
                             "struct"]),
       n=st.integers(0, 40000))
def test_property_roundtrip(seed, lvl, kind, n):
    """Hypothesis sweep: arbitrary (shape, size, level) cells decode
    byte-exactly against libzstd."""
    rng = random.Random(seed)
    raw = _gen(kind, n, rng)
    comp = bytes(pa.Codec("zstd", compression_level=lvl).compress(raw))
    assert zstd_decompress(comp) == raw
